"""Asynchronous forcing prefetch — the JRA55 staging pipeline analogue.

TPU-native replacement for the reference's two host-side I/O overlap
mechanisms (SURVEY.md §2d item 6, §3.4):

* the `PrefetchingBackend` ring buffer (`time_indices_in_memory=240,
  prefetch=true`, `atmosphere.jl:22-27`) that keeps a sliding window of
  forcing time indices on device while a host thread refills it, and
* the `JRA55DataStagingCallback` year-staging state machine
  (`jra55_data_staging.jl:154-247`) that copies forcing years to fast
  scratch ahead of the simulation clock on a background thread.

Here: `PrefetchingAtmosphere` wraps a window-producing function (synthetic
generator or file reader). A daemon thread builds the *next* window
(host-side numpy + device transfer) while the device integrates the current
one; `atmosphere_for(t)` swaps windows when the clock crosses the
refill threshold. The reference's no-MPI-on-background-threads discipline
maps to: the worker only touches numpy + `jax.device_put` (safe off-thread),
never collectives.
"""

from __future__ import annotations

import threading
from typing import Callable

from .atmosphere import PrescribedAtmosphere, synthetic_prescribed_atmosphere


class PrefetchingAtmosphere:
    """Sliding-window prescribed atmosphere with background refill.

    ``window_builder(t0, t1) -> PrescribedAtmosphere`` produces a device
    window covering [t0, t1]; ``window_length`` is its span and
    ``refill_fraction`` the in-window position at which the next window
    starts building (0.5 = halfway).
    """

    def __init__(self, window_builder: Callable, window_length: float,
                 t_start: float = 0.0, overlap: float = 0.25,
                 refill_fraction: float = 0.5):
        self.builder = window_builder
        self.window_length = window_length
        self.overlap = overlap * window_length
        self.refill_fraction = refill_fraction
        self._current = window_builder(t_start, t_start + window_length)
        self._t0 = t_start
        self._next = None
        self._thread = None
        self._lock = threading.Lock()

    @classmethod
    def synthetic(cls, grid, window_length=10 * 86400.0, t_start=0.0,
                  cadence=3 * 3600.0):
        return cls(lambda t0, t1: synthetic_prescribed_atmosphere(
            grid, t0, t1, cadence), window_length, t_start)

    # ------------------------------------------------------------------ #
    def _spawn_refill(self, t0_next):
        def work():
            win = self.builder(t0_next, t0_next + self.window_length)
            with self._lock:
                self._next = (t0_next, win)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def atmosphere_for(self, t: float) -> PrescribedAtmosphere:
        """The window covering time ``t``; schedules/joins refills as the
        clock advances (reap/block/spawn state machine like the reference's
        staging callback, `jra55_data_staging.jl:167-210`)."""
        frac = (t - self._t0) / self.window_length

        # reap a completed refill
        with self._lock:
            if self._next is not None:
                t0n, win = self._next
                if t >= t0n:
                    self._current, self._t0 = win, t0n
                    self._next = None
                    frac = (t - self._t0) / self.window_length

        # spawn the next refill once we're past the threshold
        idle = self._thread is None or not self._thread.is_alive()
        if frac >= self.refill_fraction and self._next is None and idle:
            self._spawn_refill(self._t0 + self.window_length - self.overlap)

        # block if the simulation caught up with an in-flight refill
        # (`ensure_year_ready!`, :187-197)
        if frac >= 1.0 and self._thread is not None:
            self._thread.join()
            with self._lock:
                if self._next is not None:
                    t0n, win = self._next
                    self._current, self._t0 = win, t0n
                    self._next = None

        return self._current
