"""Asynchronous forcing prefetch — the JRA55 prefetching backend analogue.

TPU-native replacement for the reference's two host-side I/O overlap
mechanisms (SURVEY.md §2d item 6, §3.4):

* the `PrefetchingBackend` ring buffer (`time_indices_in_memory=240,
  prefetch=true`, `atmosphere.jl:22-27`) that keeps a sliding window of
  forcing time indices on device while a host thread refills it, and
* the `JRA55DataStagingCallback` year-staging state machine
  (`jra55_data_staging.jl:154-247`) that copies forcing years to fast
  scratch ahead of the simulation clock on a background thread.

Here: `PrefetchingAtmosphere` wraps a window builder
``builder(t0, t1) -> (PrescribedAtmosphere, t_ref)`` (file reader or
synthetic generator) whose windows carry times RELATIVE to ``t_ref`` —
float32 device times stay exact arbitrarily deep into a multi-century run.
A daemon thread builds the *next* window (host-side NetCDF read + regrid +
`jnp.asarray` device transfer) while the device integrates the current one;
`window_for(t, t_end)` swaps and re-arms as the clock advances. The
reference's no-MPI-on-background-threads discipline maps to: the worker
only touches numpy + device transfers (safe off-thread), never collectives.

Because every window has identical array shapes, swapping windows between
dispatches re-uses the jitted step's compilation — the swap is free.
"""

from __future__ import annotations

import threading
from typing import Callable

from .atmosphere import PrescribedAtmosphere


class PrefetchingAtmosphere:
    """Sliding-window prescribed atmosphere with background refill.

    ``window_builder(t0, t1) -> (PrescribedAtmosphere, t_ref)`` produces a
    device window whose coverage starts at or before ``t0`` (times relative
    to ``t_ref``); ``refill_fraction`` is the in-window position at which
    the next window starts building (0.5 = halfway).
    """

    def __init__(self, window_builder: Callable, window_length: float = None,
                 t_start: float = 0.0, overlap: float = 0.1,
                 refill_fraction: float = 0.5):
        self.builder = self._normalize(window_builder)
        self.window_length = window_length      # hint passed to the builder
        self.overlap_fraction = overlap
        self.refill_fraction = refill_fraction
        self._lock = threading.Lock()
        self._thread = None
        self._next = None                       # (win, t_ref) once built
        win, t_ref = self._build(t_start)
        self._install(win, t_ref)
        self.swaps = 0                          # observability (tests)

    @staticmethod
    def _normalize(builder):
        """Accept legacy builders returning a bare PrescribedAtmosphere
        with absolute times (t_ref = 0)."""
        def call(t0, t1):
            out = builder(t0, t1)
            if isinstance(out, tuple):
                return out
            return out, 0.0
        return call

    def _build(self, t0):
        length = self.window_length or 30 * 86400.0
        return self.builder(t0, t0 + length)

    def _install(self, win, t_ref):
        self._current = win
        self._t_ref = t_ref
        self._cov = (t_ref + float(win.times[0]), t_ref + float(win.times[-1]))

    @classmethod
    def synthetic(cls, grid, window_length=10 * 86400.0, t_start=0.0,
                  cadence=3 * 3600.0):
        from .atmosphere import synthetic_prescribed_atmosphere

        def build(t0, t1):
            win = synthetic_prescribed_atmosphere(grid, t0, t1, cadence)
            import jax.numpy as jnp
            rel = PrescribedAtmosphere(
                times=win.times - jnp.asarray(t0, win.times.dtype),
                fields=win.fields,
                reference_height=win.reference_height)
            return rel, float(t0)

        return cls(build, window_length, t_start)

    @classmethod
    def from_files(cls, grid, dir, time_indices_in_memory=240,
                   repeat_year=False, t_start=0.0, refill_fraction=0.5,
                   **kw):
        """File-backed multi-year windows (`JRA55FileAtmosphere`) — the
        reference's `MultiYearJRA55`/`RepeatYearJRA55` prefetching backend
        (`atmosphere.jl:22-27`). ``refill_fraction``: in-window position
        where the background build of the next window starts (lower =
        more overlap headroom for short windows)."""
        from .jra55 import JRA55FileAtmosphere
        backend = JRA55FileAtmosphere(
            grid, dir, time_indices_in_memory=time_indices_in_memory,
            repeat_year=repeat_year, **kw)
        pf = cls(backend.window_for_time, backend.window_span, t_start,
                 refill_fraction=refill_fraction)
        pf.backend = backend
        return pf

    # ------------------------------------------------------------------ #
    def _spawn_refill(self, t0_next):
        def work():
            win, t_ref = self._build(t0_next)
            with self._lock:
                self._next = (win, t_ref)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def window_for(self, t: float, t_end: float = None):
        """The window covering [t, t_end] → (PrescribedAtmosphere, t_ref);
        schedules/joins refills as the clock advances (reap/block/spawn
        state machine like the reference's staging callback,
        `jra55_data_staging.jl:167-210`)."""
        t_end = t if t_end is None else t_end
        lo, hi = self._cov
        span = max(hi - lo, 1e-9)

        # reap a completed refill once the clock has entered it
        with self._lock:
            if self._next is not None:
                win, t_ref = self._next
                n_lo = t_ref + float(win.times[0])
                if t >= n_lo:
                    self._install(win, t_ref)
                    self._next = None
                    self.swaps += 1
                    lo, hi = self._cov
                    span = max(hi - lo, 1e-9)

        # spawn the next refill once we're past the threshold
        frac = (t - lo) / span
        idle = self._thread is None or not self._thread.is_alive()
        if frac >= self.refill_fraction and self._next is None and idle:
            self._spawn_refill(hi - self.overlap_fraction * span)

        # block if the simulation caught up with an in-flight refill
        # (`ensure_year_ready!`, :187-197)
        if t_end > hi:
            if self._thread is not None:
                self._thread.join()
            with self._lock:
                if self._next is not None:
                    win, t_ref = self._next
                    self._install(win, t_ref)
                    self._next = None
                    self.swaps += 1
            # still short: build synchronously, but accept a clamped window
            # that can't be extended (dataset end — constant extrapolation)
            if t_end > self._cov[1] + 1e-6:
                win, t_ref = self._build(t)
                if t_ref + float(win.times[-1]) > self._cov[1]:
                    self._install(win, t_ref)
                    self.swaps += 1

        return self._current, self._t_ref

    def atmosphere_for(self, t: float) -> PrescribedAtmosphere:
        """Legacy accessor: window only (valid when t_ref is folded into
        the window times, i.e. synthetic short runs)."""
        return self.window_for(t)[0]
