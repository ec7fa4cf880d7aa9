"""Simulation driver: schedules, callbacks, run loop.

TPU-native mirror of Oceananigans' `Simulation` / `run!` / `add_callback!`
with `IterationInterval` / `TimeInterval` / `AveragedTimeInterval`
schedules and mid-run `Δt`/`stop_time` mutation (reference capability rows:
SURVEY.md §2b "Simulation, run!, ..."; `omip_simulation.jl:364-403`).

Design: the model step stays a single jitted pure function; the Python-side
loop only touches the device when a callback/writer actually fires
(SURVEY.md §7 hard part (g): the reference's per-iteration host reductions
are a known cost — ours are periodic and batched). State buffers are not
donated between steps: donation measured perf-neutral on the TPU target,
and not donating lets callbacks/writers keep reading the previous state.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass

import jax

from ..utils.units import prettytime


class IterationInterval:
    def __init__(self, n: int):
        self.n = n

    def fires(self, sim) -> bool:
        return sim.iteration % self.n == 0


class TimeInterval:
    def __init__(self, interval: float):
        self.interval = interval
        self._next = None           # anchored to the clock on first call

    def fires(self, sim) -> bool:
        if self._next is None:
            # anchor at the next interval multiple strictly ahead of the
            # current clock — no spurious first-call fire at t=0 (or on
            # pickup mid-interval)
            self._next = (sim.time // self.interval + 1) * self.interval
            return False
        if sim.time + 1e-9 >= self._next:
            self._next = (sim.time // self.interval + 1) * self.interval
            return True
        return False


class WallTimeInterval:
    def __init__(self, interval: float):
        self.interval = interval
        self._last = _time.time()

    def fires(self, sim) -> bool:
        now = _time.time()
        if now - self._last >= self.interval:
            self._last = now
            return True
        return False


@dataclass
class Callback:
    func: object
    schedule: object
    name: str = ""


class Simulation:
    """Drives ``state = step_fn(state, t, dt)`` to ``stop_time`` /
    ``stop_iteration``, firing callbacks and output writers on schedule.

    ``step_fn`` is any callable of (state, time, dt) -> state; for coupled
    models it is the coupled step. ``sim.dt`` and ``sim.stop_time`` may be
    mutated from callbacks, like the reference.
    """

    def __init__(self, step_fn, state, dt, stop_time=None, stop_iteration=None,
                 time=0.0, iteration=0, multi_step_fn=None, batch_size=1):
        self.step_fn = step_fn
        self.state = state
        self.dt = float(dt)
        self.stop_time = stop_time
        self.stop_iteration = stop_iteration
        self.time = float(time)
        self.iteration = int(iteration)
        self.callbacks: list[Callback] = []
        self.output_writers: list = []
        self.running = False
        self.wall_start = None
        # dispatch batching: when no callback/writer can fire for the next
        # `batch_size` steps, advance them in ONE device dispatch via
        # ``multi_step_fn(state, t, dt, n)`` (a lax.scan over the step) —
        # production runs get the benchmark's dispatch amortization
        # (reference cost note: `launch.sh:368-373`; SURVEY.md §7 (g))
        self.multi_step_fn = multi_step_fn
        self.batch_size = max(1, int(batch_size))
        # distribution hook: when set, callbacks and writers receive this
        # object instead of the Simulation itself — a `GlobalStateView`
        # presenting the unpartitioned state while `self.state` stays the
        # stacked shard_map tiles the step functions exchange. `pickup`
        # uses `_partition_state` (when set) to restore a global checkpoint
        # into the tiled layout.
        self.callback_view = None
        self._partition_state = None

    def add_callback(self, func, schedule, name=""):
        self.callbacks.append(Callback(func, schedule, name))

    def add_output_writer(self, writer):
        self.output_writers.append(writer)

    def should_stop(self) -> bool:
        if self.stop_iteration is not None and self.iteration >= self.stop_iteration:
            return True
        if self.stop_time is not None and self.time >= self.stop_time - 1e-6:
            return True
        return False

    def _steps_to_boundary(self) -> int:
        """Steps that can be advanced before any schedule could fire or a
        stop condition is reached (conservative: unknown schedule types
        force single-stepping)."""
        n = self.batch_size
        if self.stop_iteration is not None:
            n = min(n, self.stop_iteration - self.iteration)
        if self.stop_time is not None:
            import math
            n = min(n, math.ceil((self.stop_time - self.time) / self.dt - 1e-9))
        scheds = [cb.schedule for cb in self.callbacks]
        for w in self.output_writers:
            if hasattr(w, "schedule"):
                scheds.append(w.schedule)
            # averaging writers SAMPLE on their stride between fires — a
            # batch must not skip over a sampling iteration or the average
            # silently loses samples under dispatch batching
            if getattr(w, "averaging", False):
                scheds.append(IterationInterval(
                    getattr(w, "averaging_stride", 1)))
        for sched in scheds:
            if isinstance(sched, IterationInterval):
                # fires when iteration % n == 0 (checked after increment)
                k = sched.n - self.iteration % sched.n
            elif isinstance(sched, TimeInterval):
                if sched._next is None:
                    k = 1
                else:
                    import math
                    k = max(1, math.ceil((sched._next - self.time)
                                         / self.dt - 1e-9))
            elif isinstance(sched, WallTimeInterval):
                continue            # coarse granularity is acceptable
            else:
                k = 1
            n = min(n, k)
        return max(1, n)

    def run(self):
        self.running = True
        self.wall_start = _time.time()
        while not self.should_stop():
            # dispatch min(batch_size, steps-to-boundary) per device call.
            # The compiled-program set stays small: schedule periods (and
            # averaging strides) are fixed, so the distinct batch lengths
            # cycle among a handful of values, each compiled once
            # (`make_batched_step_fn` caches per length).
            n = 1
            if self.multi_step_fn is not None and self.batch_size > 1:
                n = min(self.batch_size, self._steps_to_boundary())
            if n > 1:
                self.state = self.multi_step_fn(self.state, self.time,
                                                self.dt, n)
            else:
                self.state = self.step_fn(self.state, self.time, self.dt)
            self.time += n * self.dt
            self.iteration += n
            view = self.callback_view or self
            for cb in self.callbacks:
                if cb.schedule.fires(self):
                    cb.func(view)
            for w in self.output_writers:
                w.maybe_write(view)
        jax.block_until_ready(self.state)
        self.running = False


class GlobalStateView:
    """Presents a Simulation whose ``.state`` is the UNPARTITIONED global
    state — handed to writers/callbacks when the step runs on shard_map
    tiles (`Simulation.callback_view`). The unpartition is lazy and cached
    per iteration, so the 4 OMIP writers + progress callback pay for at
    most one gather per fire boundary. Attribute reads/writes other than
    ``state`` forward to the wrapped Simulation (callbacks may mutate
    ``sim.dt`` / ``sim.stop_time`` as in the reference)."""

    def __init__(self, sim, unpartition):
        object.__setattr__(self, "_sim", sim)
        object.__setattr__(self, "_unpartition", unpartition)
        object.__setattr__(self, "_cache", (None, None))

    @property
    def state(self):
        it = self._sim.iteration
        cit, cs = object.__getattribute__(self, "_cache")
        if cit != it:
            cs = self._unpartition(self._sim.state)
            object.__setattr__(self, "_cache", (it, cs))
        return cs

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "_sim"), name)

    def __setattr__(self, name, value):
        setattr(object.__getattribute__(self, "_sim"), name, value)


def nan_checker(fields=("T", "u")):
    """Reference NaN-checker callback (SURVEY.md §2b `Simulation` row):
    abort the run with a clear message when a prognostic goes non-finite."""
    import jax
    import jax.numpy as jnp

    def cb(sim):
        s = sim.state
        ocean = s.get("ocean", s) if isinstance(s, dict) else s
        for name in fields:
            if isinstance(ocean, dict) and name in ocean:
                if not bool(jnp.isfinite(ocean[name]).all()):
                    sim.running = False
                    sim.stop_iteration = sim.iteration
                    raise FloatingPointError(
                        f"NaN/Inf in '{name}' at iteration {sim.iteration}, "
                        f"t = {sim.time}")

    return cb


def progress_callback(fields=("T", "S", "u", "v"), sea_ice_fields=()):
    """Reference `Progress` (`src/ClimaOcean.jl:48-88`): wall time per
    interval, time/iter/Δt, tracer extrema, velocity maxima. Device
    reductions happen only when the callback fires."""
    import jax.numpy as jnp
    last = {"wall": _time.time(), "iter": 0}

    def cb(sim):
        now = _time.time()
        elapsed = now - last["wall"]
        iters = max(1, sim.iteration - last["iter"])
        last["wall"], last["iter"] = now, sim.iteration
        msgs = [f"time: {prettytime(sim.time)}", f"iter: {sim.iteration}",
                f"Δt: {prettytime(sim.dt)}"]
        s = sim.state
        ocean = s.get("ocean", s) if isinstance(s, dict) else s
        for name in fields:
            if isinstance(ocean, dict) and name in ocean:
                a = ocean[name]
                if name in ("T", "S"):
                    msgs.append(f"{name}: ({float(jnp.min(a)):.2f}, {float(jnp.max(a)):.2f})")
                else:
                    msgs.append(f"max|{name}|: {float(jnp.max(jnp.abs(a))):.3f}")
        msgs.append(f"wall/iter: {prettytime(elapsed / iters)}")
        print(", ".join(msgs), flush=True)

    return cb
