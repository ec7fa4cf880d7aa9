"""Simulation driver: schedules, callbacks, run loop.

TPU-native mirror of Oceananigans' `Simulation` / `run!` / `add_callback!`
with `IterationInterval` / `TimeInterval` / `AveragedTimeInterval`
schedules and mid-run `Δt`/`stop_time` mutation (reference capability rows:
SURVEY.md §2b "Simulation, run!, ..."; `omip_simulation.jl:364-403`).

Design: the model step stays a single jitted pure function; the Python-side
loop only touches the device when a callback/writer actually fires
(SURVEY.md §7 hard part (g): the reference's per-iteration host reductions
are a known cost — ours are periodic and batched). State arrays are donated
between steps so the loop is allocation-free on device.
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
        self._next = 0.0

    def fires(self, sim) -> bool:
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
                 time=0.0, iteration=0):
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

    def run(self):
        self.running = True
        self.wall_start = _time.time()
        while not self.should_stop():
            self.state = self.step_fn(self.state, self.time, self.dt)
            self.time += self.dt
            self.iteration += 1
            for cb in self.callbacks:
                if cb.schedule.fires(self):
                    cb.func(self)
            for w in self.output_writers:
                w.maybe_write(self)
        jax.block_until_ready(self.state)
        self.running = False


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
