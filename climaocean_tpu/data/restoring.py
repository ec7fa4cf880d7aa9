"""Restoring forcings.

TPU-native rebuild of NumericalEarth's `DatasetRestoring` (interior nudging
toward a dataset, `rate`, `time_indices_in_memory`) and
`SurfaceFluxRestoring` (restoring expressed as a surface flux riding the
`additional_surface_fluxes` path) — reference call sites:
`omip_simulation.jl:507-523` (WOA surface-salinity piston-velocity
restoring) and SURVEY.md §2b DataWrangling row.

Both plug into the model as closure-protocol objects (only the
`horizontal_tendencies` hook), so they compose with the physics closures in
the same tuple — mirroring the reference where restoring rides the flux BC
path and forcing callbacks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.units import days


@partial(jax.tree_util.register_dataclass, data_fields=["target"],
         meta_fields=["rate", "tracer"])
@dataclass(frozen=True)
class DatasetRestoring:
    """Interior nudging: G_c += rate · (target − c), masked to wet cells.

    ``target``: padded (Nz, Nyp, Nxp) device array (from
    `data.metadata.set_fields`-style ingestion); ``rate`` [1/s]. Seasonal
    targets can be refreshed host-side between windows (like the
    atmosphere prefetcher).
    """
    target: jnp.ndarray
    rate: float = 1.0 / (30 * days)
    tracer: str = "T"

    def initial_prognostics(self, grid):
        return {}

    def diffusivities(self, grid, fields, aux):
        return None

    def horizontal_tendencies(self, grid, fields, aux):
        c = fields[self.tracer]
        return {self.tracer: self.rate * (self.target - c) * grid.wet_c}


@partial(jax.tree_util.register_dataclass, data_fields=["targets", "times"],
         meta_fields=["rate", "tracer", "period", "metadata"])
@dataclass(frozen=True)
class TimeVaryingDatasetRestoring:
    """Interior nudging toward a TIME-INTERPOLATED dataset series — the
    reference's `DatasetRestoring(metadata, arch; rate,
    time_indices_in_memory)` (SURVEY.md §2b DataWrangling row): e.g. a WOA
    monthly climatology. The bracketing-slab interpolation runs ON DEVICE
    inside the jitted step (same searchsorted+take pattern as
    `PrescribedAtmosphere.at_time`), keyed on the absolute model time
    carried in `ClosureAux.t`.

    ``targets``: (n_times, Nz, Nyp, Nxp) padded device window;
    ``times``: (n_times,) seconds — the window is the device-resident
    `time_indices_in_memory` slice of the full series and can be rotated
    host-side (swap the data leaves; same shapes → jit cache hit), exactly
    the atmosphere-prefetcher pattern. ``period`` wraps time for
    climatological (repeat-year) series; ``metadata`` keeps the series
    address for host-side refresh (`refreshed`)."""
    targets: jnp.ndarray
    times: jnp.ndarray
    rate: float = 1.0 / (30 * days)
    tracer: str = "T"
    period: object = None               # e.g. 365*86400 for a climatology
    metadata: object = None

    def initial_prognostics(self, grid):
        return {}

    def diffusivities(self, grid, fields, aux):
        return None

    def target_at(self, t):
        tt = jnp.asarray(t, dtype=self.times.dtype)
        if self.period is not None:
            tt = jnp.mod(tt, jnp.asarray(self.period, self.times.dtype))
            # wrap-aware: a rotated December→January window stores unwrapped
            # times (t_jan + period); map early-year t into that range
            tt = jnp.where(tt < self.times[0], tt + self.period, tt)
        n = self.times.shape[0]
        i1 = jnp.clip(jnp.searchsorted(self.times, tt), 1, n - 1)
        i0 = i1 - 1
        t0 = jnp.take(self.times, i0)
        t1 = jnp.take(self.times, i1)
        w = jnp.clip((tt - t0) / jnp.maximum(t1 - t0, 1e-6), 0.0, 1.0)
        return ((1.0 - w) * jnp.take(self.targets, i0, axis=0)
                + w * jnp.take(self.targets, i1, axis=0))

    def horizontal_tendencies(self, grid, fields, aux):
        c = fields[self.tracer]
        target = self.target_at(getattr(aux, "t", 0.0))
        return {self.tracer: self.rate * (target - c) * grid.wet_c}

    def refreshed(self, t):
        """Host-side window rotation: reload the window around ``t`` from
        the series loader (no-op when ``t`` is inside the current window,
        or when the restoring was built from raw arrays). Returns a new
        restoring with the SAME shapes, so the jitted step's cache hits —
        the atmosphere-prefetcher pattern applied to restoring. Called
        automatically at every dispatch boundary by the run loop
        (`models.coupled._with_forcing` / `parallel.shard.resolve_model`);
        the covered-window check is pure host arithmetic against bounds
        cached on the loader — no device sync per dispatch.

        Climatological (``period``) series wrap: a window reaching past the
        last slab continues into the first slabs of the next cycle with
        unwrapped times (December → January + period), so the bracketing
        interpolation is correct across the year seam (the reference's
        `Cyclical()` FieldTimeSeries behavior)."""
        if self.metadata is None:
            return self
        ldr = self.metadata
        period = float(self.period) if self.period else None
        tt = float(t) % period if period else float(t)
        lo, hi = getattr(ldr, "loaded_bounds", None) or \
            (float(self.times[0]), float(self.times[-1]))
        tt_eff = tt + period if (period and tt < lo) else tt
        if lo <= tt_eff <= hi:
            return self
        import dataclasses as _dc
        n = self.targets.shape[0]
        nt = len(ldr.times)
        if period:
            # unwrapped series: slab i+nt is slab i one period later.
            # Search with the WRAP-SHIFTED time: for t earlier than the
            # first slab center (early Jan vs a mid-Jan monthly slab),
            # target_at interpolates at tt+period, so the window must be
            # the wrapped [Dec, Jan+period] one — searching the unshifted
            # tt would re-pick [Jan, Feb] whose bounds never cover tt+period
            # and reload on every dispatch (ADVICE r4, medium).
            search_t = tt + period if tt < ldr.times[0] else tt
            ext = np.concatenate([ldr.times, ldr.times + period])
            i1 = int(np.clip(np.searchsorted(ext, search_t), 1, 2 * nt - 1))
            i0 = i1 - 1
        else:
            i1 = int(np.clip(np.searchsorted(ldr.times, tt), 1, nt - 1))
            i0 = max(0, min(i1 - 1, nt - n))
            ext = ldr.times
        sel = list(range(i0, i0 + n))
        times = ext[[min(s, len(ext) - 1) for s in sel]].astype(np.float32)
        ldr.loaded_bounds = (float(times[0]), float(times[-1]))
        return _dc.replace(
            self, targets=ldr.load([s % nt for s in sel]),
            times=jnp.asarray(times))


@partial(jax.tree_util.register_dataclass, data_fields=["target_surface"],
         meta_fields=["piston_velocity", "tracer"])
@dataclass(frozen=True)
class SurfaceFluxRestoring:
    """Surface-only restoring as a flux: the reference's
    `salinity_surface_restoring` with ``rate = piston_velocity /
    (Δz_surface · days)`` (`omip_simulation.jl:507-523`), i.e. an effective
    surface flux ``piston_velocity/days · (target − c_surface)`` deposited
    in the top cell.

    ``target_surface``: padded (Nyp, Nxp); ``piston_velocity`` [m/day].
    """
    target_surface: jnp.ndarray
    piston_velocity: float = 0.5
    tracer: str = "S"

    def initial_prognostics(self, grid):
        return {}

    def diffusivities(self, grid, fields, aux):
        return None

    def horizontal_tendencies(self, grid, fields, aux):
        c_sfc = fields[self.tracer][-1]
        dz_top = grid.dz_c[-1]
        flux = (self.piston_velocity / days) * (self.target_surface - c_sfc)
        tend = jnp.zeros_like(fields[self.tracer])
        tend = tend.at[-1].set(flux / dz_top * grid.wet_c[-1])
        return {self.tracer: tend}


class _SeriesLoader:
    """Host-side address of a dataset time series regridded to one model
    grid (kept as a `TimeVaryingDatasetRestoring` meta field — hashable by
    identity, stable within a process)."""

    def __init__(self, metadata, grid, dates, times):
        self.metadata = metadata
        self.grid = grid
        self.dates = list(dates)
        self.times = np.asarray(times, np.float64)
        # (t_lo, t_hi) of the currently-loaded window, kept host-side so
        # the per-dispatch `refreshed` coverage check never syncs the device
        self.loaded_bounds = None

    def load(self, indices):
        from .metadata import Metadatum, regrid_to_grid

        grid = self.grid
        H = grid.H
        slabs = []
        for i in indices:
            meta = Metadatum(self.metadata.name, self.dates[i],
                             self.metadata.dataset, self.metadata.dir)
            interior = regrid_to_grid(meta, grid)
            padded = np.zeros((grid.Nz, grid.Nyp, grid.Nxp), np.float32)
            padded[:, H:H + grid.Ny, H:H + grid.Nx] = interior
            slabs.append(padded)
        return jnp.asarray(np.stack(slabs))


def _series_times(dates):
    """(times_seconds, period) for a date list: bare months 1..12 map to
    mid-month offsets of a 365-day climatological year (period wraps);
    YYYYMM-style dates map to mid-month offsets from the first year
    (period=None)."""
    month_len = 365.0 * 86400.0 / 12.0
    as_ints = [int(d) for d in dates]
    if all(1 <= d <= 12 for d in as_ints):
        return np.array([(d - 0.5) * month_len for d in as_ints]), 365.0 * 86400.0
    from .catalog import _date_parts
    y0 = _date_parts(dates[0])[0]
    t = [((y - y0) * 12 + (m - 1) + 0.5) * month_len
         for (y, m, _) in map(_date_parts, dates)]
    return np.array(t), None


def dataset_restoring(grid, metadata, rate=1.0 / (30 * days),
                      time_indices_in_memory=None, tracer=None):
    """Reference `DatasetRestoring(metadata, arch; rate,
    time_indices_in_memory)`: interior nudging toward the time-interpolated
    series addressed by a `Metadata` date range (e.g. WOAMonthly months
    1..12 → repeat-year climatology). Only ``time_indices_in_memory``
    slabs live on device; `refreshed(t)` rotates the window host-side."""
    dates = list(metadata.dates)
    if not dates:
        raise ValueError("dataset_restoring needs a Metadata date range")
    times, period = _series_times(dates)
    loader = _SeriesLoader(metadata, grid, dates, times)
    n = min(time_indices_in_memory or len(dates), len(dates))
    tracer = tracer or {"temperature": "T", "salinity": "S"}.get(
        metadata.name, "T")
    loader.loaded_bounds = (float(times[0]), float(times[n - 1]))
    return TimeVaryingDatasetRestoring(
        targets=loader.load(list(range(n))),
        times=jnp.asarray(times[:n].astype(np.float32)),
        rate=rate, tracer=tracer, period=period,
        metadata=loader if n < len(dates) else None)


def woa_salinity_restoring(grid, piston_velocity=0.5, dir="."):
    """The OMIP configuration's WOA surface-salinity restoring
    (`salinity_surface_restoring`)."""
    from .metadata import Metadatum, WOAAnnual, regrid_to_grid

    target = regrid_to_grid(Metadatum("salinity", dataset=WOAAnnual(),
                                      dir=dir), grid, surface=True)
    H = grid.H
    padded = np.zeros((grid.Nyp, grid.Nxp), np.float32)
    padded[H:H + grid.Ny, H:H + grid.Nx] = target
    return SurfaceFluxRestoring(target_surface=jnp.asarray(padded),
                                piston_velocity=piston_velocity)
