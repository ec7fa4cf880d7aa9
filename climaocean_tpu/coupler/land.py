"""Prescribed land freshwater forcing: river runoff + iceberg calving.

TPU-native rebuild of the reference's `JRA55PrescribedLand` component —
the third member of the `(atmosphere, radiation, land)` forcing triple
(`/root/reference/src/OMIPConfigurations/atmosphere.jl:46`), serving the
JRA55-do `friver` (river discharge) and `licalvf` (land-ice calving)
variables (`jra55_data_staging.jl:8`) as a coastal freshwater mass flux
onto the ocean surface.

Design (TPU-first):
  * the device-resident window is a small (n_times, Nyp, Nxp) stack at
    MODEL resolution — runoff is daily cadence and near-zero away from
    coasts, so the host regrid cost is negligible next to the 3-hourly
    atmosphere; `at_time` is the same searchsorted+lerp as
    `PrescribedAtmosphere` and runs inside the jitted coupled step;
  * mass that regrids onto DRY model cells (river mouths narrower than a
    grid cell, calving lines on the land mask) is pushed to the nearest
    wet cells by a conservative host-side spreading walk
    (`spread_to_coast`) — the river-mouth spreading the reference gets
    from NumericalEarth's runoff regridding;
  * host-side rotation rides the same `refreshed(t)` protocol as
    `TimeVaryingDatasetRestoring`, hooked into `make_forcing_resolver`,
    so windows rotate at dispatch boundaries with unchanged shapes (jit
    cache hits).

The flux enters the coupled step as a surface salinity flux
``Q_S -= SSS · R / ρ_fresh`` AFTER the sea-ice blending (rivers discharge
under ice too), so the `wfo` surface diagnostic and the global salinity
normalization both see it.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

RHO_FRESH = 1000.0
SECONDS_PER_YEAR = 365.0 * 86400.0


def spread_to_coast(runoff, grid, max_passes=64):
    """Conservatively redistribute freshwater mass sitting on DRY model
    cells to nearby wet cells (host-side numpy, window-build time only).

    Each pass moves every dry cell's mass equally to its 4 neighbours
    (x wraps when the grid is periodic; y clamps); wet-cell mass stays
    put. Total mass (flux × cell area) is conserved to roundoff; after
    the walk any residual interior-land mass (closed basins) is dropped
    with the same fate as the reference's land-masked runoff. Returns the
    flux field [kg/m²/s] with support only on wet cells."""
    H = grid.H
    wet = np.asarray(grid.wet_c[-1])[H:H + grid.Ny, H:H + grid.Nx] > 0
    az = np.asarray(grid.az_cc)[H:H + grid.Ny, H:H + grid.Nx]
    r = np.asarray(runoff, np.float64)[..., H:H + grid.Ny, H:H + grid.Nx]
    m = r * az                                       # mass rate per cell
    wet_b = wet[None] if m.ndim == 3 else wet

    def shift(a, dy, dx):
        """Move mass one cell over; at non-periodic edges the mass that
        would leave the domain STAYS in the edge cell (clamp, not zero —
        zeroing silently destroyed up to a quarter of an edge-row river's
        discharge per pass)."""
        out = a
        if dx:
            out = np.roll(out, dx, axis=-1)
            if not grid.periodic_x:
                # the roll carried the edge cell's mass around the wrap;
                # send it back to the edge it left
                if dx > 0:
                    out[..., -1] += out[..., 0]
                    out[..., 0] = 0.0
                else:
                    out[..., 0] += out[..., -1]
                    out[..., -1] = 0.0
        if dy:
            out = np.roll(out, dy, axis=-2)
            if dy > 0:
                out[..., -1, :] += out[..., 0, :]
                out[..., 0, :] = 0.0
            else:
                out[..., 0, :] += out[..., -1, :]
                out[..., -1, :] = 0.0
        return out

    for _ in range(max_passes):
        dry_mass = np.where(wet_b, 0.0, m)
        if float(np.abs(dry_mass).sum()) <= 1e-12 * max(float(np.abs(m).sum()), 1e-30):
            break
        m = m - dry_mass + 0.25 * (shift(dry_mass, 0, 1) + shift(dry_mass, 0, -1)
                                   + shift(dry_mass, 1, 0) + shift(dry_mass, -1, 0))
    m = np.where(wet_b, m, 0.0)
    out = np.zeros(runoff.shape, np.float32)
    out[..., H:H + grid.Ny, H:H + grid.Nx] = (m / az).astype(np.float32)
    return out


@partial(jax.tree_util.register_dataclass, data_fields=["times", "runoff"],
         meta_fields=["loader", "period"])
@dataclass(frozen=True)
class PrescribedLand:
    """Device-resident land freshwater window.

    ``times``: (n,) ABSOLUTE simulation seconds (repeat-year windows may
    carry UNWRAPPED times past the period end, like
    `TimeVaryingDatasetRestoring` — the Dec→Jan window); ``runoff``:
    (n, Nyp, Nxp) freshwater mass flux [kg/m²/s] on the model grid,
    wet-only (already coastal-spread). ``loader`` keeps the host-side
    address for `refreshed` rotation (None for static/synthetic
    forcing); ``period`` wraps time for repeat-year series."""
    times: jnp.ndarray
    runoff: jnp.ndarray
    loader: object = None
    period: object = None

    def at_time(self, t):
        tt = jnp.asarray(t, dtype=self.times.dtype)
        if self.period is not None:
            tt = jnp.mod(tt, jnp.asarray(self.period, self.times.dtype))
            # wrap-aware: a rotated Dec→Jan window stores unwrapped times
            tt = jnp.where(tt < self.times[0], tt + self.period, tt)
        n = self.times.shape[0]
        i1 = jnp.clip(jnp.searchsorted(self.times, tt), 1, n - 1)
        i0 = i1 - 1
        t0 = jnp.take(self.times, i0)
        t1 = jnp.take(self.times, i1)
        w = jnp.clip((tt - t0) / jnp.maximum(t1 - t0, 1e-6), 0.0, 1.0)
        return (1.0 - w) * jnp.take(self.runoff, i0, axis=0) \
            + w * jnp.take(self.runoff, i1, axis=0)

    def refreshed(self, t):
        """Host-side window rotation (same contract as
        `TimeVaryingDatasetRestoring.refreshed`): no-op while ``t`` is
        covered; otherwise reload the window around ``t`` from the loader
        with the SAME shapes. The coverage check reads bounds cached on
        the LOADER — pure host arithmetic, no device sync per dispatch."""
        if self.loader is None:
            return self
        ldr = self.loader
        tt = ldr.wrap(float(t))
        lo, hi = getattr(ldr, "loaded_bounds", None) or \
            (float(self.times[0]), float(self.times[-1]))
        period = float(self.period) if self.period else None
        tt_eff = tt + period if (period and tt < lo) else tt
        if lo <= tt_eff <= hi:
            return self
        import dataclasses as _dc
        times, runoff = ldr.window(tt, self.runoff.shape[0])
        ldr.loaded_bounds = (float(times[0]), float(times[-1]))
        return _dc.replace(self, times=jnp.asarray(times, jnp.float32),
                           runoff=jnp.asarray(runoff))


class _JRA55LandLoader:
    """Host-side loader over a `JRA55FileAtmosphere` backend: sums the
    friver + licalvf series, regrids each daily slab to the model grid,
    and coastal-spreads it."""

    def __init__(self, backend, grid):
        self.backend = backend
        self.grid = grid
        names = [sn for sn in ("friver", "licalvf")
                 if sn in backend.index]
        if not names:
            raise FileNotFoundError(
                "no friver/licalvf files in the JRA55 directory")
        self.names = names
        # common (daily) time axis from the first land variable
        self.times = backend._var_times(names[0])
        # (t_lo, t_hi) of the loaded window, host-side (no device sync in
        # the per-dispatch refreshed() coverage check)
        self.loaded_bounds = None

    def wrap(self, t):
        if self.backend.repeat_year:
            return float(t) % float(self.backend.year_span)
        return float(t)

    def window(self, t, n):
        vt = self.times
        nt = len(vt)
        if self.backend.repeat_year:
            # wrap-aware selection on the extended axis: slab i+nt is
            # slab i one period later, so late-December windows continue
            # into January with UNWRAPPED times and the year seam
            # interpolates instead of clamping/reloading every dispatch
            period = float(self.backend.year_span)
            search_t = t + period if t < vt[0] else t
            ext = np.concatenate([vt, vt + period])
            i1 = int(np.clip(np.searchsorted(ext, search_t), 1, 2 * nt - 1))
            i0 = i1 - 1
            idx = [min(i0 + k, 2 * nt - 1) for k in range(n)]
            times = ext[idx].astype(np.float32)
            read_idx = [i % nt for i in idx]
        else:
            i1 = int(np.clip(np.searchsorted(vt, t), 1, nt - 1))
            i0 = int(np.clip(i1 - 1, 0, max(0, nt - n)))
            idx = [min(i0 + k, nt - 1) for k in range(n)]
            times = vt[idx].astype(np.float32)
            read_idx = idx
        slabs = []
        for i in read_idx:
            s = None
            for sn in self.names:
                a = self.backend._read_slab(sn, min(i, len(
                    self.backend._var_times(sn)) - 1))
                a = np.nan_to_num(np.asarray(a), nan=0.0)
                s = a if s is None else s + a
            slabs.append(np.maximum(s, 0.0))
        stack = spread_to_coast(np.stack(slabs), self.grid)
        return times, jnp.asarray(stack)


def jra55_prescribed_land(grid, backend, t=0.0, n_window=8):
    """Build a `PrescribedLand` from an existing `JRA55FileAtmosphere`
    file backend (reference `JRA55PrescribedLand(arch; kw...)`,
    `atmosphere.jl:46`)."""
    loader = _JRA55LandLoader(backend, grid)
    times, runoff = loader.window(loader.wrap(float(t)), int(n_window))
    loader.loaded_bounds = (float(times[0]), float(times[-1]))
    return PrescribedLand(times=jnp.asarray(times, jnp.float32),
                          runoff=runoff, loader=loader,
                          period=(float(backend.year_span)
                                  if backend.repeat_year else None))


def synthetic_prescribed_land(grid, t0=0.0, t1=SECONDS_PER_YEAR,
                              amplitude=2e-5, n_times=None):
    """Analytic land-forcing proxy (the loud-synthetic-fallback pattern of
    `data.metadata`): runoff concentrated on coastal wet cells (wet with a
    dry neighbour), weighted toward the tropics and high northern
    latitudes like the real river distribution, with a seasonal cycle
    peaking in boreal summer (snowmelt). ``amplitude`` [kg/m²/s] is the
    peak coastal-cell discharge (≈ the right global total: big-river
    mouths spread over a few 1° coastal cells)."""
    H = grid.H
    wet = np.asarray(grid.wet_c[-1]) > 0
    dry = ~wet
    neighbor_dry = (np.roll(dry, 1, -1) | np.roll(dry, -1, -1)
                    | np.roll(dry, 1, -2) | np.roll(dry, -1, -2))
    coast = (wet & neighbor_dry).astype(np.float32)
    lat = np.asarray(grid.lat_cc)
    weight = (np.exp(-(lat / 15.0) ** 2)            # tropical rivers
              + 0.8 * np.exp(-((lat - 60.0) / 12.0) ** 2))  # Arctic rivers
    base = coast * weight.astype(np.float32)
    # keep support interior-only; halo cells are refilled by consumers
    mask = np.zeros_like(base)
    mask[H:H + grid.Ny, H:H + grid.Nx] = 1.0
    base = base * mask
    if n_times is None:
        # ~monthly sampling so multi-year spans don't alias the seasonal
        # cycle (a fixed 5 samples over 3 years made it nonsense); capped
        # — very long synthetic spans coarsen rather than ballooning HBM
        # (file-backed land uses the rotating 8-slab window instead)
        n_times = min(max(5, int(round((float(t1) - float(t0))
                                       / (SECONDS_PER_YEAR / 12.0))) + 1),
                      61)
    times = np.linspace(float(t0), float(t1), int(n_times))
    season = 1.0 + 0.5 * np.sin(2 * np.pi * (times / SECONDS_PER_YEAR - 0.4))
    runoff = np.asarray(amplitude, np.float32) * season[:, None, None] \
        * base[None]
    return PrescribedLand(times=jnp.asarray(times, jnp.float32),
                          runoff=jnp.asarray(runoff, jnp.float32))
