"""Prescribed atmosphere with on-device time interpolation.

TPU-native rebuild of NumericalEarth's `JRA55PrescribedAtmosphere` /
`PrescribedAtmosphere` (reference: `atmosphere.jl:13-49` — JRA55-do,
3-hourly cadence, `time_indices_in_memory` ring buffer with host-side
prefetch; SURVEY.md §2b, §3.2 "interpolate prescribed atmosphere state to
interface time").

Design: a window of time slices lives on device as stacked arrays
``(n_times, Nyp, Nxp)`` per variable; `at_time` linearly interpolates in
time *inside jit* (a `searchsorted` + two `take`s — no host round trip).
The host-side `PrefetchingAtmosphere` rotates the window forward
asynchronously, mirroring the reference's prefetch backend; the synthetic
generator (`data.synthetic.synthetic_atmosphere`) provides JRA55-like
fields in this zero-egress environment, and on-disk readers can fill the
same structure.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from ..coupler.similarity_theory import AtmosphereState

VARS = ("u", "v", "T", "q", "p", "Qsw_down", "Qlw_down", "rain", "snow")


@partial(jax.tree_util.register_dataclass,
         data_fields=["times", "fields"], meta_fields=["reference_height"])
@dataclass(frozen=True)
class PrescribedAtmosphere:
    """Device-resident forcing window."""
    times: jnp.ndarray          # (n,) seconds
    fields: dict                # name -> (n, Nyp, Nxp)
    reference_height: float = 10.0

    def at_time(self, t) -> AtmosphereState:
        t = jnp.asarray(t, dtype=self.times.dtype)
        n = self.times.shape[0]
        i1 = jnp.clip(jnp.searchsorted(self.times, t), 1, n - 1)
        i0 = i1 - 1
        t0 = jnp.take(self.times, i0)
        t1 = jnp.take(self.times, i1)
        w = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-6), 0.0, 1.0)

        def interp(a):
            return (1.0 - w) * jnp.take(a, i0, axis=0) + w * jnp.take(a, i1, axis=0)

        f = {k: interp(v) for k, v in self.fields.items()}
        return AtmosphereState(u=f["u"], v=f["v"], T=f["T"], q=f["q"], p=f["p"],
                               Qsw_down=f["Qsw_down"], Qlw_down=f["Qlw_down"],
                               rain=f["rain"], snow=f["snow"])


@partial(jax.tree_util.register_dataclass,
         data_fields=["times", "fields", "iy", "ix", "wy", "wx",
                      "Ry", "Cx"],
         meta_fields=["reference_height"])
@dataclass(frozen=True)
class InterpolatedAtmosphere:
    """Forcing window stored at the FILE's NATIVE resolution with
    on-device bilinear interpolation to the model grid inside `at_time`.

    This is how the reference serves JRA55: the FieldTimeSeries window
    lives on the JRA55 grid and the coupler interpolates the atmospheric
    state to the ocean grid pointwise each coupling step (SURVEY.md §3.2
    "interpolate prescribed atmosphere state to interface time"). Storing
    model-resolution windows instead (the `PrescribedAtmosphere` path)
    costs ~9 host regrids + a model-res device transfer PER TIME INDEX —
    at 1/4° that is ~30 MB and ~100 ms of host work per 3-hour slab, which
    outruns the single-core host long before it outruns the TPU. Here the
    host ships ~0.15 MB per slab and the TPU does 4 gathers + a lerp per
    field (~0.3 ms/step at 1/4°).

    ``fields``: name -> (nt, nlat, nlon) native-grid slabs;
    ``iy``/``ix``: (Nyp, Nxp) int32 lower-corner source indices at the
    model's padded cell centers; ``wy``/``wx``: fractional weights toward
    the upper corner (x wraps periodically, y clamps at the poles).

    ``Ry``/``Cx``: on REGULAR destination grids (rows = latitude lines,
    columns = constant longitude — every lat-lon config) the bilinear
    sample is separable, and these dense weight matrices ((Nyp, nlat) and
    (nlon, Nxp), 2 nnz per row/col) turn it into two small MXU matmuls —
    per-point gathers lower catastrophically on TPU (measured +290 ms per
    1/4° step via the gather path vs ~0.2 ms via the matmuls). None on
    curvilinear (tripolar-cap) grids, where `at_time` falls back to the
    gather form."""
    times: jnp.ndarray
    fields: dict
    iy: jnp.ndarray
    ix: jnp.ndarray
    wy: jnp.ndarray
    wx: jnp.ndarray
    Ry: object = None
    Cx: object = None
    reference_height: float = 10.0

    def at_time(self, t) -> AtmosphereState:
        t = jnp.asarray(t, dtype=self.times.dtype)
        n = self.times.shape[0]
        i1 = jnp.clip(jnp.searchsorted(self.times, t), 1, n - 1)
        i0 = i1 - 1
        t0 = jnp.take(self.times, i0)
        t1 = jnp.take(self.times, i1)
        w = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-6), 0.0, 1.0)

        if self.Ry is not None:
            def sample(a):
                f = (1.0 - w) * jnp.take(a, i0, axis=0) \
                    + w * jnp.take(a, i1, axis=0)      # (nlat, nlon)
                return jnp.dot(jnp.dot(self.Ry, f, precision="float32"),
                               self.Cx, precision="float32")
        else:
            any_field = next(iter(self.fields.values()))
            nlat, nlon = any_field.shape[-2:]
            iyp = jnp.minimum(self.iy + 1, nlat - 1)
            ixp = jnp.remainder(self.ix + 1, nlon)
            w00 = (1.0 - self.wy) * (1.0 - self.wx)
            w01 = (1.0 - self.wy) * self.wx
            w10 = self.wy * (1.0 - self.wx)
            w11 = self.wy * self.wx

            def sample(a):
                f = (1.0 - w) * jnp.take(a, i0, axis=0) \
                    + w * jnp.take(a, i1, axis=0)      # (nlat, nlon)
                return (w00 * f[self.iy, self.ix] + w01 * f[self.iy, ixp]
                        + w10 * f[iyp, self.ix] + w11 * f[iyp, ixp])

        f = {k: sample(v) for k, v in self.fields.items()}
        return AtmosphereState(u=f["u"], v=f["v"], T=f["T"], q=f["q"],
                               p=f["p"], Qsw_down=f["Qsw_down"],
                               Qlw_down=f["Qlw_down"], rain=f["rain"],
                               snow=f["snow"])


def bilinear_sample_plan(grid, lat_src, lon_src):
    """(iy, ix, wy, wx) numpy arrays for bilinear sampling of a regular
    (lat_src, lon_src) CENTER grid at the model's padded cell centers —
    the host half of `InterpolatedAtmosphere` (periodic in lon, clamped in
    lat)."""
    lat = np.asarray(grid.lat_cc, np.float64)
    lon = np.asarray(grid.lon_cc, np.float64)
    lat_src = np.asarray(lat_src, np.float64)
    lon_src = np.asarray(lon_src, np.float64)
    nlat, nlon = len(lat_src), len(lon_src)

    pos_y = np.interp(lat, lat_src, np.arange(nlat))
    iy = np.clip(np.floor(pos_y), 0, nlat - 2).astype(np.int32)
    wy = np.clip(pos_y - iy, 0.0, 1.0)

    lon_ext = np.concatenate([lon_src, lon_src[:1] + 360.0])
    lo = (lon - lon_src[0]) % 360.0 + lon_src[0]
    pos_x = np.interp(lo, lon_ext, np.arange(nlon + 1))
    ix = (np.floor(pos_x).astype(np.int64) % nlon).astype(np.int32)
    wx = np.clip(pos_x - np.floor(pos_x), 0.0, 1.0)
    return iy, ix, wy.astype(np.float32), wx.astype(np.float32)


def separable_sample_matrices(iy, ix, wy, wx, nlat, nlon, tol=1e-6):
    """Dense (Ry, Cx) weight matrices for a REGULAR destination grid —
    Ry (Nyp, nlat) with row weights, Cx (nlon, Nxp) with column weights —
    such that ``Ry @ f @ Cx`` equals the bilinear gather sample. Returns
    None when the sampling is not separable (indices/weights vary along
    the other axis: curvilinear destinations)."""
    if (np.abs(iy - iy[:, :1]).max() > 0 or np.abs(ix - ix[:1]).max() > 0
            or np.abs(wy - wy[:, :1]).max() > tol
            or np.abs(wx - wx[:1]).max() > tol):
        return None
    nyp, nxp = iy.shape
    iy0 = iy[:, 0]
    wy0 = wy[:, 0]
    ix0 = ix[0]
    wx0 = wx[0]
    Ry = np.zeros((nyp, nlat), np.float32)
    r = np.arange(nyp)
    Ry[r, iy0] = 1.0 - wy0
    Ry[r, np.minimum(iy0 + 1, nlat - 1)] += wy0
    Cx = np.zeros((nlon, nxp), np.float32)
    c = np.arange(nxp)
    Cx[ix0, c] = 1.0 - wx0
    Cx[(ix0 + 1) % nlon, c] += wx0
    return Ry, Cx


def synthetic_prescribed_atmosphere(grid, t_start=0.0, t_end=10 * 86400.0,
                                    cadence=3 * 3600.0, dtype=np.float32):
    """Build a `PrescribedAtmosphere` window from the analytic JRA55 proxy
    (3-hourly cadence like JRA55-do)."""
    from ..data.synthetic import synthetic_atmosphere

    lon = np.asarray(grid.lon_cc)
    lat = np.asarray(grid.lat_cc)
    times = np.arange(t_start, t_end + cadence, cadence)
    slabs = {k: [] for k in VARS}
    for t in times:
        raw = synthetic_atmosphere(lon, lat, float(t))
        slabs["u"].append(raw["uas"])
        slabs["v"].append(raw["vas"])
        slabs["T"].append(raw["tas"])
        slabs["q"].append(raw["huss"])
        slabs["p"].append(raw["psl"])
        slabs["Qsw_down"].append(raw["rsds"])
        slabs["Qlw_down"].append(raw["rlds"])
        slabs["rain"].append(raw["prra"] + raw["friver"])
        slabs["snow"].append(raw["prsn"])
    fields = {k: jnp.asarray(np.stack(v).astype(dtype)) for k, v in slabs.items()}
    return PrescribedAtmosphere(times=jnp.asarray(times.astype(dtype)), fields=fields)


# JRA55-do shortname -> PrescribedAtmosphere field (reference
# `jra55_data_staging.jl:8` JRA55_SHORTNAMES; `atmosphere.jl:13-49`)
JRA55_FIELD_MAP = {"uas": "u", "vas": "v", "tas": "T", "huss": "q",
                   "psl": "p", "rsds": "Qsw_down", "rlds": "Qlw_down",
                   "prra": "rain", "prsn": "snow"}
# land fluxes folded into the freshwater field like the reference's
# JRA55PrescribedLand rivers/icebergs
JRA55_LAND_VARS = ("friver", "licalvf")


def netcdf_prescribed_atmosphere(grid, dir, time_indices_in_memory=None,
                                 start_index=0, dtype=np.float32):
    """Build a `PrescribedAtmosphere` window from JRA55-do style NetCDF
    files in ``dir`` (one or more files per shortname, CF time axes of
    mixed cadence) — the file-backed counterpart of
    `JRA55PrescribedAtmosphere(arch; dir, time_indices_in_memory)`
    (reference `atmosphere.jl:22-27`). Thin wrapper over the multi-year
    backend (`coupler.jra55.JRA55FileAtmosphere`) serving one window;
    times are relative to the window start. For long runs use
    `PrefetchingAtmosphere.from_files` instead (bounded memory, rotation).
    """
    from .jra55 import JRA55FileAtmosphere
    backend = JRA55FileAtmosphere(
        grid, dir,
        time_indices_in_memory=(time_indices_in_memory
                                or max(1, 10 ** 9)), dtype=dtype)
    t0 = float(backend.times[min(start_index, backend.nt - 1)])
    win, _ = backend.window_for_time(t0)
    return win
