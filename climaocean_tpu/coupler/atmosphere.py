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


def _time_seconds(nc, var):
    """Time coordinate of ``var`` in seconds from the file's epoch."""
    from ..data.netcdf import _coord_for_dim, classify_dims, decode
    kinds = classify_dims(nc, var)
    if "time" not in kinds:
        return None
    dim = var.dims[kinds.index("time")]
    cv = _coord_for_dim(nc, dim, "time")
    if cv is None:
        return np.arange(var.shape[kinds.index("time")], dtype=np.float64)
    t = decode(cv)
    units = str(cv.attrs.get("units", "")).lower()
    scale = 1.0
    if units.startswith("day"):
        scale = 86400.0
    elif units.startswith("hour"):
        scale = 3600.0
    elif units.startswith("min"):
        scale = 60.0
    return t * scale


def netcdf_prescribed_atmosphere(grid, dir, time_indices_in_memory=None,
                                 start_index=0, dtype=np.float32):
    """Build a `PrescribedAtmosphere` window from JRA55-do style NetCDF
    files in ``dir`` (one file per shortname, CF time axis) — the
    file-backed counterpart of `JRA55PrescribedAtmosphere(arch; dir,
    time_indices_in_memory, prefetch)` (reference `atmosphere.jl:22-27`).

    Each variable is read host-side, conservatively regridded onto the
    model grid, and stacked into the device-resident window; missing land
    variables (friver/licalvf) are added to rain when present.
    """
    from ..data.netcdf import (classify_dims, find_netcdf, load_field,
                               open_netcdf)
    from ..data.regrid import conservative_regrid_1d, fill_ocean_missing

    H = grid.H
    lat_dst = np.zeros(grid.Ny + 1)
    lat_dst[:-1] = np.asarray(grid.lat_cf[H:H + grid.Ny, H])
    lat_dst[-1] = 2 * lat_dst[-2] - lat_dst[-3]
    lon_dst = np.zeros(grid.Nx + 1)
    lon_dst[:-1] = np.asarray(grid.lon_ff[H, H:H + grid.Nx])
    lon_dst[-1] = lon_dst[0] + 360.0 if grid.periodic_x else \
        2 * lon_dst[-2] - lon_dst[-3]

    def pad(a2d):
        out = np.zeros((grid.Nyp, grid.Nxp), np.float64)
        out[H:H + grid.Ny, H:H + grid.Nx] = a2d
        # edge-replicate y halos, wrap x halos when periodic
        out[:H] = out[H]
        out[H + grid.Ny:] = out[H + grid.Ny - 1]
        if grid.periodic_x:
            out[:, :H] = out[:, grid.Nx:grid.Nx + H]
            out[:, H + grid.Nx:] = out[:, H:2 * H]
        else:
            out[:, :H] = out[:, H:H + 1]
            out[:, H + grid.Nx:] = out[:, H + grid.Nx - 1:H + grid.Nx]
        return out

    def read_series(shortname):
        path = find_netcdf(dir, shortname)
        if path is None:
            return None, None
        with open_netcdf(path) as nc:
            from ..data.netcdf import VAR_ALIASES
            vname = next((a for a in VAR_ALIASES.get(shortname, (shortname,))
                          if a in nc.variables), None)
            if vname is None:
                return None, None
            var = nc.variables[vname]
            kinds = classify_dims(nc, var)
            nt = (var.shape[kinds.index("time")] if "time" in kinds else 1)
            t = _time_seconds(nc, var)
        if t is None:
            t = np.array([0.0])
        n_keep = nt if time_indices_in_memory is None else \
            min(nt, time_indices_in_memory)
        i0 = min(start_index, nt - n_keep)
        slabs = []
        for it in range(i0, i0 + n_keep):
            data, _, lat_f, lon_f = load_field(path, shortname, time_index=it)
            a = fill_ocean_missing(data[-1], None, passes=2)
            a = conservative_regrid_1d(lat_f, lat_dst, a, axis=0)
            a = conservative_regrid_1d(lon_f, lon_dst, a, axis=1)
            slabs.append(pad(a))
        return np.asarray(t[i0:i0 + n_keep], np.float64), np.stack(slabs)

    def interp_onto(t_src, series, t_dst):
        """Linearly interpolate a (nt, Ny, Nx) series from its own time
        axis onto ``t_dst`` — JRA55-do variables have mixed cadences
        (3-hourly state vars, daily friver/licalvf), so positional slicing
        would misalign them."""
        if series.shape[0] == 1:
            return np.repeat(series, len(t_dst), axis=0)
        if len(t_src) == len(t_dst) and np.allclose(t_src, t_dst):
            return series
        i1 = np.clip(np.searchsorted(t_src, t_dst), 1, len(t_src) - 1)
        i0 = i1 - 1
        denom = np.maximum(t_src[i1] - t_src[i0], 1e-9)
        w = np.clip((t_dst - t_src[i0]) / denom, 0.0, 1.0)[:, None, None]
        return (1.0 - w) * series[i0] + w * series[i1]

    raw = {}
    for shortname, key in JRA55_FIELD_MAP.items():
        t, series = read_series(shortname)
        if series is None:
            raise FileNotFoundError(
                f"no NetCDF file for JRA55 variable '{shortname}' in {dir}")
        raw[key] = (t, series)
    # reference time axis: the shortest atmospheric-state axis (all nine
    # are 3-hourly in JRA55-do; min() trims ragged file ends)
    times = min((t for t, _ in raw.values()), key=len)
    fields = {k: interp_onto(t, s, times) for k, (t, s) in raw.items()}
    for land in JRA55_LAND_VARS:
        t, series = read_series(land)
        if series is not None:
            fields["rain"] = fields["rain"] + interp_onto(t, series, times)
    times = times - times[0]
    return PrescribedAtmosphere(
        times=jnp.asarray(times.astype(dtype)),
        fields={k: jnp.asarray(v.astype(dtype)) for k, v in fields.items()})
