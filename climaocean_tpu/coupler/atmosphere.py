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
