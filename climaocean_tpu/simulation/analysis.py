"""Offline analysis loaders — the visualization data layer.

TPU-native rebuild of the reference's offline analysis machinery
(`experiments/OMIPSimulations/scripts/visualize/cache.jl` + `common.jl`;
SURVEY.md §3.5): a lazy loader DAG keyed by symbol with a disk cache, and
the derived physics used by the 26-figure suite — AMOC streamfunction from
saved meridional volume fluxes (ψ = −cumsum_z Σ_basin vvol,
`cache.jl:1195-1211`), mixed-layer depth re-derivation, and ice
extent/area/volume integrals (`common.jl:718-788`).

Input: the `.npz` part files written by `simulation.diagnostics`.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np

SVERDRUP = 1e6


# --------------------------------------------------------------------------
# part-file reading
# --------------------------------------------------------------------------

def read_parts(dir, prefix):
    """Concatenate all ``<prefix>_part*.npz`` records along time."""
    pat = re.compile(rf"{re.escape(prefix)}_part(\d+)\.npz$")
    files = sorted((int(m.group(1)), os.path.join(dir, f))
                   for f in os.listdir(dir) if (m := pat.match(f)))
    if not files:
        raise FileNotFoundError(f"no parts '{prefix}_part*' in {dir}")
    out = {}
    for _, path in files:
        with np.load(path) as f:
            for k in f.files:
                out.setdefault(k, []).append(np.asarray(f[k]))
    return {k: np.concatenate(v, axis=0) for k, v in out.items()}


# --------------------------------------------------------------------------
# loader DAG with disk cache (reference `LOADERS` + `disk_cached`)
# --------------------------------------------------------------------------

class CaseCache:
    """Lazy loader DAG over one simulation's output directory.

    ``get(sym)`` computes (or reads from the on-disk cache) the named
    product; loaders can request other symbols via the cache, forming the
    DAG. Cache keys include the part-file inventory so stale caches
    invalidate when new output lands (reference `cache.jl:237-277`)."""

    LOADERS = {}

    def __init__(self, dir, grid=None, prefix="omip"):
        self.dir = dir
        self.grid = grid
        self.prefix = prefix
        self.cache_dir = os.path.join(dir, "analysis_cache")
        os.makedirs(self.cache_dir, exist_ok=True)
        self._mem = {}

    @classmethod
    def loader(cls, name):
        def deco(fn):
            cls.LOADERS[name] = fn
            return fn
        return deco

    def _stamp(self):
        names = sorted(f for f in os.listdir(self.dir) if f.endswith(".npz"))
        return hashlib.sha1("|".join(names).encode()).hexdigest()[:12]

    def get(self, sym):
        if sym in self._mem:
            return self._mem[sym]
        path = os.path.join(self.cache_dir, f"{sym}_{self._stamp()}.npz")
        if os.path.exists(path):
            with np.load(path) as f:
                out = {k: f[k] for k in f.files}
            out = out["__sole__"] if set(out) == {"__sole__"} else out
        else:
            out = self.LOADERS[sym](self)
            save = out if isinstance(out, dict) else {"__sole__": out}
            np.savez_compressed(path, **save)
        self._mem[sym] = out
        return out


@CaseCache.loader("surface")
def _load_surface(c):
    return read_parts(c.dir, c.prefix + "_surface")


@CaseCache.loader("fields")
def _load_fields(c):
    return read_parts(c.dir, c.prefix + "_fields")


@CaseCache.loader("scalars")
def _load_scalars(c):
    return read_parts(c.dir, c.prefix + "_scalars")


def atlantic_ocean_basin(grid):
    """Atlantic basin mask at centers, interior (Ny, Nx) — reference
    `atlantic_ocean_basin(grid)` (`visualize/cache.jl:1178`). Geographic
    box-polygon: between the Americas and Afro-Europe, 35°S to the Arctic."""
    H = grid.H
    lat = np.asarray(grid.lat_cc)[H:H + grid.Ny, H:H + grid.Nx]
    lon = ((np.asarray(grid.lon_cc)[H:H + grid.Ny, H:H + grid.Nx]
            + 180.0) % 360.0) - 180.0
    west = np.where(lat > 10.0, -98.0, np.where(lat > 0.0, -85.0, -70.0))
    east = np.where(lat > 65.0, 60.0, np.where(lat > 35.0, 0.0, 20.0))
    mask = (lat > -35.0) & (lon > west) & (lon < east)
    wet = np.asarray(grid.wet_c[-1])[H:H + grid.Ny, H:H + grid.Nx] > 0
    return (mask & wet).astype(np.float32)


@CaseCache.loader("amoc")
def _load_amoc(c):
    """Atlantic meridional overturning streamfunction ψ(y, z) [Sv] from
    saved vvol (reference `cache.jl:1195-1211`:
    ψ = −cumsum_z Σ_atlantic vvol)."""
    f = c.get("fields")
    vvol = f["vvol"]                    # (time, Nz, Ny, Nx)
    if c.grid is not None:
        basin = atlantic_ocean_basin(c.grid)[None, None]
        zonal = (vvol * basin).sum(axis=-1)
    else:
        zonal = vvol.sum(axis=-1)
    psi = -np.cumsum(zonal[:, ::-1, :], axis=1)[:, ::-1, :] / SVERDRUP
    return {"psi": psi.mean(axis=0), "psi_series": psi.max(axis=(1, 2))}


@CaseCache.loader("ice")
def _load_ice(c):
    """Ice extent (area where ℵ > 0.15), area, and volume per hemisphere
    (reference `common.jl:718-788`)."""
    s = c.get("surface")
    if "siconc" not in s:
        return {"extent_nh": np.zeros(s["time"].shape)}
    conc = s["siconc"]
    thick = s["sithick"]
    grid = c.grid
    H = grid.H
    az = np.asarray(grid.az_cc)[H:H + grid.Ny, H:H + grid.Nx]
    lat = np.asarray(grid.lat_cc)[H:H + grid.Ny, H:H + grid.Nx]
    out = {"time": s["time"]}
    for hemi, mask in (("nh", lat > 0), ("sh", lat < 0)):
        m = mask[None]
        out[f"extent_{hemi}"] = ((conc > 0.15) * m * az[None]).sum((1, 2)) / 1e12
        out[f"area_{hemi}"] = (conc * m * az[None]).sum((1, 2)) / 1e12
        out[f"volume_{hemi}"] = (thick * m * az[None]).sum((1, 2)) / 1e12
    return out


@CaseCache.loader("mld")
def _load_mld(c):
    s = c.get("surface")
    return {"time": s["time"], "mld_max": s["mlotst"].max(axis=(1, 2)),
            "mld_mean": s["mlotst"].mean(axis=(1, 2))}
