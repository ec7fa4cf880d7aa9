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
    """Atlantic(+Arctic) basin mask at centers, interior (Ny, Nx) —
    reference `atlantic_ocean_basin(grid)` (`visualize/cache.jl:1178`).

    Flood fill of the wet mask from mid-Atlantic seed points (connected-
    component labeling, periodic-x aware), with geographic barriers where
    the real ocean connects basins: the Southern Ocean cut at 31°S, the Bering Strait, and the Indonesian
    throughflow — so Pacific water cannot leak into the AMOC integral the
    way the round-1 box polygon allowed."""
    from scipy import ndimage

    H = grid.H
    lat = np.asarray(grid.lat_cc)[H:H + grid.Ny, H:H + grid.Nx]
    lon = ((np.asarray(grid.lon_cc)[H:H + grid.Ny, H:H + grid.Nx]
            + 180.0) % 360.0) - 180.0
    wet = np.asarray(grid.wet_c[-1])[H:H + grid.Ny, H:H + grid.Nx] > 0

    barrier = lat <= -31.0       # Southern Ocean cut (north of the African
    #                               tip so coarse/idealized coastlines cannot
    #                               open an Atlantic->Indian channel)
    # Pacific-Arctic sector: on the real Earth everything poleward of 63°N
    # outside the Atlantic sector (Greenland/Norwegian seas + Canadian
    # archipelago approaches, ~100°W..60°E) is Siberia/Alaska land except
    # the Bering Strait, so blocking the sector severs Pacific<->Arctic
    # while keeping the GIN-seas Atlantic-Arctic connection open
    barrier |= (lat > 63.0) & ((lon > 60.0) | (lon < -100.0))
    barrier |= (lat > -12.0) & (lat < 8.0) & \
        (lon > 95.0) & (lon < 135.0)                              # ITF passages
    allowed = wet & ~barrier

    labels, _ = ndimage.label(allowed)
    # merge components split by the periodic-x seam
    left, right = labels[:, 0], labels[:, -1]
    join = {}
    for a, b in zip(left, right):
        if a and b and a != b:
            ra, rb = join.get(a, a), join.get(b, b)
            if ra != rb:
                join[max(ra, rb)] = min(ra, rb)
    if join:
        flat = labels.copy()
        for a in sorted(join, reverse=True):
            flat[flat == a] = join[a]
        labels = flat

    seeds = [(-30.0, 0.0), (-40.0, 30.0), (-25.0, -20.0), (-45.0, 45.0),
             (-30.0, 60.0)]
    seed_labels = set()
    for slon, slat in seeds:
        d2 = (lat - slat) ** 2 + (np.minimum(np.abs(lon - slon),
                                             360 - np.abs(lon - slon))) ** 2
        d2 = np.where(allowed, d2, np.inf)
        j, i = np.unravel_index(np.argmin(d2), d2.shape)
        if allowed[j, i] and d2[j, i] < 15.0 ** 2:
            seed_labels.add(labels[j, i])
    seed_labels.discard(0)
    if not seed_labels:        # no Atlantic water resolved (tiny test grids)
        return (wet & (lat > -31.0) & (lon > -98.0) & (lon < 20.0)
                ).astype(np.float32)
    mask = np.isin(labels, sorted(seed_labels))
    return (mask & wet).astype(np.float32)


@CaseCache.loader("amoc")
def _load_amoc(c):
    """Atlantic meridional overturning streamfunction ψ(y, z) [Sv] from
    saved vvol (reference `cache.jl:1195-1211`:
    ψ = −cumsum_z Σ_atlantic vvol), plus the RAPID-comparable 26.5°N
    maximum-overturning time series (reference baseline `common.jl`:
    RAPID)."""
    f = c.get("fields")
    vvol = f["vvol"]                    # (time, Nz, Ny, Nx)
    out = {}
    if c.grid is not None:
        basin = atlantic_ocean_basin(c.grid)[None, None]
        zonal = (vvol * basin).sum(axis=-1)
        H = c.grid.H
        lat2 = np.asarray(c.grid.lat_cc)[H:H + c.grid.Ny, H:H + c.grid.Nx]
        nb = basin[0, 0].sum(axis=-1)
        # rows with no Atlantic water fall back to the plain row mean so
        # the latitude axis stays monotone for plotting
        row_lat = np.where(nb > 0,
                           (lat2 * basin[0, 0]).sum(axis=-1) / np.maximum(nb, 1.0),
                           lat2.mean(axis=-1))
        out["lat"] = row_lat
    else:
        zonal = vvol.sum(axis=-1)
    psi = -np.cumsum(zonal[:, ::-1, :], axis=1)[:, ::-1, :] / SVERDRUP
    out.update({"psi": psi.mean(axis=0), "psi_series": psi.max(axis=(1, 2)),
                "time": f["time"]})
    if "lat" in out and np.isfinite(out["lat"]).any():
        j265 = int(np.nanargmin(np.abs(out["lat"] - 26.5)))
        out["amoc_26n"] = psi[:, :, j265].max(axis=1)
    return out


@CaseCache.loader("straits")
def _load_straits(c):
    """Strait-transport time series [Sv] from saved 3-D u/v output
    (reference offline `strait_transports`, `strait_transports.jl:87-108`).

    Streams the 3-D u/v snapshots through the lazy `FieldTimeSeries`
    reader (reference `FieldTimeSeries(...; backend)` usage at
    `strait_transports.jl:62-64`) so multi-year series never hold the
    whole 4-D stack in memory."""
    from .field_time_series import FieldTimeSeries, InMemory
    from .strait_transports import strait_sections, section_volume_flux

    u = FieldTimeSeries(c.dir, c.prefix + "_fields", "u", InMemory(4))
    v = FieldTimeSeries(c.dir, c.prefix + "_fields", "v", InMemory(4))
    secs = strait_sections(c.grid)
    out = {"time": u.times}
    series = {name: [] for name in secs}
    for t in range(len(u)):
        ut, vt = u[t], v[t]
        for name, sec in secs.items():
            series[name].append(section_volume_flux(sec, c.grid, u=ut, v=vt))
    for name in secs:
        out[name] = np.array(series[name])
    return out


def _bias(c, cmor, varname):
    """Time-mean surface field minus the ingested climatology (reference
    SST/SSS bias products, `visualize/cache.jl` :sst_bias ← :sst −
    :woa_temperature)."""
    from ..data.metadata import Metadatum, WOAAnnual, regrid_to_grid

    s = c.get("surface")
    mean = s[cmor].mean(axis=0)
    clim_dir = getattr(c, "clim_dir", None) or os.path.join(c.dir, "clim")
    meta = Metadatum(varname, dataset=WOAAnnual(), dir=clim_dir)
    clim = regrid_to_grid(meta, c.grid, surface=True)
    wet = np.asarray(c.grid.wet_c[-1])[c.grid.H:c.grid.H + c.grid.Ny,
                                       c.grid.H:c.grid.H + c.grid.Nx] > 0
    bias = np.where(wet, mean - clim, np.nan)
    rms = float(np.sqrt(np.nanmean(bias[wet] ** 2)))
    return {"bias": bias, "mean": mean, "clim": clim, "rms": np.float64(rms)}


@CaseCache.loader("sst_bias")
def _load_sst_bias(c):
    return _bias(c, "tos", "temperature")


@CaseCache.loader("sss_bias")
def _load_sss_bias(c):
    return _bias(c, "sos", "salinity")


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


# --------------------------------------------------------------------------
# surface maps: SSH, wind stress, net fluxes, currents
# (reference fig03/fig07/fig08/fig09/fig24)
# --------------------------------------------------------------------------

RHO_OCEAN = 1020.0
CP_OCEAN = 3991.0
SECONDS_PER_YEAR = 365.0 * 86400.0


def _interior_wet(grid):
    H = grid.H
    return np.asarray(grid.wet_c[-1])[H:H + grid.Ny, H:H + grid.Nx] > 0


@CaseCache.loader("ssh")
def _load_ssh(c):
    """Time-mean SSH and SSH RMS variability (reference fig03_ssh +
    fig09_ssh_variance: "Time-mean SSH", "SSH RMS", "SSH - ECCO ...,
    demeaned"). Variance comes from the averaged zossq second moment:
    var = <zos²> − <zos>²."""
    s = c.get("surface")
    mean = s["zos"].mean(axis=0)
    var = np.maximum(s["zossq"].mean(axis=0) - mean ** 2, 0.0)
    out = {"mean": mean, "rms": np.sqrt(var)}
    obs = load_observation(c, "ecco_ssh")
    if obs is not None and obs["ssh"].shape == mean.shape:
        wet = _interior_wet(c.grid) if c.grid is not None else \
            np.isfinite(obs["ssh"])
        d = (mean - mean[wet].mean()) - (obs["ssh"] - obs["ssh"][wet].mean())
        out["vs_ecco"] = np.where(wet, d, np.nan)
    return out


@CaseCache.loader("wind_stress")
def _load_wind_stress(c):
    """Time-mean surface stress maps + zonal means (reference
    fig08_wind_stress: "Zonal/Meridional wind stress", "τx − NCEP").
    Writer units are kinematic (m²/s²); scaled by ρ₀ to N/m²."""
    s = c.get("surface")
    taux = RHO_OCEAN * s["tauuo"].mean(axis=0)
    tauy = RHO_OCEAN * s["tauvo"].mean(axis=0)
    wet = _interior_wet(c.grid) if c.grid is not None else \
        np.ones(taux.shape, bool)
    nwet = np.maximum(wet.sum(axis=-1), 1)
    out = {"taux": taux, "tauy": tauy,
           "taux_zonal": (taux * wet).sum(axis=-1) / nwet,
           "tauy_zonal": (tauy * wet).sum(axis=-1) / nwet}
    if c.grid is not None:
        H = c.grid.H
        lat = np.asarray(c.grid.lat_cc)[H:H + c.grid.Ny, H:H + c.grid.Nx]
        out["lat"] = (lat * wet).sum(axis=-1) / nwet
    obs = load_observation(c, "ncep_stress")
    if obs is not None and obs["taux"].shape == taux.shape:
        out["taux_vs_ncep"] = np.where(wet, taux - obs["taux"], np.nan)
        out["tauy_vs_ncep"] = np.where(wet, tauy - obs["tauy"], np.nan)
    return out


@CaseCache.loader("fluxes")
def _load_fluxes(c):
    """Time-mean net surface heat [W/m²] and freshwater [m/yr] flux maps
    (reference fig07_surface_fluxes: "Net heat flux", "Net freshwater
    flux"). hfds is stored as a kinematic temperature flux (K·m/s) and wfo
    as a salinity flux SSS·fw (g/kg·m/s); converted here."""
    s = c.get("surface")
    heat = RHO_OCEAN * CP_OCEAN * s["hfds"].mean(axis=0)
    sos = np.maximum(s["sos"].mean(axis=0), 1.0)
    fresh = s["wfo"].mean(axis=0) / sos * SECONDS_PER_YEAR   # m/yr
    wet = _interior_wet(c.grid) if c.grid is not None else \
        np.isfinite(heat)
    return {"heat": np.where(wet, heat, np.nan),
            "fresh": np.where(wet, fresh, np.nan)}


@CaseCache.loader("currents")
def _load_currents(c):
    """Time-mean near-surface current speed (reference
    fig24_near_surface_currents: "Near-surface current speed")."""
    s = c.get("surface")
    speed = np.sqrt(s["uos"] ** 2 + s["vos"] ** 2).mean(axis=0)
    wet = _interior_wet(c.grid) if c.grid is not None else \
        np.isfinite(speed)
    return {"speed": np.where(wet, speed, np.nan),
            "u": s["uos"].mean(axis=0), "v": s["vos"].mean(axis=0)}


# --------------------------------------------------------------------------
# interior structure: profiles, drift, zonal means, EUC
# (reference fig16/fig17/fig18/fig19/fig21/fig25)
# --------------------------------------------------------------------------

@CaseCache.loader("profiles")
def _load_profiles(c):
    """Volume-weighted horizontal-mean T(z,t), S(z,t) — the basis of the
    reference's drift series ("Global-mean temperature drift"), mean
    profiles ("Horizontal-mean temperature") and T/S drift heatmaps
    (fig16/fig17/fig21). Streams 3-D parts through the lazy reader."""
    from .field_time_series import FieldTimeSeries, InMemory

    grid = c.grid
    H = grid.H
    az = np.asarray(grid.az_cc)[H:H + grid.Ny, H:H + grid.Nx]
    wet = np.asarray(grid.wet_c)[:, H:H + grid.Ny, H:H + grid.Nx]
    w2 = az[None] * wet                                   # (Nz, Ny, Nx)
    denom = np.maximum(w2.sum(axis=(1, 2)), 1e-30)        # (Nz,)

    out = {"z": np.asarray(grid.z_c)}
    for var in ("T", "S"):
        fts = FieldTimeSeries(c.dir, c.prefix + "_fields", var, InMemory(2))
        prof = np.stack([(fts[t] * w2).sum(axis=(1, 2)) / denom
                         for t in range(len(fts))])
        out[var] = prof
        out["time"] = fts.times
    return out


@CaseCache.loader("zonal_mean")
def _load_zonal_mean(c):
    """Time-mean zonal-mean T(z,y), S(z,y) (+ differences vs the WOA
    climatology when ingestable) and zonal-mean MLD — reference
    fig18_zonal_mean ("Zonal T/S − WOA"), fig20_mld_zonal_mean."""
    from .field_time_series import FieldTimeSeries, InMemory

    grid = c.grid
    H = grid.H
    wet = np.asarray(grid.wet_c)[:, H:H + grid.Ny, H:H + grid.Nx]
    nwet = np.maximum(wet.sum(axis=-1), 1.0)              # (Nz, Ny)
    lat = np.asarray(grid.lat_cc)[H:H + grid.Ny, H:H + grid.Nx]
    wet2 = wet[-1] > 0
    nwet2 = wet2.sum(axis=-1)
    # dry rows fall back to the plain row mean so the axis stays monotone
    row_lat = np.where(nwet2 > 0,
                       (lat * wet2).sum(axis=-1) / np.maximum(nwet2, 1),
                       lat.mean(axis=-1))
    out = {"z": np.asarray(grid.z_c), "lat": row_lat}
    for var in ("T", "S"):
        fts = FieldTimeSeries(c.dir, c.prefix + "_fields", var, InMemory(2))
        acc = None
        for t in range(len(fts)):
            zm = (fts[t] * wet).sum(axis=-1) / nwet
            acc = zm if acc is None else acc + zm
        out[var] = acc / max(len(fts), 1)
    s = c.get("surface")
    if "mlotst" in s:
        mld = s["mlotst"].mean(axis=0)
        out["mld_zonal"] = (mld * wet2).sum(axis=-1) / \
            np.maximum(wet2.sum(axis=-1), 1)
    # zonal buoyancy drift b_end − b_start (reference fig19_zonal_drift's
    # third panel, `zonal_buoyancy_drift`): buoyancy from TEOS-10 at the
    # first and last saved 3-D snapshots, zonally averaged
    try:
        from .field_time_series import FieldTimeSeries, InMemory
        from ..physics import eos as eos_mod

        ftsT = FieldTimeSeries(c.dir, c.prefix + "_fields", "T", InMemory(2))
        ftsS = FieldTimeSeries(c.dir, c.prefix + "_fields", "S", InMemory(2))
        if len(ftsT) >= 2:
            z3 = np.asarray(grid.z_c)[:, None, None]

            def buoy(T, S):
                import jax.numpy as jnp
                return np.asarray(eos_mod.buoyancy(
                    jnp.asarray(S), jnp.asarray(T),
                    jnp.asarray(np.broadcast_to(z3, T.shape))))

            db = buoy(ftsT[len(ftsT) - 1], ftsS[len(ftsS) - 1]) \
                - buoy(ftsT[0], ftsS[0])
            out["b_drift"] = (db * wet).sum(axis=-1) / nwet
    except Exception:
        pass                                  # EOS variant w/o anomaly: skip
    try:
        from ..data.metadata import Metadatum, WOAAnnual, regrid_to_grid
        clim_dir = getattr(c, "clim_dir", None) or os.path.join(c.dir, "clim")
        for var, name in (("T", "temperature"), ("S", "salinity")):
            clim = regrid_to_grid(Metadatum(name, dataset=WOAAnnual(),
                                            dir=clim_dir), grid)
            zm = (clim * wet).sum(axis=-1) / nwet
            out[f"{var}_vs_woa"] = out[var] - zm
    except Exception:
        pass                                  # no climatology staged: skip
    return out


@CaseCache.loader("euc")
def _load_euc(c):
    """Time-mean zonal current on the equatorial section u(z, lon) —
    reference fig25_equatorial_undercurrent ("Zonal current (uE)")."""
    from .field_time_series import FieldTimeSeries, InMemory

    grid = c.grid
    H = grid.H
    lat = np.asarray(grid.lat_cc)[H:H + grid.Ny, H:H + grid.Nx]
    j_eq = int(np.argmin(np.abs(np.nanmean(lat, axis=-1))))
    fts = FieldTimeSeries(c.dir, c.prefix + "_fields", "u", InMemory(2))
    acc = None
    for t in range(len(fts)):
        sec = fts[t][:, j_eq, :]
        acc = sec if acc is None else acc + sec
    lon = np.asarray(grid.lon_cc)[H:H + grid.Ny, H:H + grid.Nx][j_eq]
    wet = np.asarray(grid.wet_u)[:, H:H + grid.Ny, H:H + grid.Nx][:, j_eq]
    return {"u": np.where(wet > 0, acc / max(len(fts), 1), np.nan),
            "lon": lon, "z": np.asarray(grid.z_c),
            "lat_section": float(np.nanmean(lat[j_eq]))}


# --------------------------------------------------------------------------
# seasonal products: monthly climatologies, seasonal maps
# (reference fig04/fig05/fig06/fig10-14)
# --------------------------------------------------------------------------

def month_of(times, epoch_seconds=0.0):
    """Month index 0..11 on the 365-day simulation calendar (runs start
    Jan 1 of a repeat year unless the case sets ``epoch_seconds``)."""
    t = (np.asarray(times) + epoch_seconds) % SECONDS_PER_YEAR
    return np.minimum((t / SECONDS_PER_YEAR * 12).astype(int), 11)


@CaseCache.loader("ice_clim")
def _load_ice_clim(c):
    """Monthly climatology of sea-ice extent/area/volume per hemisphere
    (reference fig10_sie/fig11_sia/fig12_arctic_volume: "Arctic SIE
    Climatology" etc.), with NSIDC/PIOMAS overlays when observation files
    are staged."""
    ice = c.get("ice")
    if "area_nh" not in ice:
        return {"months": np.arange(12)}
    mon = month_of(ice["time"], getattr(c, "epoch_seconds", 0.0))
    out = {"months": np.arange(12)}
    for key in ("extent_nh", "extent_sh", "area_nh", "area_sh",
                "volume_nh", "volume_sh"):
        clim = np.full(12, np.nan)
        for m in range(12):
            sel = mon == m
            if sel.any():
                clim[m] = ice[key][sel].mean()
        out[key] = clim
    for name in ("nsidc_extent", "piomas_volume"):
        obs = load_observation(c, name)
        if obs is not None:
            for k, v in obs.items():
                out[f"{name}_{k}"] = v
    return out


@CaseCache.loader("siconc_maps")
def _load_siconc_maps(c):
    """March/September mean sea-ice concentration maps (reference
    fig05_seaice_conc seasonal panels; fig06 bias when obs are staged)."""
    s = c.get("surface")
    if "siconc" not in s:
        return {"available": np.array(0)}
    mon = month_of(s["time"], getattr(c, "epoch_seconds", 0.0))
    out = {"available": np.array(1)}
    for name, m in (("march", 2), ("september", 8)):
        sel = mon == m
        out[name] = s["siconc"][sel].mean(axis=0) if sel.any() else \
            s["siconc"].mean(axis=0)
        obs = load_observation(c, f"siconc_{name}")
        if obs is not None and obs["siconc"].shape == out[name].shape:
            out[f"{name}_bias"] = out[name] - obs["siconc"]
    return out


@CaseCache.loader("mld_seasonal")
def _load_mld_seasonal(c):
    """Winter-max and summer-min MLD maps (reference fig04_mld: "Max MLD
    (winter)", "Min MLD (summer)") from monthly-binned snapshots."""
    s = c.get("surface")
    mon = month_of(s["time"], getattr(c, "epoch_seconds", 0.0))
    mld = s["mlotst"]
    monthly = []
    for m in range(12):
        sel = mon == m
        monthly.append(mld[sel].mean(axis=0) if sel.any() else
                       np.full(mld.shape[1:], np.nan))
    monthly = np.stack(monthly)
    with np.errstate(all="ignore"):
        out = {"winter_max": np.nanmax(monthly, axis=0),
               "summer_min": np.nanmin(monthly, axis=0)}
    # zonal-mean seasonal curves (reference fig20_mld_zonal_mean:
    # "Zonal-mean MLD (summer minimum / winter maximum)")
    if c.grid is not None:
        H = c.grid.H
        wet2 = np.asarray(c.grid.wet_c[-1])[H:H + c.grid.Ny,
                                            H:H + c.grid.Nx] > 0
        lat = np.asarray(c.grid.lat_cc)[H:H + c.grid.Ny, H:H + c.grid.Nx]
        n2 = np.maximum(wet2.sum(axis=-1), 1)
        out["lat"] = np.where(wet2.sum(axis=-1) > 0,
                              (lat * wet2).sum(axis=-1) / n2,
                              lat.mean(axis=-1))
        for key in ("winter_max", "summer_min"):
            v = np.where(np.isfinite(out[key]), out[key], 0.0)
            out[f"{key}_zonal"] = (v * wet2).sum(axis=-1) / n2
    obs = load_observation(c, "dbm_mld")
    if obs is not None and obs["mld"].shape == out["winter_max"].shape:
        out["winter_vs_obs"] = out["winter_max"] - obs["mld"]
    return out


@CaseCache.loader("amoc_rapid")
def _load_amoc_rapid(c):
    """AMOC vertical profile ψ(z) at 26.5°N + the index series, with the
    RAPID array overlay when staged (reference fig26_amoc_rapid: "AMOC
    index at 26.5°N", "AMOC ψ(z) at 26.5°N" vs RAPID)."""
    amoc = c.get("amoc")
    out = {"time": amoc["time"]}
    if "amoc_26n" in amoc:
        out["index"] = amoc["amoc_26n"]
        lat = amoc["lat"]
        j265 = int(np.nanargmin(np.abs(lat - 26.5)))
        out["psi_z"] = amoc["psi"][:, j265]
        if c.grid is not None:
            out["z"] = np.asarray(c.grid.z_c)
    obs = load_observation(c, "rapid_moc")
    if obs is not None:
        out["rapid_time"] = obs["time"]
        out["rapid_moc"] = obs["moc"]
    return out


# --------------------------------------------------------------------------
# observational baselines (reference `common.jl:463-1059` downloads WOA,
# ECCO SSH, dBM MLD, NCEP stress, NSIDC, PIOMAS, HadISST, RAPID and caches
# them; zero-egress here, so baselines are read from staged ``.npz`` files
# — `<obs_dir>/<name>.npz` with documented keys — and every product
# degrades gracefully to model-only when a file is absent)
# --------------------------------------------------------------------------

OBSERVATION_KEYS = {
    "ecco_ssh": ("ssh",),            # (Ny, Nx) time-mean SSH [m]
    "ncep_stress": ("taux", "tauy"),  # (Ny, Nx) [N/m²]
    "nsidc_extent": ("extent_nh", "extent_sh"),   # (12,) [10⁶ km²]
    "piomas_volume": ("volume_nh",),  # (12,) [10³ km³]
    "rapid_moc": ("time", "moc"),    # series [s], [Sv]
    "dbm_mld": ("mld",),             # (Ny, Nx) winter-max MLD [m]
    "siconc_march": ("siconc",),     # (Ny, Nx) concentration
    "siconc_september": ("siconc",),
    "hadisst_sst": ("sst",),         # (Ny, Nx) [°C]
}


def load_observation(case, name):
    """Load one observational baseline for a case, or None. Search order:
    ``case.obs_dir``, ``$CLIMAOCEAN_OBS_DIR``, ``<outdir>/obs``."""
    dirs = [getattr(case, "obs_dir", None), os.environ.get("CLIMAOCEAN_OBS_DIR"),
            os.path.join(case.dir, "obs")]
    for d in dirs:
        if not d:
            continue
        path = os.path.join(d, f"{name}.npz")
        if os.path.exists(path):
            with np.load(path) as f:
                return {k: np.asarray(f[k]) for k in f.files}
    return None
