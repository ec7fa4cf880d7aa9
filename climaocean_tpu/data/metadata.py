"""Dataset metadata addressing + field ingestion.

TPU-native rebuild of NumericalEarth's DataWrangling surface (reference:
SURVEY.md §2b "DataWrangling" row; ingestion call stack §3.3):
`Metadatum(:temperature; date, dataset, dir)` addressing, `set!(model;
T=metadata)` ingestion (download → read → convert → regrid → device), and
the named-dataset registry (ECCO2Daily, ECCO4Monthly, EN4Monthly, GLORYS,
WOAAnnual, WOAMonthly, ETOPO, ORCA1).

Zero-egress environment: every dataset resolves to (1) a local file under
``dir`` if present (``.npz`` with arrays ``data``, ``z_faces``, ``lat_f``,
``lon_f``; NetCDF3 via scipy if available), else (2) the analytic
climatological proxy (`data.synthetic`). The download-with-fallback shape
of the reference (`download_with_fallback.jl`) becomes
file-or-synthetic-fallback here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from . import synthetic
from .regrid import fill_ocean_missing


# --------------------------------------------------------------------------
# dataset registry
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Dataset:
    name: str
    cadence: str = "monthly"            # "daily" | "monthly" | "annual" | "static"
    resolution: float = 1.0             # degrees, for the synthetic native grid

    def __repr__(self):
        return self.name


ECCO2Daily = lambda: Dataset("ECCO2Daily", "daily", 0.25)
ECCO4Monthly = lambda: Dataset("ECCO4Monthly", "monthly", 0.5)
EN4Monthly = lambda: Dataset("EN4Monthly", "monthly", 1.0)
GLORYS = lambda: Dataset("GLORYS", "daily", 1.0 / 12.0)
WOAAnnual = lambda: Dataset("WOAAnnual", "annual", 0.25)
WOAMonthly = lambda: Dataset("WOAMonthly", "monthly", 0.25)
ETOPO = lambda: Dataset("ETOPO", "static", 1.0 / 60.0)
ORCA1 = lambda: Dataset("ORCA1", "static", 1.0)

_SYNTH_VARS = {
    "temperature": synthetic.synthetic_temperature,
    "salinity": synthetic.synthetic_salinity,
    "sea_ice_thickness": synthetic.synthetic_sea_ice_thickness,
    "sea_ice_concentration": synthetic.synthetic_sea_ice_concentration,
}


@dataclass(frozen=True)
class Metadatum:
    """A (variable, date, dataset, dir) address — reference `Metadatum`."""
    name: str
    date: object = None
    dataset: Dataset = None
    dir: str = "."

    def path(self) -> str:
        """Local cache path (reference `metadata_path`)."""
        d = self.dataset.name if self.dataset else "synthetic"
        date = "" if self.date is None else f"_{self.date}"
        return os.path.join(self.dir, f"{d}_{self.name}{date}.npz")


@dataclass(frozen=True)
class Metadata:
    """A date-range of `Metadatum`s (reference `Metadata`)."""
    name: str
    dates: tuple = ()
    dataset: Dataset = None
    dir: str = "."

    def __len__(self):
        return max(1, len(self.dates))

    def __iter__(self):
        for d in self.dates:
            yield Metadatum(self.name, d, self.dataset, self.dir)


def _native_grid(meta, z_levels=33, depth=6000.0):
    res = meta.dataset.resolution if meta.dataset else 1.0
    res = max(res, 0.5)                  # synthetic fields are smooth; cap cost
    nlat = int(round(180 / res))
    nlon = int(round(360 / res))
    lat_f = np.linspace(-90, 90, nlat + 1)
    lon_f = np.linspace(-180, 180, nlon + 1)
    # ascending faces (bottom -> surface), quadratically refined near surface
    z_f = -(np.linspace(np.sqrt(depth), 0.0, z_levels + 1) ** 2)
    z_f[-1] = 0.0
    return z_f, lat_f, lon_f


def _month_of(date) -> float | None:
    if date is None:
        return None
    if isinstance(date, (int, float)):
        return float(date) % 12.0
    for attr in ("month",):
        if hasattr(date, attr):
            return float(getattr(date, attr))
    return None


def _catalog_netcdf(meta: Metadatum):
    """Local path of the dataset's canonical file for this metadatum,
    when the catalog knows the convention and the file exists (reference
    `metadata_path` — each dataset has a filename convention)."""
    from .catalog import catalog_entry
    entry = catalog_entry(meta.dataset.name) if meta.dataset else None
    if entry is None:
        return None
    try:
        fname = entry.filename(meta.name, meta.date)
    except KeyError:
        return None
    for cand in (os.path.join(meta.dir, fname),
                 os.path.join(meta.dir, os.path.basename(fname))):
        if os.path.exists(cand):
            return cand
    return None


def _convert_teos10(meta: Metadatum, data, z_f, lat_f, lon_f):
    """Apply practical/pre-TEOS → TEOS-10 conversion at ingestion when the
    dataset's catalog entry requires it. Two pipelines, keyed on the
    entry's ``convention`` (see `data.catalog`):

    - ``insitu_practical`` (WOA t_an + s_an): the full reference pipeline
      (`omip_simulation.jl:408-417`) — in-situ T → potential T via the
      Fofonoff lapse-rate integration → Conservative Temperature.
    - ``potential_practical`` (ECCO THETA, EN4, GLORYS thetao): the file
      already stores POTENTIAL temperature, so the lapse-rate step is
      skipped and `ct_from_pt` applies directly (running the in-situ
      pipeline would remove the adiabatic correction twice)."""
    from .catalog import catalog_entry, needs_teos10_conversion
    from ..physics import teos10_conversions as conv

    if meta.dataset is None or \
            not needs_teos10_conversion(meta.dataset.name, meta.name):
        return data
    entry = catalog_entry(meta.dataset.name)
    if meta.name == "salinity":
        return conv.sa_from_sp(data)
    # temperature: needs the companion salinity on the same native grid
    # (constant 35 PSS when the dataset's salinity file is absent — the
    # pressure/salinity sensitivity of the conversion is weak)
    T = np.asarray(data, np.float64)
    if entry.temperature_kelvin:
        T = T - 273.15
    try:
        smeta = Metadatum("salinity", meta.date, meta.dataset, meta.dir)
        SP, sz_f, *_ = _load_native_raw(smeta)
        if SP.shape != T.shape:
            raise ValueError("salinity companion shape mismatch")
    except Exception:
        SP = np.full_like(T, 35.0)
    if entry.convention == "potential_practical":
        pt = T                                   # already potential
    else:
        z_c = 0.5 * (np.asarray(z_f[:-1]) + np.asarray(z_f[1:]))
        p = conv.pressure_from_depth(z_c)[:, None, None]
        pt = conv.potential_temperature(SP, T, p, 0.0)
    return conv.ct_from_pt(conv.sa_from_sp(SP), pt)


def _load_native_raw(meta: Metadatum):
    """`load_native` without the TEOS-10 conversion step."""
    p = meta.path()
    if os.path.exists(p):
        with np.load(p) as f:
            return (np.asarray(f["data"], np.float64), f["z_faces"],
                    f["lat_f"], f["lon_f"])
    from .netcdf import find_netcdf, load_field
    nc_path = _catalog_netcdf(meta) or find_netcdf(meta.dir, meta.name)
    if nc_path is not None:
        month = _month_of(meta.date)
        t_index = 0 if month is None else int(month) - 1
        return load_field(nc_path, meta.name, time_index=t_index)
    if meta.name not in _SYNTH_VARS:
        raise KeyError(f"no local file at {p} and no synthetic proxy for "
                       f"'{meta.name}'")
    return None


def _synthetic_native(meta: Metadatum):
    z_f, lat_f, lon_f = _native_grid(meta)
    lat_c = 0.5 * (lat_f[:-1] + lat_f[1:])
    lon_c = 0.5 * (lon_f[:-1] + lon_f[1:])
    z_c = 0.5 * (z_f[:-1] + z_f[1:])
    LON, LAT = np.meshgrid(lon_c, lat_c)
    fn = _SYNTH_VARS[meta.name]
    month = _month_of(meta.date)
    if meta.name.startswith("sea_ice"):
        data = fn(LON, LAT, month if month is not None else 6)[None]
        z_f = np.array([-1.0, 0.0])
    else:
        data = fn(LON[None], LAT[None], z_c[:, None, None], month=month)
    return np.asarray(data, np.float64), z_f, lat_f, lon_f


def _strict_data() -> bool:
    return os.environ.get("CLIMAOCEAN_STRICT_DATA", "") not in ("", "0")


def load_native(meta: Metadatum, strict=None):
    """Return (data[nz, nlat, nlon], z_f, lat_f, lon_f) on the dataset's
    native grid: local file if present (.npz, the catalog's canonical
    NetCDF filename, or any NetCDF in ``dir`` holding the variable —
    reference `metadata_path` + NCDatasets read, SURVEY.md §3.3), else the
    analytic proxy. File-backed in-situ/practical T/S (WOA, EN4, …) are
    converted to TEOS-10 Θ/S_A here (`omip_simulation.jl:408-417`); the
    synthetic proxies already emit TEOS-10 conventions.

    Falling back to the synthetic proxy is LOUD (one warning per address):
    a production run with a mistyped ``dir`` must not silently initialize
    from analytic fields. ``strict=True`` (or CLIMAOCEAN_STRICT_DATA=1)
    raises instead."""
    loaded = _load_native_raw(meta)
    if loaded is None:
        if strict is None:
            strict = _strict_data()
        if strict:
            raise FileNotFoundError(
                f"no local file for {meta.dataset}:{meta.name} under "
                f"'{meta.dir}' (looked for {meta.path()} and catalog/NetCDF "
                f"matches) and strict data mode is on")
        import warnings
        warnings.warn(
            f"dataset {meta.dataset}:{meta.name} not found under "
            f"'{meta.dir}' — falling back to the SYNTHETIC analytic proxy "
            f"(set CLIMAOCEAN_STRICT_DATA=1 to make this an error)",
            stacklevel=2)
        return _synthetic_native(meta)
    data, z_f, lat_f, lon_f = loaded
    if not os.path.exists(meta.path()):      # .npz caches are pre-converted
        data = _convert_teos10(meta, data, z_f, lat_f, lon_f)
    return data, z_f, lat_f, lon_f


def regrid_to_grid(meta: Metadatum, grid, surface=False):
    """Ingest a metadatum onto a model grid (interior numpy array): z pass
    conservative (reference z→y→x pipeline), horizontal pass through the
    curvilinear-aware `HorizontalRegridPlan` (conservative on constant-
    latitude rows, bilinear at true cell centers on the tripolar cap —
    `InitialConditions.jl:33-68` intent)."""
    from .regrid import HorizontalRegridPlan, conservative_regrid_1d

    data, z_f, lat_f, lon_f = load_native(meta)
    data = fill_ocean_missing(data, None, passes=3)
    plan = HorizontalRegridPlan(grid, lat_f, lon_f)

    if surface:
        return plan.apply(data[-1])
    zdata = conservative_regrid_1d(z_f, np.asarray(grid.z_f), data, axis=0)
    return np.stack([plan.apply(zdata[k]) for k in range(zdata.shape[0])])


def set_fields(state, grid, **assignments):
    """Reference `set!(model; T=Metadatum(...), S=..., h=np.ndarray)`:
    ingest each assignment onto the grid and write the padded device array
    into the state dict. Returns the updated state."""
    import jax.numpy as jnp

    H = grid.H
    out = dict(state)
    for key, src in assignments.items():
        surface = key in ("eta", "thickness", "concentration", "snow", "Ts", "h", "a")
        if isinstance(src, (Metadatum, Metadata)):
            meta = next(iter(src)) if isinstance(src, Metadata) else src
            interior = regrid_to_grid(meta, grid, surface=surface)
        else:
            interior = np.asarray(src)
        if surface:
            padded = np.zeros((grid.Nyp, grid.Nxp), np.float32)
            padded[H:H + grid.Ny, H:H + grid.Nx] = interior
        else:
            padded = np.zeros((grid.Nz, grid.Nyp, grid.Nxp), np.float32)
            padded[:, H:H + grid.Ny, H:H + grid.Nx] = interior
        name = {"h": "thickness", "a": "concentration"}.get(key, key)
        out[name] = jnp.asarray(padded)
    return out
