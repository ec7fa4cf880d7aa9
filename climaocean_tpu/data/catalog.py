"""Per-dataset filename / URL / variable-name catalogs.

TPU-native rebuild of NumericalEarth's DataWrangling dataset conventions
(reference capability row SURVEY.md §2b "DataWrangling"; ingestion call
stack §3.3 — `metadata_path` resolves a `Metadatum` to the dataset's
canonical local filename, `Downloads.download(metadata)` fetches it from
the dataset's primary server, and each dataset knows which NetCDF variable
holds each canonical field).

Each catalog entry records, per dataset:

- ``filename(variable, date)`` — the upstream file-naming convention,
- ``url(variable, date)`` — the primary download URL (overridable via the
  ``CLIMAOCEAN_<DATASET>_URL`` env var; the artifacts mirror of
  `data.download` remains the fallback either way),
- ``variables`` — canonical name → NetCDF variable name,
- ``convention`` — ``"teos10"`` when the file already stores Conservative
  Temperature / Absolute Salinity; ``"insitu_practical"`` when it stores
  genuinely in-situ temperature + practical salinity (WOA t_an/s_an) and
  needs the full in-situ → potential → Conservative pipeline at ingestion
  (reference `omip_simulation.jl:408-417` applies this to WOA only);
  ``"potential_practical"`` when it stores POTENTIAL temperature +
  practical salinity (ECCO THETA, EN4, GLORYS thetao) — the adiabatic
  lapse-rate correction is already removed upstream, so ingestion goes
  straight to `ct_from_pt` (running the in-situ pipeline on these would
  remove the correction twice, biasing deep temperatures ~0.1–0.5 °C).

Zero-egress environments exercise everything below with ``file://`` base
URLs and synthetic fixture NetCDFs (tests/test_catalog.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _date_parts(date):
    """(year, month, day) with defaults from an int/float/str/datetime-ish
    date as used by `Metadatum.date`."""
    if date is None:
        return 1993, 1, 1
    if isinstance(date, (int, float)):
        # bare month (1-12), a year (1000-9999), YYYYMM, or YYYYMMDD
        v = int(date)
        if v >= 10**7:
            return v // 10**4, (v // 100) % 100, v % 100
        if v >= 10**5:
            return v // 100, v % 100, 1
        return (v, 1, 1) if v >= 1000 else (1993, max(1, v % 13), 1)
    for attrs in (("year", "month", "day"),):
        if all(hasattr(date, a) for a in attrs[:2]):
            return (int(date.year), int(date.month),
                    int(getattr(date, "day", 1)))
    s = str(date).replace("-", "")
    if s.isdigit():
        y = int(s[:4])
        m = int(s[4:6]) if len(s) >= 6 else 1
        d = int(s[6:8]) if len(s) >= 8 else 1
        return y, m, d
    return 1993, 1, 1


@dataclass(frozen=True)
class CatalogEntry:
    """Upstream conventions for one named dataset."""
    dataset: str
    base_url: str
    filenames: dict            # canonical variable -> filename template
    variables: dict            # canonical variable -> NetCDF variable name
    convention: str = "teos10"     # or "insitu_practical"
    temperature_kelvin: bool = False

    def filename(self, variable, date=None):
        tpl = self.filenames.get(variable)
        if tpl is None:
            raise KeyError(f"{self.dataset} has no variable '{variable}'")
        y, m, d = _date_parts(date)
        return tpl.format(year=y, month=m, day=d)

    def url(self, variable, date=None):
        env = os.environ.get(f"CLIMAOCEAN_{self.dataset.upper()}_URL")
        base = (env or self.base_url).rstrip("/")
        return f"{base}/{self.filename(variable, date)}"

    def var_name(self, variable):
        return self.variables.get(variable, variable)


# ---------------------------------------------------------------------------
# The registry. Filename/URL conventions follow the upstream data servers
# the reference's DataWrangling targets (ECCO JPL drive, NOAA NCEI WOA23,
# Met Office EN4, CMEMS GLORYS, NCEI ETOPO 2022). In a zero-egress
# environment only the shapes matter — tests serve fixture files through
# ``file://`` overrides; production deployments point the env vars at a
# mirror.
# ---------------------------------------------------------------------------

CATALOG = {
    "ECCO4Monthly": CatalogEntry(
        dataset="ECCO4Monthly",
        base_url="https://ecco.jpl.nasa.gov/drive/files/Version4/Release4/"
                 "interp_monthly",
        filenames={
            "temperature": "THETA/{year:04d}/THETA_{year:04d}_{month:02d}.nc",
            "salinity": "SALT/{year:04d}/SALT_{year:04d}_{month:02d}.nc",
            "sea_ice_thickness":
                "SIheff/{year:04d}/SIheff_{year:04d}_{month:02d}.nc",
            "sea_ice_concentration":
                "SIarea/{year:04d}/SIarea_{year:04d}_{month:02d}.nc",
            "u_velocity": "EVEL/{year:04d}/EVEL_{year:04d}_{month:02d}.nc",
            "v_velocity": "NVEL/{year:04d}/NVEL_{year:04d}_{month:02d}.nc",
            "free_surface": "SSH/{year:04d}/SSH_{year:04d}_{month:02d}.nc",
        },
        variables={"temperature": "THETA", "salinity": "SALT",
                   "sea_ice_thickness": "SIheff",
                   "sea_ice_concentration": "SIarea",
                   "u_velocity": "EVEL", "v_velocity": "NVEL",
                   "free_surface": "SSH"},
        # ECCO v4 stores potential temperature / practical salinity
        convention="potential_practical"),
    "ECCO2Daily": CatalogEntry(
        dataset="ECCO2Daily",
        base_url="https://ecco.jpl.nasa.gov/drive/files/ECCO2/"
                 "cube92_latlon_quart_90S90N",
        filenames={
            "temperature":
                "THETA.nc/THETA.1440x720x50.{year:04d}{month:02d}{day:02d}.nc",
            "salinity":
                "SALT.nc/SALT.1440x720x50.{year:04d}{month:02d}{day:02d}.nc",
            "sea_ice_thickness":
                "SIheff.nc/SIheff.1440x720.{year:04d}{month:02d}{day:02d}.nc",
            "sea_ice_concentration":
                "SIarea.nc/SIarea.1440x720.{year:04d}{month:02d}{day:02d}.nc",
        },
        variables={"temperature": "THETA", "salinity": "SALT",
                   "sea_ice_thickness": "SIheff",
                   "sea_ice_concentration": "SIarea"},
        convention="potential_practical"),
    "EN4Monthly": CatalogEntry(
        dataset="EN4Monthly",
        base_url="https://www.metoffice.gov.uk/hadobs/en4/data/en4-2-2",
        filenames={
            "temperature":
                "EN.4.2.2.f.analysis.g10.{year:04d}{month:02d}.nc",
            "salinity":
                "EN.4.2.2.f.analysis.g10.{year:04d}{month:02d}.nc",
        },
        variables={"temperature": "temperature", "salinity": "salinity"},
        convention="potential_practical",
        temperature_kelvin=True),   # EN4 potential temperature is in K
    "WOAAnnual": CatalogEntry(
        dataset="WOAAnnual",
        base_url="https://www.ncei.noaa.gov/data/oceans/woa/WOA23/DATA",
        filenames={
            "temperature": "temperature/netcdf/decav/0.25/"
                           "woa23_decav_t00_04.nc",
            "salinity": "salinity/netcdf/decav/0.25/woa23_decav_s00_04.nc",
        },
        variables={"temperature": "t_an", "salinity": "s_an"},
        # WOA t_an is in-situ °C, s_an practical (omip_simulation.jl:411-413)
        convention="insitu_practical"),
    "WOAMonthly": CatalogEntry(
        dataset="WOAMonthly",
        base_url="https://www.ncei.noaa.gov/data/oceans/woa/WOA23/DATA",
        filenames={
            "temperature": "temperature/netcdf/decav/0.25/"
                           "woa23_decav_t{month:02d}_04.nc",
            "salinity": "salinity/netcdf/decav/0.25/"
                        "woa23_decav_s{month:02d}_04.nc",
        },
        variables={"temperature": "t_an", "salinity": "s_an"},
        convention="insitu_practical"),
    "GLORYS": CatalogEntry(
        dataset="GLORYS",
        base_url="https://my.cmems-du.eu/thredds/dodsC/"
                 "cmems_mod_glo_phy_my_0.083deg_P1D-m",
        filenames={
            "temperature": "glorys12v1_{year:04d}{month:02d}{day:02d}.nc",
            "salinity": "glorys12v1_{year:04d}{month:02d}{day:02d}.nc",
            "free_surface": "glorys12v1_{year:04d}{month:02d}{day:02d}.nc",
        },
        variables={"temperature": "thetao", "salinity": "so",
                   "free_surface": "zos"},
        convention="potential_practical"),   # thetao = potential temperature
    "ETOPO": CatalogEntry(
        dataset="ETOPO",
        base_url="https://www.ngdc.noaa.gov/thredds/fileServer/global/"
                 "ETOPO2022/60s/60s_surface_elev_netcdf",
        filenames={"bottom_height":
                   "ETOPO_2022_v1_60s_N90W180_surface.nc"},
        variables={"bottom_height": "z"},
        convention="teos10"),      # not a T/S dataset; no conversion
}


def catalog_entry(dataset_name: str) -> CatalogEntry | None:
    return CATALOG.get(dataset_name)


def needs_teos10_conversion(dataset_name: str, variable: str) -> bool:
    """True when `variable` from `dataset_name` must be converted to
    TEOS-10 conventions at ingestion. The *kind* of conversion depends on
    the entry's ``convention``: WOA (in-situ) takes the full
    in-situ → potential → Conservative pipeline; ECCO/EN4/GLORYS
    (already potential) skip the lapse-rate integration."""
    e = CATALOG.get(dataset_name)
    return (e is not None
            and e.convention in ("insitu_practical", "potential_practical")
            and variable in ("temperature", "salinity"))
