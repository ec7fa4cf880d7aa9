"""Synthetic (analytic) stand-ins for the reference's observational datasets.

The reference ingests ETOPO bathymetry, WOA/ECCO/EN4/GLORYS hydrography and
JRA55-do atmospheric forcing by download (`download_with_fallback.jl`,
SURVEY.md §3.3). This build environment has zero egress, so each dataset
gets an *analytic climatological proxy* with the right structure, units and
dynamic range, served through the same `Metadatum`/`set_fields` machinery
(`data.metadata`) — real NetCDF readers slot in behind the same interface
when files are present on disk.

The proxies are smooth, zonally-dominated climatologies with the principal
observed features (meridional SST gradient, thermocline/halocline,
basin-scale bathymetry with continents, seasonal cycle and diurnal cycle in
the atmosphere).
"""

from __future__ import annotations

import numpy as np

DAY = 86400.0
YEAR = 365.0 * DAY


# --------------------------------------------------------------------------
# bathymetry (ETOPO proxy)
# --------------------------------------------------------------------------

def synthetic_bathymetry(lon, lat):
    """Bottom height [m, <= 0 over ocean, > 0 over land] on 2-D lon/lat
    (degrees) arrays. Idealized continents (two meridional barriers with a
    gap — an "Atlantic" and a "Pacific"), mid-ocean ridge, polar shelf."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lonw = ((lon + 180.0) % 360.0) - 180.0

    depth = 5500.0 - 1500.0 * np.exp(-((np.abs(lat) - 0.0) / 70.0) ** 2)

    def continent(center, half_width, south, north):
        dl = np.abs(((lonw - center + 180.0) % 360.0) - 180.0)
        in_lon = np.clip(1.0 - (dl / half_width) ** 4, 0.0, 1.0)
        in_lat = np.clip((lat - south) / 5.0, 0.0, 1.0) * np.clip((north - lat) / 5.0, 0.0, 1.0)
        return in_lon * np.clip(in_lat * 3.0, 0.0, 1.0)

    def cap(center_lon, center_lat, radius_deg):
        dl = np.abs(((lonw - center_lon + 180.0) % 360.0) - 180.0) \
            * np.cos(np.deg2rad(center_lat))
        dp = lat - center_lat
        r = np.sqrt(dl ** 2 + dp ** 2)
        return (r < radius_deg).astype(np.float64)

    # Continents are sized so the standard tripolar poles (~55°N at 70°E and
    # 110°W) fall on solid land, as they do on the real Earth.
    land = np.zeros_like(depth)
    land = np.maximum(land, continent(-85.0, 28.0, -55.0, 72.0))   # "Americas"
    land = np.maximum(land, continent(40.0, 42.0, -35.0, 72.0))    # "Afro-Eurasia"
    land = np.maximum(land, continent(135.0, 12.0, -40.0, -12.0))  # "Australia"
    land = np.maximum(land, (lat < -70.0).astype(np.float64))      # "Antarctica"
    land = np.maximum(land, cap(70.0, 55.0, 10.0))                 # "Siberia" pole
    land = np.maximum(land, cap(-110.0, 55.0, 10.0))               # "Canada" pole

    ridge = 1800.0 * np.exp(-((lonw + 25.0) / 8.0) ** 2)           # mid-ocean ridge
    h = -(depth - ridge)
    h = h * (1.0 - land) + 500.0 * land
    return h


# --------------------------------------------------------------------------
# hydrography (WOA / ECCO proxies)
# --------------------------------------------------------------------------

def synthetic_temperature(lon, lat, z, month=None):
    """Conservative temperature [°C] climatology: warm tropics, cold poles,
    exponential thermocline, 2 °C abyss; optional seasonal cycle."""
    lat = np.asarray(lat, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    sst = 28.0 * np.cos(np.deg2rad(np.clip(lat, -80, 80))) ** 2 - 1.0
    if month is not None:
        phase = 2 * np.pi * (month - 2.0) / 12.0
        sst = sst + 3.0 * np.sign(lat + 1e-9) * -np.cos(phase) * \
            np.exp(-((np.abs(lat) - 40.0) / 25.0) ** 2)
    T_deep = 2.0
    prof = np.exp(z / 700.0)
    return T_deep + (sst - T_deep) * prof


def synthetic_salinity(lon, lat, z, month=None):
    """Absolute salinity [g/kg]: subtropical maxima, fresh poles and ITCZ,
    ~34.7 abyss."""
    lat = np.asarray(lat, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    surf = (35.0 + 1.5 * np.exp(-((np.abs(lat) - 25.0) / 15.0) ** 2)
            - 1.0 * np.exp(-(lat / 8.0) ** 2)
            - 2.0 * np.clip((np.abs(lat) - 55.0) / 25.0, 0.0, 1.0))
    deep = 34.7
    prof = np.exp(z / 1000.0)
    return deep + (surf - deep) * prof


def synthetic_sea_ice_thickness(lon, lat, month=6):
    lat = np.asarray(lat, dtype=np.float64)
    north = np.clip((lat - 70.0) / 10.0, 0.0, 1.0) * 2.0
    south = np.clip((-lat - 62.0) / 8.0, 0.0, 1.0) * 1.0
    seasonal = 0.5 + 0.5 * np.cos(2 * np.pi * (month - 3) / 12.0)
    return north * (0.5 + seasonal) + south * (1.5 - seasonal)


def synthetic_sea_ice_concentration(lon, lat, month=6):
    h = synthetic_sea_ice_thickness(lon, lat, month)
    return np.clip(h / 1.5, 0.0, 1.0)


# --------------------------------------------------------------------------
# atmosphere (JRA55-do proxy, 11 variables at 3-hourly cadence)
# --------------------------------------------------------------------------

JRA55_SHORTNAMES = ("tas", "huss", "psl", "uas", "vas", "rlds", "rsds",
                    "prra", "prsn", "friver", "licalvf")


def synthetic_atmosphere(lon, lat, t_seconds):
    """JRA55-like near-surface state at time ``t`` (seconds since year
    start). Returns dict of 2-D arrays over (lat, lon) keyed by the 11
    JRA55-do shortnames (`jra55_data_staging.jl:8`)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    doy = (t_seconds % YEAR) / DAY
    hod = (t_seconds % DAY) / 3600.0
    season = np.cos(2 * np.pi * (doy - 172.0) / 365.0)   # +1 at NH summer solstice

    # thermal state
    tas = (273.15 + 25.0 * np.cos(np.deg2rad(np.clip(lat, -85, 85))) ** 2
           - 5.0 + 8.0 * season * np.sign(lat)
           + 2.0 * np.cos(2 * np.pi * (hod - 14.0) / 24.0))
    es = 611.2 * np.exp(17.67 * (tas - 273.15) / (tas - 29.65))
    huss = 0.7 * 0.622 * es / 101325.0

    psl = 101325.0 + 800.0 * np.cos(np.deg2rad(3.0 * lat))

    # winds: easterly trades, westerlies, polar easterlies
    uas = (-6.0 * np.exp(-((np.abs(lat) - 12.0) / 10.0) ** 2)
           + 9.0 * np.exp(-((np.abs(lat) - 45.0) / 10.0) ** 2)
           - 3.0 * np.exp(-((np.abs(lat) - 75.0) / 8.0) ** 2))
    vas = 1.5 * np.sin(np.deg2rad(2.0 * lat)) * np.cos(np.deg2rad(lon))

    # radiation with diurnal + seasonal cycle
    decl = np.deg2rad(23.44) * season
    h_angle = 2 * np.pi * (hod - 12.0 + lon / 15.0) / 24.0
    mu = (np.sin(np.deg2rad(lat)) * np.sin(decl)
          + np.cos(np.deg2rad(lat)) * np.cos(decl) * np.cos(h_angle))
    rsds = 1000.0 * np.clip(mu, 0.0, 1.0)
    rlds = 5.67e-8 * (tas - 15.0) ** 4

    itcz = np.exp(-((lat - 6.0 * season) / 6.0) ** 2)
    storm = np.exp(-((np.abs(lat) - 50.0) / 12.0) ** 2)
    total_precip = 3e-5 * itcz + 1.5e-5 * storm
    frozen = np.clip((273.15 + 1.0 - tas) / 4.0, 0.0, 1.0)
    prra = total_precip * (1 - frozen)
    prsn = total_precip * frozen

    friver = np.zeros_like(tas)
    licalvf = np.zeros_like(tas)
    return {"tas": tas, "huss": huss, "psl": psl, "uas": uas, "vas": vas,
            "rlds": rlds, "rsds": rsds, "prra": prra, "prsn": prsn,
            "friver": friver, "licalvf": licalvf}
