"""Dataset catalogs + TEOS-10 ingestion conversion.

Covers VERDICT item 5: per-dataset filename/URL/variable conventions
(reference `metadata_path` / `Downloads.download(metadata)` — SURVEY.md
§3.3) exercised end-to-end with ``file://`` fixture NetCDFs, and the WOA
in-situ-T / practical-S → TEOS-10 (Θ, S_A) conversion applied at
ingestion (reference `omip_simulation.jl:408-417`).
"""

import os

import numpy as np
import pytest

from climaocean_tpu.data.catalog import (CATALOG, catalog_entry,
                                         needs_teos10_conversion)
from climaocean_tpu.data.download import download_metadatum
from climaocean_tpu.data.metadata import (ECCO4Monthly, EN4Monthly,
                                          Metadatum, WOAAnnual, load_native)
from climaocean_tpu.physics import teos10_conversions as conv


# --------------------------------------------------------------------------
# conversion math
# --------------------------------------------------------------------------

def test_potential_temperature_check_value():
    # Fofonoff & Millard (1983), UNESCO Tech. Paper 44 check value
    th = conv.potential_temperature(40.0, 40.0, 10000.0, 0.0)
    assert abs(th - 36.89073) < 2e-5


def test_ct_from_pt_anchors():
    # the TEOS-10 polynomial is calibrated so Θ == θ at the standard-ocean
    # salinity for θ = 0 and 25 °C
    assert abs(conv.ct_from_pt(conv.SSO, 0.0)) < 1e-4
    assert abs(conv.ct_from_pt(conv.SSO, 25.0) - 25.0) < 1e-4
    # physically |Θ − θ| stays small over the oceanographic range
    pts = np.linspace(-2.0, 32.0, 20)[None]
    sas = np.linspace(30.0, 37.0, 10)[:, None]
    assert np.max(np.abs(conv.ct_from_pt(sas, pts) - pts)) < 0.35


def test_sa_from_sp_scaling():
    assert abs(conv.sa_from_sp(35.0) - conv.SSO) < 1e-12


def test_insitu_conversion_roundtrip_surface():
    # at the surface, in-situ == potential temperature, so the conversion
    # reduces to CT_from_pt
    T, SA = conv.teos10_from_insitu(10.0, 35.0, 0.0)
    assert abs(T - conv.ct_from_pt(conv.SSO, 10.0)) < 1e-10
    # at depth, adiabatic decompression warms θ above in-situ T... no:
    # raising a parcel adiabatically COOLS it, so θ < T for typical strat.
    T_deep, _ = conv.teos10_from_insitu(2.0, 34.8, -4000.0)
    assert T_deep < 2.0
    assert T_deep > 1.3        # lapse ≈ 0.1–0.15 °C/km at these values


# --------------------------------------------------------------------------
# catalog conventions
# --------------------------------------------------------------------------

def test_catalog_filenames():
    woa = catalog_entry("WOAAnnual")
    assert woa.filename("temperature").endswith("woa23_decav_t00_04.nc")
    assert woa.var_name("temperature") == "t_an"
    ecco = catalog_entry("ECCO4Monthly")
    assert ecco.filename("temperature", "1992-10") == \
        "THETA/1992/THETA_1992_10.nc"
    en4 = catalog_entry("EN4Monthly")
    assert en4.filename("salinity", 199305) == \
        "EN.4.2.2.f.analysis.g10.199305.nc"
    assert en4.temperature_kelvin
    e2 = catalog_entry("ECCO2Daily")
    assert e2.filename("temperature", "1992-01-02").endswith(
        "THETA.1440x720x50.19920102.nc")


def test_catalog_urls_and_conversion_flags():
    for name, entry in CATALOG.items():
        for var in entry.filenames:
            url = entry.url(var, 199301)
            assert url.startswith("http"), (name, var)
    assert needs_teos10_conversion("WOAAnnual", "temperature")
    assert needs_teos10_conversion("EN4Monthly", "salinity")
    assert needs_teos10_conversion("ECCO4Monthly", "temperature")
    assert not needs_teos10_conversion("ETOPO", "bottom_height")
    assert not needs_teos10_conversion("WOAAnnual", "sea_ice_thickness")
    # only WOA is genuinely in-situ; ECCO/EN4/GLORYS are already potential
    assert CATALOG["WOAAnnual"].convention == "insitu_practical"
    for name in ("ECCO4Monthly", "ECCO2Daily", "EN4Monthly", "GLORYS"):
        assert CATALOG[name].convention == "potential_practical", name


def test_env_override(monkeypatch):
    monkeypatch.setenv("CLIMAOCEAN_WOAANNUAL_URL", "file:///mirror")
    woa = catalog_entry("WOAAnnual")
    assert woa.url("temperature").startswith("file:///mirror/")


# --------------------------------------------------------------------------
# end-to-end: fixture NetCDFs through the catalog path
# --------------------------------------------------------------------------

def _write_woa_pair(dirpath, nz=4, nlat=8, nlon=12):
    """woa23-style t_an/s_an files (in-situ °C, practical salinity)."""
    from scipy.io import netcdf_file

    z = np.array([0.0, 100.0, 1000.0, 4000.0])     # positive-down centers
    lat = np.linspace(-80, 80, nlat)
    lon = np.linspace(-180, 180, nlon, endpoint=False)
    T = 2.0 + 20.0 * np.exp(-z[:, None, None] / 800.0) \
        * np.cos(np.deg2rad(lat))[None, :, None] + 0 * lon
    S = 34.0 + 1.0 * np.exp(-z[:, None, None] / 1500.0) + 0 * (lat[None, :, None] + lon)

    for fname, var, data in (("woa23_decav_t00_04.nc", "t_an", T),
                             ("woa23_decav_s00_04.nc", "s_an", S)):
        f = netcdf_file(os.path.join(dirpath, fname), "w")
        f.createDimension("depth", nz)
        f.createDimension("lat", nlat)
        f.createDimension("lon", nlon)
        zv = f.createVariable("depth", "f8", ("depth",))
        zv[:] = z
        zv.units = b"m"
        zv.positive = b"down"
        la = f.createVariable("lat", "f8", ("lat",))
        la[:] = lat
        la.units = b"degrees_north"
        lo = f.createVariable("lon", "f8", ("lon",))
        lo[:] = lon
        lo.units = b"degrees_east"
        v = f.createVariable(var, "f8", ("depth", "lat", "lon"))
        v[:] = data
        f.close()
    return T, S, z


def test_woa_ingestion_applies_teos10(tmp_path):
    T_raw, S_raw, z = _write_woa_pair(str(tmp_path))
    tm = Metadatum("temperature", dataset=WOAAnnual(), dir=str(tmp_path))
    sm = Metadatum("salinity", dataset=WOAAnnual(), dir=str(tmp_path))

    T_ing, z_f, _, _ = load_native(tm)
    S_ing, _, _, _ = load_native(sm)

    # salinity: exact reference-composition scaling
    # (loader flips to ascending z: index 0 = deepest)
    assert np.allclose(S_ing, conv.sa_from_sp(S_raw[::-1]), atol=1e-10)

    # temperature: full in-situ → Θ conversion with the companion salinity
    z_c = 0.5 * (z_f[:-1] + z_f[1:])
    expect, _ = conv.teos10_from_insitu(T_raw[::-1], S_raw[::-1],
                                        z_c[:, None, None])
    assert np.allclose(T_ing, expect, atol=1e-9)

    # the conversion is material at depth (θ < T in-situ) and small at surface
    assert np.all(T_ing[0] < T_raw[::-1][0])


def test_download_metadatum_through_catalog(tmp_path, monkeypatch):
    # serve the catalog's canonical filename from a file:// "server"
    server = tmp_path / "server"
    server.mkdir()
    _write_woa_pair(str(server))
    monkeypatch.setenv("CLIMAOCEAN_WOAANNUAL_URL", "file://" + str(server))
    os.makedirs(str(server / "temperature/netcdf/decav/0.25"), exist_ok=True)
    os.replace(str(server / "woa23_decav_t00_04.nc"),
               str(server / "temperature/netcdf/decav/0.25/woa23_decav_t00_04.nc"))

    cache = tmp_path / "cache"
    cache.mkdir()
    tm = Metadatum("temperature", dataset=WOAAnnual(), dir=str(cache))
    p = download_metadatum(tm)
    assert os.path.basename(p) == "woa23_decav_t00_04.nc"
    assert os.path.exists(p)
    # and load_native now finds + converts it (salinity companion absent →
    # constant-35 fallback inside the conversion)
    T_ing, *_ = load_native(tm)
    assert np.isfinite(T_ing).all()


def test_en4_kelvin_conversion(tmp_path):
    from scipy.io import netcdf_file
    nz, nlat, nlon = 3, 6, 8
    z = np.array([5.0, 500.0, 3000.0])
    f = netcdf_file(str(tmp_path / "EN.4.2.2.f.analysis.g10.199301.nc"), "w")
    f.createDimension("depth", nz)
    f.createDimension("lat", nlat)
    f.createDimension("lon", nlon)
    zv = f.createVariable("depth", "f8", ("depth",))
    zv[:] = z
    zv.units = b"m"
    zv.positive = b"down"
    la = f.createVariable("lat", "f8", ("lat",))
    la[:] = np.linspace(-80, 80, nlat)
    la.units = b"degrees_north"
    lo = f.createVariable("lon", "f8", ("lon",))
    lo[:] = np.linspace(-180, 180, nlon, endpoint=False)
    lo.units = b"degrees_east"
    v = f.createVariable("temperature", "f8", ("depth", "lat", "lon"))
    v[:] = 283.15 * np.ones((nz, nlat, nlon))       # 10 °C in K
    f.close()

    tm = Metadatum("temperature", date=199301, dataset=EN4Monthly(),
                   dir=str(tmp_path))
    T_ing, *_ = load_native(tm)
    # Kelvin recognized, and EN4 stores POTENTIAL temperature — the
    # `potential_practical` convention goes straight to ct_from_pt (no
    # lapse-rate integration, no salinity companion → SP = 35), so the
    # ingested value is exactly CT(SA(35), 10 °C) at EVERY depth
    expect = conv.ct_from_pt(conv.sa_from_sp(35.0), 10.0)
    assert np.allclose(T_ing, expect, atol=1e-9)
    # depth-independence is the signature that the adiabatic correction
    # was NOT applied twice (the in-situ pipeline would cool deep levels)
    assert np.ptp(T_ing) < 1e-9
