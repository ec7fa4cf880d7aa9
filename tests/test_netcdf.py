"""NetCDF reader tests: classic (scipy-written) and NetCDF4/HDF5
(h5py-written) files round-trip through `data.netcdf.load_field` into the
native-grid contract, `Metadatum` ingestion picks up `.nc` files, and the
file-backed JRA55 atmosphere builder works end to end.

Mirrors the reference's NCDatasets ingestion (SURVEY.md §3.3).
"""

import numpy as np
import pytest

from climaocean_tpu.data.netcdf import (decode, faces_from_centers,
                                        find_netcdf, load_field, open_netcdf)


def _field(nz, nlat, nlon, nt=1):
    """Deterministic test field f(t,z,lat,lon)."""
    t = np.arange(nt)[:, None, None, None]
    z = np.arange(nz)[None, :, None, None]
    la = np.arange(nlat)[None, None, :, None]
    lo = np.arange(nlon)[None, None, None, :]
    return (1000 * t + 100 * z + 10 * la + lo).astype(np.float64)


def write_netcdf3(path, nz=4, nlat=6, nlon=8, nt=2, packed=False,
                  depth_positive_down=True):
    from scipy.io import netcdf_file
    f = netcdf_file(path, "w")
    f.createDimension("time", nt)
    f.createDimension("depth", nz)
    f.createDimension("lat", nlat)
    f.createDimension("lon", nlon)
    tv = f.createVariable("time", "f8", ("time",))
    tv[:] = np.arange(nt) * 3.0
    tv.units = b"hours since 1958-01-01"
    zv = f.createVariable("depth", "f8", ("depth",))
    zv[:] = np.array([5.0, 50.0, 500.0, 2000.0])  # positive down, surface first
    zv.units = b"m"
    zv.positive = b"down" if depth_positive_down else b"up"
    la = f.createVariable("lat", "f8", ("lat",))
    la[:] = np.linspace(-75, 75, nlat)
    la.units = b"degrees_north"
    lo = f.createVariable("lon", "f8", ("lon",))
    lo[:] = np.linspace(0, 360, nlon, endpoint=False)  # 0..360 convention
    lo.units = b"degrees_east"
    data = _field(nz, nlat, nlon, nt)
    if packed:
        v = f.createVariable("thetao", "i2", ("time", "depth", "lat", "lon"))
        v.scale_factor = 0.5
        v.add_offset = 100.0
        v._FillValue = np.int16(-32767)
        raw = ((data - 100.0) / 0.5).astype(np.int16)
        raw[0, 0, 0, 0] = -32767
        v[:] = raw
    else:
        v = f.createVariable("thetao", "f8", ("time", "depth", "lat", "lon"))
        v[:] = data
        v.units = b"degC"
    f.close()
    return data


def write_netcdf4(path, nz=3, nlat=5, nlon=6):
    import h5py
    data = _field(nz, nlat, nlon, 1)[0]
    with h5py.File(path, "w") as f:
        zc = f.create_dataset("lev", data=np.array([10.0, 100.0, 1000.0]))
        zc.attrs["units"] = "m"
        zc.attrs["positive"] = "down"
        la = f.create_dataset("latitude", data=np.linspace(-60, 60, nlat))
        la.attrs["units"] = "degrees_north"
        lo = f.create_dataset("longitude", data=np.linspace(-180, 180, nlon,
                                                            endpoint=False))
        lo.attrs["units"] = "degrees_east"
        for c in (zc, la, lo):
            c.make_scale(c.name.strip("/"))
        v = f.create_dataset("so", data=data)
        v.dims[0].attach_scale(zc)
        v.dims[1].attach_scale(la)
        v.dims[2].attach_scale(lo)
        v.attrs["_FillValue"] = 9.96921e36
    return data


def test_netcdf3_roundtrip(tmp_path):
    p = str(tmp_path / "ecco_thetao.nc")
    data = write_netcdf3(p)
    with open_netcdf(p) as nc:
        assert "thetao" in nc.variables
        assert nc.variables["thetao"].dims == ("time", "depth", "lat", "lon")
        raw = decode(nc.variables["thetao"], (0,))
        assert raw.shape == (4, 6, 8)

    out, z_f, lat_f, lon_f = load_field(p, "temperature", time_index=1)
    assert out.shape == (4, 6, 8)
    # z ascending, data[0] = deepest: original index 3 (2000 m)
    assert z_f[0] < z_f[-1] <= 0.0
    # lon rolled from [0,360) to [-180,180): original column for lon=-180
    # was index nlon/2
    assert np.isclose(lon_f[0], -180.0, atol=25.0)
    src = _field(4, 6, 8, 2)[1]
    assert np.allclose(out[0], np.roll(src[3], -4, axis=-1))
    assert np.allclose(out[-1], np.roll(src[0], -4, axis=-1))
    # faces bracket centers monotonically
    assert np.all(np.diff(lat_f) > 0) and np.all(np.diff(lon_f) > 0)
    assert np.all(np.diff(z_f) > 0)


def test_netcdf3_packed_and_fill(tmp_path):
    p = str(tmp_path / "packed.nc")
    data = write_netcdf3(p, packed=True)
    out, *_ = load_field(p, "temperature", time_index=0)
    # fill value -> NaN (original [0,0,0,0] = surface z-index 0 -> out[-1])
    assert np.isnan(out[-1, 0, 4])  # lon rolled by -4
    mask = ~np.isnan(out)
    src = data[0, ::-1]  # z flipped
    src = np.roll(src, -4, axis=-1)
    assert np.allclose(out[mask], src[mask])


def test_netcdf4_roundtrip(tmp_path):
    p = str(tmp_path / "glorys_so.nc")
    data = write_netcdf4(p)
    with open_netcdf(p) as nc:
        assert "so" in nc.variables
        assert nc.variables["so"].dims == ("lev", "latitude", "longitude")
    out, z_f, lat_f, lon_f = load_field(p, "salinity")
    assert out.shape == (3, 5, 6)
    assert np.allclose(out[-1], data[0])     # surface = shallowest
    assert np.allclose(out[0], data[2])      # bottom = deepest
    assert z_f[0] < z_f[1] < z_f[-1] <= 0.0


def test_find_netcdf_and_metadatum(tmp_path):
    p = str(tmp_path / "woa_temperature.nc")
    write_netcdf3(p)
    assert find_netcdf(str(tmp_path), "temperature") == p
    assert find_netcdf(str(tmp_path), "salinity") is None

    from climaocean_tpu.data.metadata import Metadatum, WOAAnnual, load_native
    meta = Metadatum("temperature", dataset=WOAAnnual(), dir=str(tmp_path))
    out, z_f, lat_f, lon_f = load_native(meta)
    assert out.shape == (4, 6, 8)
    assert z_f[0] < z_f[-1] <= 0.0


def test_ingestion_onto_grid(tmp_path):
    """set_fields with a file-backed Metadatum lands on the model grid."""
    p = str(tmp_path / "woa_temperature.nc")
    write_netcdf3(p)
    from climaocean_tpu.data.metadata import Metadatum, WOAAnnual, set_fields
    from climaocean_tpu.grids.grid import latitude_longitude_grid

    grid = latitude_longitude_grid((24, 12, 4), latitude=(-70, 70), halo=3)
    state = set_fields({}, grid,
                       T=Metadatum("temperature", dataset=WOAAnnual(),
                                   dir=str(tmp_path)))
    T = np.asarray(state["T"])
    H = grid.H
    interior = T[:, H:H + grid.Ny, H:H + grid.Nx]
    assert np.all(np.isfinite(interior))
    assert interior.std() > 0  # actually ingested structure


@pytest.fixture
def jra55_dir(tmp_path):
    """Tiny JRA55-style directory: one NetCDF3 file per shortname."""
    from scipy.io import netcdf_file
    nt, nlat, nlon = 3, 8, 12
    base = {"tas": 280.0, "huss": 0.008, "psl": 101325.0, "uas": 5.0,
            "vas": -2.0, "rlds": 340.0, "rsds": 180.0, "prra": 1e-5,
            "prsn": 1e-6, "friver": 2e-6}
    for name, b in base.items():
        f = netcdf_file(str(tmp_path / f"{name}_jra55.nc"), "w")
        f.createDimension("time", nt)
        f.createDimension("lat", nlat)
        f.createDimension("lon", nlon)
        tv = f.createVariable("time", "f8", ("time",))
        tv[:] = np.arange(nt) * 3.0
        tv.units = b"hours since 1958-01-01"
        la = f.createVariable("lat", "f8", ("lat",))
        la[:] = np.linspace(-80, 80, nlat)
        la.units = b"degrees_north"
        lo = f.createVariable("lon", "f8", ("lon",))
        lo[:] = np.linspace(-180, 180, nlon, endpoint=False)
        lo.units = b"degrees_east"
        v = f.createVariable(name, "f8", ("time", "lat", "lon"))
        vals = b * (1.0 + 0.01 * np.arange(nt))[:, None, None] \
            * np.ones((nt, nlat, nlon))
        v[:] = vals
        f.close()
    return str(tmp_path)


def test_netcdf_prescribed_atmosphere(jra55_dir):
    from climaocean_tpu.coupler.atmosphere import netcdf_prescribed_atmosphere
    from climaocean_tpu.grids.grid import latitude_longitude_grid

    grid = latitude_longitude_grid((16, 8, 3), latitude=(-70, 70), halo=3)
    atm = netcdf_prescribed_atmosphere(grid, jra55_dir)
    assert atm.times.shape == (3,)
    assert float(atm.times[1] - atm.times[0]) == pytest.approx(3 * 3600.0)
    # windows now stay at the FILE's native resolution (on-device
    # interpolation to the model grid happens in at_time)
    for k in ("u", "v", "T", "q", "p", "Qsw_down", "Qlw_down", "rain", "snow"):
        assert atm.fields[k].shape[0] == 3
    # rain is prra ONLY: river runoff is its own land component now
    # (coupler.land.PrescribedLand — reference JRA55PrescribedLand,
    # atmosphere.jl:46), no longer folded into the precip proxy
    assert float(atm.fields["rain"][0].mean()) == pytest.approx(1.0e-5, rel=1e-2)
    st = atm.at_time(1.5 * 3600.0)  # halfway between slabs 0 and 1
    assert np.asarray(st.T).shape == (grid.Nyp, grid.Nxp)
    assert float(np.asarray(st.T).mean()) == pytest.approx(280.0 * 1.005, rel=1e-3)


def test_orca_netcdf_mesh(tmp_path):
    """ORCAGrid reads a NEMO-style coordinates.nc (glamt/gphit/... +
    bathy_metry) and rebuilds the analytic tripolar grid: the
    supergrid_from_nemo assembly round-trips the exported lattice."""
    import dataclasses

    from scipy.io import netcdf_file

    from climaocean_tpu.configurations.orca import ORCAGrid
    from climaocean_tpu.grids.tripolar import (supergrid_from_nemo,
                                               tripolar_grid,
                                               tripolar_grid_from_supergrid)

    kw = dict(southernmost_latitude=-78, halo=4, z=(-2000.0, 0.0))
    lon_p, lat_p, p = tripolar_grid((36, 18, 3), _return_lattice=True, **kw)
    H, Ny, Nx = 4, 18, 36
    rows = slice(2 * H, 2 * H + 2 * Ny + 1)
    lon_sg, lat_sg = lon_p[rows], lat_p[rows]

    # extract NEMO-convention arrays from the lattice
    j2 = 2 * np.arange(Ny)
    ie = 2 * ((np.arange(Nx) + 1) % Nx)          # east face of cell i
    ic = 2 * np.arange(Nx) + 1
    glamt, gphit = lon_sg[np.ix_(j2 + 1, ic)], lat_sg[np.ix_(j2 + 1, ic)]
    glamu, gphiu = lon_sg[np.ix_(j2 + 1, ie)], lat_sg[np.ix_(j2 + 1, ie)]
    glamv, gphiv = lon_sg[np.ix_(j2 + 2, ic)], lat_sg[np.ix_(j2 + 2, ic)]
    glamf, gphif = lon_sg[np.ix_(j2 + 2, ie)], lat_sg[np.ix_(j2 + 2, ie)]

    lon_rt, lat_rt = supergrid_from_nemo(glamt, gphit, glamu, gphiu,
                                         glamv, gphiv, glamf, gphif)
    # rows 1..2Ny are exact; row 0 is a linear extrapolation (exact for the
    # uniform southern ladder)
    assert np.allclose(lat_rt, lat_sg, atol=1e-9)
    # longitudes match modulo 360 (the assembly can differ by a wrap)
    dlon = (lon_rt - lon_sg + 180.0) % 360.0 - 180.0
    assert np.allclose(dlon, 0.0, atol=1e-9)

    rng = np.random.default_rng(1)
    depth = 1500.0 + 400.0 * rng.random((Ny, Nx))

    f = netcdf_file(str(tmp_path / "coordinates_orca1.nc"), "w")
    f.createDimension("y", Ny)
    f.createDimension("x", Nx)
    for name, arr in (("glamt", glamt), ("gphit", gphit),
                      ("glamu", glamu), ("gphiu", gphiu),
                      ("glamv", glamv), ("gphiv", gphiv),
                      ("glamf", glamf), ("gphif", gphif),
                      ("bathy_metry", depth)):
        v = f.createVariable(name, "f8", ("y", "x"))
        v[:] = arr
    f.close()

    g_file = ORCAGrid(Nz=3, depth=2000.0, dir=str(tmp_path))
    g_ref = tripolar_grid_from_supergrid(lon_sg, lat_sg, 3,
                                         z=(-2000.0, 0.0), halo=4)
    assert g_file.Nx == Nx and g_file.Ny == Ny
    # metrics agree with the direct supergrid build (bathymetry aside)
    for name in ("lon_cc", "lat_cc", "dx_cc", "dy_cc", "az_cc"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_file, name))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=name)
    assert float(np.asarray(g_file.wet_c).sum()) > 0
