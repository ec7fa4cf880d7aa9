"""Observational ingestion converter (VERDICT r4 missing #5): native
downloaded products → the staged `<obs_dir>/<name>.npz` layout the
analysis loaders consume (docs/OBSERVATIONS.md). Synthesizes tiny native
files for each product family and asserts the converted baselines feed
the loaders' overlay products end-to-end."""

import os

import numpy as np

from climaocean_tpu.data.observations import stage_observations
from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.data.synthetic import synthetic_bathymetry


def _grid(nx=24, ny=16, nz=3):
    grid = latitude_longitude_grid((nx, ny, nz), latitude=(-70, 70),
                                   z=(-2000.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    return with_bottom_height(
        grid, np.minimum(synthetic_bathymetry(lon, lat), -0.1),
        minimum_depth=10.0)


def _write_nc(path, var, vals, nt=None):
    from scipy.io import netcdf_file

    nlat, nlon = vals.shape[-2:]
    f = netcdf_file(path, "w", version=2)
    if nt:
        f.createDimension("time", nt)
    f.createDimension("lat", nlat)
    f.createDimension("lon", nlon)
    if nt:
        tv = f.createVariable("time", "f8", ("time",))
        tv[:] = 30.4 * 86400.0 * np.arange(nt) / 86400.0
        tv.units = b"days since 2000-01-01"
    la = f.createVariable("lat", "f8", ("lat",))
    la[:] = np.linspace(-89.5, 89.5, nlat)
    la.units = b"degrees_north"
    lo = f.createVariable("lon", "f8", ("lon",))
    lo[:] = np.linspace(-180.0, 180.0, nlon, endpoint=False)
    lo.units = b"degrees_east"
    dims = ("time", "lat", "lon") if nt else ("lat", "lon")
    v = f.createVariable(var, "f4", dims)
    v[:] = vals.astype(np.float32)
    f.close()


def test_stage_observations_end_to_end(tmp_path):
    grid = _grid()
    native = tmp_path / "native"
    native.mkdir()
    nlat, nlon = 36, 72
    LA = np.linspace(-89.5, 89.5, nlat)[:, None] * np.pi / 180.0
    base = 0.3 * np.cos(LA) * np.ones((1, nlat, nlon))

    _write_nc(str(native / "ecco_ssh_clim.nc"), "SSH",
              np.repeat(base, 3, axis=0), nt=3)
    _write_nc(str(native / "ncep_uflx.nc"), "uflx",
              0.1 * np.repeat(base, 2, axis=0), nt=2)
    _write_nc(str(native / "ncep_vflx.nc"), "vflx",
              0.02 * np.repeat(base, 2, axis=0), nt=2)
    _write_nc(str(native / "dbm_mld.nc"), "mld", 120.0 * base[0][None],
              nt=1)
    _write_nc(str(native / "hadisst_clim.nc"), "sst",
              285.0 * np.ones((2, nlat, nlon)), nt=2)   # Kelvin → auto °C
    # 24-month SIC series so March/September climatologies have 2 samples
    conc = np.zeros((24, nlat, nlon), np.float32)
    conc[:, LA[:, 0] > 1.0, :] = 90.0                   # percent → auto /100
    _write_nc(str(native / "nsidc_ice_conc.nc"), "siconc", conc, nt=24)
    with open(native / "nsidc_extent.csv", "w") as f:
        f.write("month,extent_nh,extent_sh\n")
        for m in range(12):
            f.write(f"{m+1},{14 - 10*abs(m-7)/7:.2f},{8 + 6*abs(m-7)/7:.2f}\n")
    with open(native / "piomas_volume.csv", "w") as f:
        f.write("month,volume_nh\n")
        for m in range(12):
            f.write(f"{m+1},{20 - 12*abs(m-8)/8:.2f}\n")
    with open(native / "rapid_moc.nc", "wb") as f:
        pass  # replaced below by a proper file
    os.remove(native / "rapid_moc.nc")
    from scipy.io import netcdf_file
    f = netcdf_file(str(native / "rapid_moc.nc"), "w", version=2)
    f.createDimension("time", 5)
    tv = f.createVariable("time", "f8", ("time",))
    tv[:] = 86400.0 * 10 * np.arange(5)
    mv = f.createVariable("moc", "f4", ("time",))
    mv[:] = np.asarray([17.0, 16.5, 18.0, 17.2, 16.9], np.float32)
    f.close()

    obs = str(tmp_path / "obs")
    written = stage_observations(str(native), obs, grid)
    assert {"ecco_ssh", "ncep_stress", "dbm_mld", "hadisst_sst",
            "nsidc_extent", "piomas_volume", "rapid_moc",
            "siconc_march", "siconc_september"} <= set(written)

    # staged files honor the documented keys/shapes and feed the loaders
    with np.load(os.path.join(obs, "ecco_ssh.npz")) as z:
        assert z["ssh"].shape == (grid.Ny, grid.Nx)
        assert np.nanmax(z["ssh"]) > 0.1
    with np.load(os.path.join(obs, "hadisst_sst.npz")) as z:
        assert 5.0 < np.nanmean(z["sst"]) < 20.0        # K→°C applied
    with np.load(os.path.join(obs, "siconc_march.npz")) as z:
        assert np.nanmax(z["siconc"]) <= 1.0            # percent→fraction
    with np.load(os.path.join(obs, "nsidc_extent.npz")) as z:
        assert z["extent_nh"].shape == (12,)

    from climaocean_tpu.simulation.analysis import load_observation

    class Case:
        dir = str(tmp_path)
        obs_dir = obs

    assert load_observation(Case, "ecco_ssh") is not None
    assert load_observation(Case, "rapid_moc")["moc"].shape == (5,)
