"""Multi-year JRA55 file backend + prefetching windows.

Reference behavior: `JRA55PrescribedAtmosphere(arch; dir, dataset,
time_indices_in_memory, prefetch=true)` with `MultiYearJRA55` /
`RepeatYearJRA55` (`atmosphere.jl:13-49`) — bounded device windows, host
refill, continuity across window swaps and year-file boundaries."""

import numpy as np
import pytest

import jax.numpy as jnp

HOUR = 3600.0


def _write_year(path, name, t0_hours, nt, value_of, nlat=8, nlon=12):
    from scipy.io import netcdf_file
    f = netcdf_file(str(path), "w")
    f.createDimension("time", nt)
    f.createDimension("lat", nlat)
    f.createDimension("lon", nlon)
    tv = f.createVariable("time", "f8", ("time",))
    hours = t0_hours + 3.0 * np.arange(nt)
    tv[:] = hours
    tv.units = b"hours since 1958-01-01"
    la = f.createVariable("lat", "f8", ("lat",))
    la[:] = np.linspace(-80, 80, nlat)
    la.units = b"degrees_north"
    lo = f.createVariable("lon", "f8", ("lon",))
    lo[:] = np.linspace(-180, 180, nlon, endpoint=False)
    lo.units = b"degrees_east"
    v = f.createVariable(name, "f8", ("time", "lat", "lon"))
    v[:] = value_of(hours)[:, None, None] * np.ones((nt, nlat, nlon))
    f.close()


BASE = {"tas": 280.0, "huss": 0.008, "psl": 101325.0, "uas": 5.0,
        "vas": -2.0, "rlds": 340.0, "rsds": 180.0, "prra": 1e-5,
        "prsn": 1e-6}


@pytest.fixture
def multiyear_dir(tmp_path):
    """Two 'year' files per shortname: 3-hourly, hours [0, 72) and
    [72, 144). tas drifts linearly in time so interpolation correctness is
    checkable; friver is DAILY (mixed cadence, like real JRA55-do)."""
    nt = 24                                    # 24 x 3 h = 72 h per file
    for name, b in BASE.items():
        for yi, t0 in enumerate((0.0, 72.0)):
            _write_year(tmp_path / f"{name}_y{1958 + yi}.nc", name, t0, nt,
                        lambda h, b=b: b * (1.0 + 1e-3 * h))
    for yi, t0 in enumerate((0.0, 72.0)):
        _write_year(tmp_path / f"friver_y{1958 + yi}.nc", "friver", t0, 3,
                    lambda h: 2e-6 * np.ones_like(h))
    return str(tmp_path)


def _grid():
    from climaocean_tpu.grids.grid import latitude_longitude_grid
    return latitude_longitude_grid((12, 8, 3), z=(-500.0, 0.0), halo=4)


def test_multiyear_index_and_fixed_window(multiyear_dir):
    from climaocean_tpu.coupler.jra55 import JRA55FileAtmosphere
    be = JRA55FileAtmosphere(_grid(), multiyear_dir,
                             time_indices_in_memory=8)
    assert be.nt == 48                         # both year files concatenated
    win, t_ref = be.window_for_time(0.0)
    assert win.times.shape == (8,)
    assert t_ref == 0.0
    # value check: tas at t=6h should be 280*(1+1e-3*6) K
    st = win.at_time(6 * HOUR - t_ref)
    expect = 280.0 * (1.0 + 1e-3 * 6.0)
    assert abs(float(st.T.max()) - expect) < 0.02
    # land flux folded into rain despite its daily cadence
    assert float(st.rain.max()) > 1e-5         # prra + friver


def test_window_crosses_year_file_boundary(multiyear_dir):
    from climaocean_tpu.coupler.jra55 import JRA55FileAtmosphere
    be = JRA55FileAtmosphere(_grid(), multiyear_dir,
                             time_indices_in_memory=8)
    # window starting at hour 63 spans the 72 h file boundary
    win, t_ref = be.window_for_time(63 * HOUR, 84 * HOUR)
    ts = np.asarray(win.times) + t_ref
    assert ts[0] <= 63 * HOUR <= ts[-1] or ts[0] <= 63 * HOUR
    for h in (66.0, 71.9, 75.0, 81.0):
        st = win.at_time(h * HOUR - t_ref)
        expect = 280.0 * (1.0 + 1e-3 * h)
        assert abs(float(st.T.max()) - expect) < 0.05, h


def test_repeat_year_wraps(multiyear_dir):
    from climaocean_tpu.coupler.jra55 import JRA55FileAtmosphere
    span = 144 * HOUR
    be = JRA55FileAtmosphere(_grid(), multiyear_dir,
                             time_indices_in_memory=8, repeat_year=True,
                             year_span=span)
    # deep into cycle 3: t = 3 cycles + 30 h
    t = 3 * span + 30 * HOUR
    win, t_ref = be.window_for_time(t)
    assert t_ref <= t
    st = win.at_time(t - t_ref)
    expect = 280.0 * (1.0 + 1e-3 * 30.0)      # phase 30 h of the cycle
    assert abs(float(st.T.max()) - expect) < 0.5
    # a window placed near the cycle end wraps back to the start slabs
    t2 = 3 * span + 140 * HOUR
    win2, t_ref2 = be.window_for_time(t2)
    ts2 = np.asarray(win2.times)
    assert np.all(np.diff(ts2) > 0)            # unwrapped, increasing


def test_prefetched_run_matches_whole_file_run(multiyear_dir):
    """Drive a coupled model through >= 2 window swaps; the solution must
    match the same run forced by one whole-dataset window."""
    from climaocean_tpu.coupler.prefetch import PrefetchingAtmosphere
    from climaocean_tpu.data.synthetic import (synthetic_bathymetry,
                                               synthetic_salinity,
                                               synthetic_temperature)
    from climaocean_tpu.grids.grid import (latitude_longitude_grid,
                                           with_bottom_height)
    from climaocean_tpu.models.coupled import (OceanSeaIceModel,
                                               make_coupled_step_fn)
    from climaocean_tpu.models.hydrostatic import HydrostaticModel

    nx, ny, nz = 12, 8, 3
    grid = latitude_longitude_grid((nx, ny, nz), latitude=(-70, 70),
                                   z=(-500.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(
        grid, np.minimum(synthetic_bathymetry(lon, lat), -0.1),
        minimum_depth=10.0)
    ocean = HydrostaticModel(grid=grid, closures=(), substeps=4)

    def init_state(model):
        s = model.initial_state()
        H = grid.H
        zc = np.asarray(grid.z_c)
        Tp = np.zeros(grid.padded_shape, np.float32)
        Sp = np.full(grid.padded_shape, 35.0, np.float32)
        Tp[:, H:H + ny, H:H + nx] = synthetic_temperature(
            lon[None], lat[None], zc[:, None, None])
        Sp[:, H:H + ny, H:H + nx] = synthetic_salinity(
            lon[None], lat[None], zc[:, None, None])
        s["ocean"]["T"] = jnp.asarray(Tp)
        s["ocean"]["S"] = jnp.asarray(Sp)
        return s

    # run A: the WHOLE dataset in one resident window (48 slabs)
    from climaocean_tpu.coupler.jra55 import JRA55FileAtmosphere
    whole, t_ref_A = JRA55FileAtmosphere(
        grid, multiyear_dir, time_indices_in_memory=48).window_for_time(0.0)
    assert t_ref_A == 0.0
    mA = OceanSeaIceModel(ocean=ocean, atmosphere=whole)
    stepA = make_coupled_step_fn(mA, donate=False)
    sA = init_state(mA)

    # run B: 8-slab prefetched windows (the whole dataset is 48)
    pf = PrefetchingAtmosphere.from_files(grid, multiyear_dir,
                                          time_indices_in_memory=8)
    mB = OceanSeaIceModel(ocean=ocean, atmosphere=pf.window_for(0.0)[0])
    stepB = make_coupled_step_fn(mB, donate=False, prefetcher=pf)
    sB = init_state(mB)

    dt = 3 * HOUR
    n_steps = 40                               # 120 h: crosses files + swaps
    t = 0.0
    for i in range(n_steps):
        sA = stepA(sA, t, dt)
        sB = stepB(sB, t, dt)
        t += dt
    assert pf.swaps >= 2, "windows never rotated mid-run"
    for k in ("T", "S", "u", "eta"):
        a, b = np.asarray(sA["ocean"][k]), np.asarray(sB["ocean"][k])
        assert np.allclose(a, b, atol=5e-5), \
            f"{k} diverged across window swaps: {np.abs(a - b).max()}"


def test_native_interpolation_matches_regrid_path(multiyear_dir):
    """The on-device bilinear window (`InterpolatedAtmosphere`) agrees
    with the host-regrid window (`PrescribedAtmosphere`) at the sampled
    model points — same data, two interpolation routes. Tolerance covers
    conservative-ladder vs bilinear differences on a smooth field."""
    from climaocean_tpu.coupler.atmosphere import InterpolatedAtmosphere
    from climaocean_tpu.coupler.jra55 import JRA55FileAtmosphere

    grid = _grid()
    nat = JRA55FileAtmosphere(grid, multiyear_dir, time_indices_in_memory=8,
                              native_interpolation=True)
    reg = JRA55FileAtmosphere(grid, multiyear_dir, time_indices_in_memory=8,
                              native_interpolation=False)
    wn, tn = nat.window_for_time(6 * HOUR)
    wr, tr = reg.window_for_time(6 * HOUR)
    assert isinstance(wn, InterpolatedAtmosphere)
    assert tn == tr
    H = grid.H
    for t in (0.0, 4.5 * HOUR, 20.0 * HOUR):
        a = wn.at_time(t)
        b = wr.at_time(t)
        for name in ("T", "u", "p", "q"):
            x = np.asarray(getattr(a, name))[H:H + grid.Ny, H:H + grid.Nx]
            y = np.asarray(getattr(b, name))[H:H + grid.Ny, H:H + grid.Nx]
            scale = max(np.abs(y).max(), 1e-12)
            assert np.abs(x - y).max() / scale < 0.05, \
                f"{name} at t={t}: {np.abs(x - y).max() / scale:.3e}"
        # the test dataset's tas drifts linearly in time — exact check
        hours = (tn + t) / HOUR
        expect = 280.0 * (1.0 + 1e-3 * hours)
        Tn = np.asarray(a.T)[H:H + grid.Ny, H:H + grid.Nx]
        np.testing.assert_allclose(Tn.mean(), expect, rtol=2e-5)


def test_interpolated_atmosphere_under_shard_map(multiyear_dir):
    """The native-resolution window distributes: per-tile sampling plans
    partition, native fields replicate, and the shard_map `at_time`
    reproduces the single-device result tile by tile."""
    import jax
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the faked 8-device mesh")
    from climaocean_tpu.coupler.jra55 import JRA55FileAtmosphere
    from climaocean_tpu.parallel.mesh import make_mesh
    from climaocean_tpu.parallel.shard import partition_tree, _is_stacked
    from climaocean_tpu.utils.compat import shard_map

    grid = _grid()
    backend = JRA55FileAtmosphere(grid, multiyear_dir,
                                  time_indices_in_memory=8)
    win, _ = backend.window_for_time(0.0)
    ref = np.asarray(win.at_time(5 * HOUR).T)

    py, px = 2, 4
    mesh = make_mesh((py, px))
    win_s = partition_tree(win, grid, py, px)
    nxp_loc = grid.Nx // px + 2 * grid.H

    def spec_for(a):
        return P(("y", "x")) if _is_stacked(a, nxp_loc) else P()

    def body(w):
        import jax.tree_util as jtu
        local = jtu.tree_map(
            lambda a: a[0] if _is_stacked(a, nxp_loc) else a, w)
        return jtu.tree_map(lambda a: a[None], local.at_time(5 * HOUR).T)

    out = shard_map(body, mesh=mesh,
                    in_specs=(jax.tree_util.tree_map(spec_for, win_s),),
                    out_specs=P(("y", "x")))(win_s)
    H = grid.H
    ny_loc = grid.Ny // py
    nx_loc = grid.Nx // px
    idx = 0
    for j in range(py):
        for i in range(px):
            tile = np.asarray(out[idx])[H:H + ny_loc, H:H + nx_loc]
            y0, x0 = H + j * ny_loc, H + i * nx_loc
            np.testing.assert_allclose(
                tile, ref[y0:y0 + ny_loc, x0:x0 + nx_loc], atol=1e-5)
            idx += 1
