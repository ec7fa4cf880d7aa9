"""Tripolar-cap ingestion correctness.

On the bipolar cap, grid rows are NOT constant-latitude — a 1-D latitude
ladder lands data on the wrong cells (round-1 defect). The
`HorizontalRegridPlan` samples the source bilinearly at the true cell
centers there. Reference intent: `InitialConditions.jl:33-68` +
NumericalEarth's `interpolate!` onto curvilinear grids."""

import numpy as np


def _analytic(lon, lat):
    """Smooth, nonseparable test field."""
    return (np.sin(np.deg2rad(lon)) * np.cos(np.deg2rad(lat) * 2.0)
            + 0.5 * np.sin(np.deg2rad(lat) * 3.0))


def _source(nlat=180, nlon=360):
    lat_f = np.linspace(-90, 90, nlat + 1)
    lon_f = np.linspace(-180, 180, nlon + 1)
    lat_c = 0.5 * (lat_f[:-1] + lat_f[1:])
    lon_c = 0.5 * (lon_f[:-1] + lon_f[1:])
    LON, LAT = np.meshgrid(lon_c, lat_c)
    return _analytic(LON, LAT), lat_f, lon_f


def test_cap_cells_match_direct_evaluation():
    from climaocean_tpu.data.regrid import HorizontalRegridPlan
    from climaocean_tpu.grids.tripolar import tripolar_grid

    grid = tripolar_grid((90, 45, 3), southernmost_latitude=-80.0, halo=4)
    data, lat_f, lon_f = _source()
    out = HorizontalRegridPlan(grid, lat_f, lon_f).apply(data)

    H = grid.H
    lat_cc = np.asarray(grid.lat_cc)[H:H + grid.Ny, H:H + grid.Nx]
    lon_cc = np.asarray(grid.lon_cc)[H:H + grid.Ny, H:H + grid.Nx]
    direct = _analytic(lon_cc, lat_cc)

    # cap rows (not constant-latitude): must match direct evaluation < 1%
    spread = lat_cc.max(axis=1) - lat_cc.min(axis=1)
    cap = spread > 0.01
    assert cap.any(), "grid has no cap rows?"
    scale = np.abs(direct).max()
    err_cap = np.abs(out[cap] - direct[cap]).max() / scale
    assert err_cap < 0.01, f"cap ingestion error {err_cap:.3%}"

    # southern (latline) rows: conservative remap, also accurate
    err_south = np.abs(out[~cap] - direct[~cap]).max() / scale
    assert err_south < 0.02, f"latline ingestion error {err_south:.3%}"


def test_latlon_plan_matches_old_conservative_path():
    """On a lat-lon grid the plan must reduce exactly to the conservative
    ladder (row_is_latline everywhere)."""
    from climaocean_tpu.data.regrid import (HorizontalRegridPlan,
                                            conservative_regrid_1d)
    from climaocean_tpu.grids.grid import latitude_longitude_grid

    grid = latitude_longitude_grid((36, 18, 2), z=(-100.0, 0.0), halo=4)
    data, lat_f, lon_f = _source(90, 180)
    plan = HorizontalRegridPlan(grid, lat_f, lon_f)
    assert plan.row_is_latline.all()
    out = plan.apply(data)

    old = conservative_regrid_1d(lat_f, plan._lat_dst, data, axis=0)
    old = conservative_regrid_1d(lon_f, plan._lon_dst, old, axis=1)
    assert np.allclose(out, old, atol=1e-12)


def test_bathymetry_on_tripolar_cap():
    """regrid_bathymetry through the plan: a latitude-dependent analytic
    'bathymetry' must land on the right cap cells."""
    from climaocean_tpu.data.regrid import HorizontalRegridPlan
    from climaocean_tpu.grids.tripolar import tripolar_grid

    grid = tripolar_grid((90, 45, 3), southernmost_latitude=-80.0, halo=4)
    nlat, nlon = 360, 720
    lat_f = np.linspace(-90, 90, nlat + 1)
    lon_f = np.linspace(-180, 180, nlon + 1)
    lat_c = 0.5 * (lat_f[:-1] + lat_f[1:])
    lon_c = 0.5 * (lon_f[:-1] + lon_f[1:])
    LON, LAT = np.meshgrid(lon_c, lat_c)
    depth = -4000.0 + 2000.0 * np.sin(np.deg2rad(LAT))

    out = HorizontalRegridPlan(grid, lat_f, lon_f).apply(depth)
    H = grid.H
    lat_cc = np.asarray(grid.lat_cc)[H:H + grid.Ny, H:H + grid.Nx]
    expect = -4000.0 + 2000.0 * np.sin(np.deg2rad(lat_cc))
    spread = lat_cc.max(axis=1) - lat_cc.min(axis=1)
    cap = spread > 0.01
    assert np.abs(out[cap] - expect[cap]).max() < 40.0   # < 1% of 4000 m
