"""Offline analysis: flood-fill basin mask, AMOC/bias/strait loaders, and
the figure CLI (VERDICT round-1 item 8; reference `visualize/cache.jl` +
`common.jl`, SURVEY.md §3.5)."""

import os

import numpy as np
import pytest

from climaocean_tpu.data.synthetic import synthetic_bathymetry
from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.simulation.analysis import CaseCache, atlantic_ocean_basin


def make_grid(nx=90, ny=60, nz=4):
    grid = latitude_longitude_grid((nx, ny, nz), longitude=(-180, 180),
                                   latitude=(-75, 75), z=(-4000.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    return with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat),
                                               -0.1), minimum_depth=10)


def _ll_index(grid, lon_t, lat_t):
    H = grid.H
    lat = np.asarray(grid.lat_cc)[H:H + grid.Ny, H:H + grid.Nx]
    lon = ((np.asarray(grid.lon_cc)[H:H + grid.Ny, H:H + grid.Nx]
            + 180.0) % 360.0) - 180.0
    d2 = (lat - lat_t) ** 2 + (lon - lon_t) ** 2
    return np.unravel_index(np.argmin(d2), d2.shape)


def test_atlantic_basin_flood_fill():
    """The mask must contain mid-Atlantic water, exclude the Pacific (no
    leakage through the Arctic or the Southern Ocean), and stop at the
    34°S cut — the round-1 box polygon leaked Pacific water."""
    grid = make_grid()
    mask = atlantic_ocean_basin(grid)
    wet = np.asarray(grid.wet_c[-1])[grid.H:grid.H + grid.Ny,
                                     grid.H:grid.H + grid.Nx] > 0

    j, i = _ll_index(grid, -30.0, 20.0)         # mid-Atlantic
    assert mask[j, i] == 1.0
    j, i = _ll_index(grid, -30.0, 55.0)         # North Atlantic
    assert mask[j, i] == 1.0
    for plon, plat in ((-150.0, 0.0), (-150.0, 30.0), (170.0, -20.0)):
        j, i = _ll_index(grid, plon, plat)
        if wet[j, i]:
            assert mask[j, i] == 0.0, (plon, plat)  # Pacific excluded
    j, i = _ll_index(grid, -30.0, -50.0)        # south of the 34°S cut
    assert mask[j, i] == 0.0
    # only wet cells
    assert np.all(mask[~wet] == 0.0)


def _write_parts(outdir, grid, nt=4):
    """Fabricate writer output: surface/fields/scalars part files."""
    H, ny, nx, nz = grid.H, grid.Ny, grid.Nx, grid.Nz
    rng = np.random.default_rng(3)
    time = (np.arange(nt) + 1.0) * 30 * 86400.0

    lat = np.asarray(grid.lat_cc)[H:H + ny, H:H + nx]
    wet = np.asarray(grid.wet_c[-1])[H:H + ny, H:H + nx]
    tos = (28.0 * np.cos(np.deg2rad(lat))[None] + rng.normal(0, .1, (nt, ny, nx))) * wet
    surface = {
        "time": time, "iteration": np.arange(nt, dtype=np.int64),
        "tos": tos.astype(np.float32),
        "sos": (35.0 * np.ones((nt, ny, nx)) * wet).astype(np.float32),
        "mlotst": (50.0 + 20 * rng.random((nt, ny, nx)) * wet).astype(np.float32),
        "siconc": (0.5 * np.ones((nt, 1, 1)) * (np.abs(lat)[None] > 65)
                   * wet).astype(np.float32),
        "sithick": (1.0 * np.ones((nt, 1, 1)) * (np.abs(lat)[None] > 65)
                    * wet).astype(np.float32),
    }
    np.savez_compressed(os.path.join(outdir, "omip_surface_part0.npz"), **surface)

    wet3 = np.asarray(grid.wet_c)[:, H:H + ny, H:H + nx]
    v = 0.02 * rng.normal(size=(nt, nz, ny, nx)).astype(np.float32) * wet3
    u = 0.02 * rng.normal(size=(nt, nz, ny, nx)).astype(np.float32) * wet3
    dz = np.asarray(grid.dz_c)[:, None, None]
    dxcf = np.asarray(grid.dx_cf)[H:H + ny, H:H + nx]
    fields = {
        "time": time, "iteration": np.arange(nt, dtype=np.int64),
        "u": u, "v": v,
        "vvol": (dxcf[None, None] * dz[None] * v).astype(np.float32),
        "uvol": u,  # placeholder with the right shape
    }
    np.savez_compressed(os.path.join(outdir, "omip_fields_part0.npz"), **fields)

    scalars = {"time": time, "iteration": np.arange(nt, dtype=np.int64),
               "zosga": 1e-6 * rng.normal(size=nt),
               "thetaoga": 4.0 + 0.01 * np.arange(nt),
               "soga": 34.7 * np.ones(nt),
               "ke": 1e-3 * np.ones(nt)}
    np.savez_compressed(os.path.join(outdir, "omip_scalars_part0.npz"), **scalars)


def test_loaders_and_figures(tmp_path):
    grid = make_grid()
    outdir = str(tmp_path)
    _write_parts(outdir, grid)

    cache = CaseCache(outdir, grid=grid)
    amoc = cache.get("amoc")
    assert amoc["psi"].shape == (grid.Nz, grid.Ny)
    assert "amoc_26n" in amoc and amoc["amoc_26n"].shape == (4,)
    assert np.isfinite(amoc["psi"]).all()

    straits = cache.get("straits")
    assert {"bering", "drake", "itf"} <= set(straits)
    assert np.isfinite(straits["drake"]).all()

    bias = cache.get("sst_bias")     # synthetic WOA fallback climatology
    assert np.isfinite(bias["rms"])
    assert bias["bias"].shape == (grid.Ny, grid.Nx)

    ice = cache.get("ice")
    assert ice["extent_nh"].shape == (4,)
    assert np.all(ice["extent_nh"] > 0)

    from climaocean_tpu.analysis import render_figures
    paths = render_figures(outdir, grid=grid)
    names = {os.path.basename(p) for p in paths}
    assert {"scalars.png", "mld.png", "amoc_psi.png", "amoc_26n.png",
            "sst_bias.png", "sss_bias.png", "strait_transports.png",
            "ice_extent.png"} <= names
    for p in paths:
        assert os.path.getsize(p) > 1000


def test_analysis_cli(tmp_path):
    grid = make_grid()
    _write_parts(str(tmp_path), grid)
    from climaocean_tpu.analysis.__main__ import main
    main([str(tmp_path)])
    figs = os.listdir(os.path.join(str(tmp_path), "figures"))
    assert "scalars.png" in figs and "mld.png" in figs
