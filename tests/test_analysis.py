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
    zos = (0.1 * np.sin(np.deg2rad(2 * lat))[None]
           + 0.02 * rng.normal(size=(nt, ny, nx))) * wet
    surface = {
        "time": time, "iteration": np.arange(nt, dtype=np.int64),
        "tos": tos.astype(np.float32),
        "sos": (35.0 * np.ones((nt, ny, nx)) * wet).astype(np.float32),
        "zos": zos.astype(np.float32),
        "zossq": (zos ** 2).astype(np.float32),
        "uos": (0.1 * rng.normal(size=(nt, ny, nx)) * wet).astype(np.float32),
        "vos": (0.1 * rng.normal(size=(nt, ny, nx)) * wet).astype(np.float32),
        "tauuo": (1e-4 * np.cos(np.deg2rad(3 * lat))[None]
                  * np.ones((nt, 1, 1)) * wet).astype(np.float32),
        "tauvo": (1e-5 * np.ones((nt, ny, nx)) * wet).astype(np.float32),
        "hfds": (2e-5 * np.sin(np.deg2rad(lat))[None]
                 * np.ones((nt, 1, 1)) * wet).astype(np.float32),
        "wfo": (1e-7 * rng.normal(size=(nt, ny, nx)) * wet).astype(np.float32),
        "mlotst": (50.0 + 20 * rng.random((nt, ny, nx)) * wet).astype(np.float32),
        "siconc": (0.5 * np.ones((nt, 1, 1)) * (np.abs(lat)[None] > 65)
                   * wet).astype(np.float32),
        "sithick": (1.0 * np.ones((nt, 1, 1)) * (np.abs(lat)[None] > 65)
                    * wet).astype(np.float32),
    }
    np.savez_compressed(os.path.join(outdir, "omip_surface_part0.npz"), **surface)

    wet3 = np.asarray(grid.wet_c)[:, H:H + ny, H:H + nx]
    zc = np.asarray(grid.z_c)[:, None, None]
    v = 0.02 * rng.normal(size=(nt, nz, ny, nx)).astype(np.float32) * wet3
    u = 0.02 * rng.normal(size=(nt, nz, ny, nx)).astype(np.float32) * wet3
    dz = np.asarray(grid.dz_c)[:, None, None]
    dxcf = np.asarray(grid.dx_cf)[H:H + ny, H:H + nx]
    T3 = ((4.0 + 20.0 * np.exp(zc / 700.0)) * np.ones((nt, 1, ny, nx))
          + 0.01 * np.arange(nt)[:, None, None, None]) * wet3
    fields = {
        "time": time, "iteration": np.arange(nt, dtype=np.int64),
        "u": u, "v": v,
        "T": T3.astype(np.float32),
        "S": (35.0 * np.ones((nt, nz, ny, nx)) * wet3).astype(np.float32),
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


def test_extended_loaders(tmp_path):
    """Round-2 suite: SSH/stress/flux/current maps, profiles + drift,
    zonal means, seasonal ice/MLD climatologies, EUC, RAPID product —
    the reference's fig03-fig26 data layer."""
    grid = make_grid()
    outdir = str(tmp_path)
    _write_parts(outdir, grid)
    cache = CaseCache(outdir, grid=grid)

    ssh = cache.get("ssh")
    assert ssh["mean"].shape == (grid.Ny, grid.Nx)
    assert np.all(ssh["rms"] >= 0)

    ws = cache.get("wind_stress")
    assert ws["taux"].shape == (grid.Ny, grid.Nx)
    assert ws["taux_zonal"].shape == (grid.Ny,)
    # kinematic -> N/m² scaling by rho0
    assert np.nanmax(np.abs(ws["taux"])) > 1e-4

    fl = cache.get("fluxes")
    assert np.isfinite(fl["heat"][np.asarray(grid.wet_c[-1])[
        grid.H:grid.H + grid.Ny, grid.H:grid.H + grid.Nx] > 0]).all()

    cur = cache.get("currents")
    assert np.nanmax(cur["speed"]) > 0

    prof = cache.get("profiles")
    assert prof["T"].shape == (4, grid.Nz)
    # the fabricated T3 warms by 0.01/snapshot: drift must be monotone
    drift = prof["T"].mean(axis=1)
    assert np.all(np.diff(drift) > 0)

    zm = cache.get("zonal_mean")
    assert zm["T"].shape == (grid.Nz, grid.Ny)
    assert "mld_zonal" in zm

    euc = cache.get("euc")
    assert euc["u"].shape[0] == grid.Nz
    assert abs(euc["lat_section"]) < 5.0

    mlds = cache.get("mld_seasonal")
    assert mlds["winter_max"].shape == (grid.Ny, grid.Nx)

    clim = cache.get("ice_clim")
    assert clim["extent_nh"].shape == (12,)

    maps = cache.get("siconc_maps")
    assert int(maps["available"]) == 1

    rapid = cache.get("amoc_rapid")
    assert "index" in rapid and rapid["psi_z"].shape == (grid.Nz,)


def test_observation_overlays(tmp_path):
    """Staged observational baselines are picked up from <outdir>/obs and
    produce difference products (reference `common.jl:463-1059` baselines:
    ECCO SSH, NCEP stress, NSIDC, PIOMAS, RAPID)."""
    grid = make_grid()
    outdir = str(tmp_path)
    _write_parts(outdir, grid)
    obsdir = os.path.join(outdir, "obs")
    os.makedirs(obsdir)
    ny, nx = grid.Ny, grid.Nx
    np.savez(os.path.join(obsdir, "ecco_ssh.npz"), ssh=np.zeros((ny, nx)))
    np.savez(os.path.join(obsdir, "ncep_stress.npz"),
             taux=np.zeros((ny, nx)), tauy=np.zeros((ny, nx)))
    np.savez(os.path.join(obsdir, "rapid_moc.npz"),
             time=np.arange(4) * 30 * 86400.0, moc=17.0 * np.ones(4))
    np.savez(os.path.join(obsdir, "nsidc_extent.npz"),
             extent_nh=10 + np.zeros(12), extent_sh=8 + np.zeros(12))

    cache = CaseCache(outdir, grid=grid)
    assert "vs_ecco" in cache.get("ssh")
    assert "taux_vs_ncep" in cache.get("wind_stress")
    assert "rapid_moc" in cache.get("amoc_rapid")
    assert "nsidc_extent_extent_nh" in cache.get("ice_clim")

    from climaocean_tpu.analysis import render_figures
    paths = render_figures(outdir, grid=grid)
    names = {os.path.basename(p) for p in paths}
    assert {"ssh_mean.png", "ssh_rms.png", "ssh_vs_ecco.png",
            "wind_stress.png", "wind_stress_zonal.png", "surface_fluxes.png",
            "surface_currents.png", "drift.png", "profiles.png",
            "ts_drift_heatmap.png", "zonal_mean.png", "mld_zonal_mean.png",
            "mld_seasonal.png", "ice_extent_climatology.png",
            "siconc_seasonal.png", "equatorial_undercurrent.png",
            "amoc_rapid_index.png", "amoc_psi_z_26n.png",
            # r5 additions closing the 26-figure-suite gap: KE series
            # (fig15), sea-ice area series (fig13), seasonal zonal MLD
            # (fig20), zonal buoyancy drift (fig19)
            "ke.png", "ice_area.png", "mld_zonal_seasonal.png",
            "zonal_buoyancy_drift.png"} <= names
