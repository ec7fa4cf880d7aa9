"""Tripolar grid: geometry, fold consistency, rest-state dynamics."""

import jax
import jax.numpy as jnp
import numpy as np

from climaocean_tpu.grids.grid import fold_center_map, with_bottom_height
from climaocean_tpu.grids.tripolar import fill_halos_tripolar, tripolar_grid


def small_grid():
    return tripolar_grid((36, 18, 4), southernmost_latitude=-80, halo=4,
                         z=(-3000.0, 0.0))


def test_geometry():
    grid = small_grid()
    H = grid.H
    assert grid.kind.startswith("tripolar:")
    lat = np.asarray(grid.lat_cc)[H:H + 18]
    assert lat.min() > -80.5 and lat.max() < 90.0
    for loc in ("cc", "fc", "cf", "ff"):
        assert float(getattr(grid, f"dx_{loc}").min()) > 0
        assert float(getattr(grid, f"dy_{loc}").min()) > 0


def test_fold_geometric_consistency():
    grid = small_grid()
    H = grid.H
    lon = np.asarray(grid.lon_cc)
    lat = np.asarray(grid.lat_cc)
    cmap = fold_center_map(grid.kind, grid.Nx, H)
    # ghost center row H+Ny must coincide with mirrored interior row H+Ny-1
    dlon = np.abs((lon[H + 18] - lon[H + 17][cmap] + 180) % 360 - 180)
    assert dlon[H:H + 36].max() < 1e-6
    assert np.abs(lat[H + 18] - lat[H + 17][cmap])[H:H + 36].max() < 1e-6


def test_fold_halo_fill_scalar_and_vector():
    grid = small_grid()
    H = grid.H
    lon = np.asarray(grid.lon_cc)
    lat = np.asarray(grid.lat_cc)
    f = jnp.asarray(np.broadcast_to(
        np.cos(np.deg2rad(lon)) * np.cos(np.deg2rad(lat)),
        (4, grid.Nyp, grid.Nxp)).copy())

    @jax.jit
    def fill_c(a):
        return fill_halos_tripolar(a, grid, "c")

    ff = np.asarray(fill_c(f))
    cmap = fold_center_map(grid.kind, grid.Nx, H)
    err = np.abs(ff[0, H + 18, H:H + 36] - np.asarray(f)[0, H + 17, cmap][H:H + 36])
    assert err.max() < 1e-6

    # vector fill flips sign
    @jax.jit
    def fill_u(a):
        return fill_halos_tripolar(a, grid, "u", -1.0)

    fu = np.asarray(fill_u(f))
    # ghost = -mirror for u (x-faces use the face map; just check sign change
    # happened: values negated relative to some interior row)
    assert not np.allclose(fu[0, H + 18], ff[0, H + 18])


def test_rest_state_preserved():
    from climaocean_tpu.data.synthetic import synthetic_bathymetry
    from climaocean_tpu.models import hydrostatic as hm
    from climaocean_tpu.models.hydrostatic import HydrostaticModel, SurfaceFluxes

    grid = small_grid()
    H = grid.H
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat), -0.1),
                              minimum_depth=10)
    model = HydrostaticModel(grid=grid, substeps=8)
    state = model.initial_state()
    zc = np.asarray(grid.z_c)
    state["T"] = state["T"] + jnp.asarray(15 + 10 * np.exp(zc / 700.0))[:, None, None]
    fluxes = SurfaceFluxes.zeros(grid)
    step = jax.jit(lambda s: hm.step(model, s, fluxes, 1800.0))
    s = step(step(state))
    assert float(jnp.abs(s["u"]).max()) == 0.0
    assert float(jnp.abs(s["eta"]).max()) == 0.0


def test_fold_alignment_px():
    """fold_alignment_px snaps the pole column so the distributed fold
    (parallel.shard) works on x-meshes up to the requested width."""
    from climaocean_tpu.parallel.shard import _fold_params

    g = tripolar_grid((360, 30, 2), fold_alignment_px=8)
    p = int(g.kind.split(":")[1])
    for px in (2, 4, 8):
        fp = _fold_params(g, px)
        assert fp == (p, 360 // px)


def test_supergrid_roundtrip():
    """tripolar_grid_from_supergrid rebuilds the analytic grid exactly from
    its exported one-period lattice (the ORCA .npz mesh path), including
    pole-column inference from the seam's fold symmetry."""
    import dataclasses

    import numpy as np

    from climaocean_tpu.grids.tripolar import (tripolar_grid,
                                               tripolar_grid_from_supergrid)

    kw = dict(southernmost_latitude=-78, halo=4, z=(-2000.0, 0.0))
    lon_p, lat_p, p = tripolar_grid((36, 18, 3), _return_lattice=True, **kw)
    g_ref = tripolar_grid((36, 18, 3), **kw)

    H, Ny = 4, 18
    sg_rows = slice(2 * H, 2 * H + 2 * Ny + 1)
    g_file = tripolar_grid_from_supergrid(lon_p[sg_rows], lat_p[sg_rows], 3,
                                          z=(-2000.0, 0.0), halo=4)
    # p is inferred up to the two-pole degeneracy: p and p+Nx/2 generate
    # the SAME fold map (it only uses 2p mod Nx)
    p_file = int(g_file.kind.split(":")[1])
    p_ref = int(g_ref.kind.split(":")[1])
    assert (2 * (p_file - p_ref)) % 36 == 0
    for f in dataclasses.fields(g_ref):
        a, b = getattr(g_ref, f.name), getattr(g_file, f.name)
        if hasattr(a, "shape"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f.name)


def test_orca_npz_mesh(tmp_path):
    """ORCAGrid loads an .npz supergrid mesh + bathymetry when present."""
    import numpy as np

    from climaocean_tpu.configurations.orca import ORCAGrid
    from climaocean_tpu.grids.tripolar import tripolar_grid

    lon_p, lat_p, p = tripolar_grid((36, 18, 3), southernmost_latitude=-78,
                                    halo=4, _return_lattice=True)
    H, Ny, Nx = 4, 18, 36
    rows = slice(2 * H, 2 * H + 2 * Ny + 1)
    rng = np.random.default_rng(0)
    bottom = -3000.0 + 100.0 * rng.random((Ny, Nx))
    np.savez(tmp_path / "orca1_mesh.npz", lon=lon_p[rows], lat=lat_p[rows],
             p=p, bottom_height=bottom)
    g = ORCAGrid(Nz=3, depth=2000.0, dir=str(tmp_path))
    assert g.kind == f"tripolar:{p}"
    assert g.Nx == Nx and g.Ny == Ny
    # bathymetry applied (some wet cells, pole caps dry)
    assert float(np.asarray(g.wet_c).sum()) > 0
