"""Pallas BLOCK barotropic kernel parity (VERDICT r3 items 1+2).

The block kernel advances each deferred-fill block (k = (H−1)//2
substeps) of the padded XLA path in one VMEM-resident kernel, composing
with ANY halo fill between blocks — the single-device fills (incl. the
tripolar fold) and the shard_map ppermute exchange. Parity target: the
padded XLA path itself (`free_surface._substep_barotropic_padded`), which
the round-1/2 suites already pinned against the physics.

Runs in interpret mode on CPU (tests force the gate via env).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climaocean_tpu.core.halo import fill_halos
from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.grids.tripolar import tripolar_grid
from climaocean_tpu.models.free_surface import (BarotropicState,
                                                substep_barotropic)


def _latlon_grid():
    grid = latitude_longitude_grid((24, 16, 3), longitude=(0, 360),
                                   latitude=(-60, 60), z=(-3000.0, 0.0),
                                   halo=5)
    rng = np.random.default_rng(0)
    depth = -3000.0 + 500.0 * rng.random((grid.Ny, grid.Nx))
    depth[4:7, 6:10] = 10.0                     # an island
    return with_bottom_height(grid, depth, minimum_depth=20.0)


def _tripolar():
    grid = tripolar_grid((32, 12, 3), southernmost_latitude=-60.0, halo=5)
    rng = np.random.default_rng(1)
    depth = -3000.0 + 500.0 * rng.random((grid.Ny, grid.Nx))
    return with_bottom_height(grid, depth, minimum_depth=20.0)


def _random_state(grid, seed=2):
    rng = np.random.default_rng(seed)
    shp = (grid.Nyp, grid.Nxp)
    eta = jnp.asarray(rng.standard_normal(shp).astype(np.float32)) * 0.1
    U = jnp.asarray(rng.standard_normal(shp).astype(np.float32)) * 20.0
    V = jnp.asarray(rng.standard_normal(shp).astype(np.float32)) * 20.0
    GU = jnp.asarray(rng.standard_normal(shp).astype(np.float32)) * 1e-4
    GV = jnp.asarray(rng.standard_normal(shp).astype(np.float32)) * 1e-4
    return BarotropicState(eta, U, V), GU, GV


def _run(grid, bt, GU, GV, monkeypatch, block, substeps=12):
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_BAROTROPIC", "0")  # no window krn
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_BAROTROPIC_BLOCK",
                       "1" if block else "0")

    def fill2(a, location="c", vector=False):
        return fill_halos(a, grid, location, vector)

    avg, fin = substep_barotropic(
        bt, grid, GU, GV, dt_stage=600.0, substeps=substeps,
        fill_halos_2d=lambda a: fill2(a),
        fill_U=lambda a: fill2(a, "u", True),
        fill_V=lambda a: fill2(a, "v", True))
    return avg, fin


def _assert_close(a, b, grid, tol=2e-5):
    H = grid.H
    for name in a._fields:
        x = np.asarray(getattr(a, name))[..., H:H + grid.Ny, H:H + grid.Nx]
        y = np.asarray(getattr(b, name))[..., H:H + grid.Ny, H:H + grid.Nx]
        scale = max(np.abs(y).max(), 1e-6)
        np.testing.assert_allclose(x, y, atol=tol * scale, err_msg=name)


@pytest.mark.parametrize("make_grid", [_latlon_grid, _tripolar],
                         ids=["latlon", "tripolar"])
def test_block_kernel_matches_padded_path(make_grid, monkeypatch):
    grid = make_grid()
    bt, GU, GV = _random_state(grid)
    avg_ref, fin_ref = _run(grid, bt, GU, GV, monkeypatch, block=False)
    avg_blk, fin_blk = _run(grid, bt, GU, GV, monkeypatch, block=True)
    _assert_close(avg_blk, avg_ref, grid)
    _assert_close(fin_blk, fin_ref, grid)


def test_slab_split_is_exact(monkeypatch):
    """y-slab decomposition (for VMEM-oversize tiles) returns bit-identical
    interiors: ghost rows recompute the same fp ops on the same values."""
    from climaocean_tpu.models.pallas_barotropic import barotropic_block_pallas

    grid = _latlon_grid()
    bt, GU, GV = _random_state(grid, seed=5)
    rng = np.random.default_rng(7)
    shp = (grid.Nyp, grid.Nxp)

    def r():
        return jnp.asarray(rng.standard_normal(shp).astype(np.float32))

    state = (bt.eta, bt.U, bt.V, r() * 0, r() * 0, r() * 0, r() * 0, r() * 0)
    coeffs = tuple(0.01 * r() for _ in range(7))
    we = jnp.asarray(np.linspace(0.1, 0.2, 2).astype(np.float32))
    one = barotropic_block_pallas(state, coeffs, we, 2, 12, n_slabs=1)
    two = barotropic_block_pallas(state, coeffs, we, 2, 12, n_slabs=2)
    four = barotropic_block_pallas(state, coeffs, we, 2, 12, n_slabs=4)
    for a, b, c in zip(one, two, four):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_block_kernel_under_shard_map(monkeypatch):
    """The block kernel composes with the ppermute exchange: a sharded
    ocean step with the block kernel forced matches the single-device
    step (the fills between blocks are the ICI exchange)."""
    from climaocean_tpu.models.hydrostatic import HydrostaticModel
    from climaocean_tpu.models import hydrostatic as hm
    from climaocean_tpu.models.hydrostatic import SurfaceFluxes
    from climaocean_tpu.parallel.mesh import make_mesh
    from climaocean_tpu.parallel.shard import make_sharded_step_fn

    if len(jax.devices()) < 4:
        pytest.skip("needs the faked multi-device mesh")
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_BAROTROPIC", "0")
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_BAROTROPIC_BLOCK", "1")

    grid = _latlon_grid()
    model = HydrostaticModel(grid=grid, substeps=8)
    state = model.initial_state()
    rng = np.random.default_rng(3)
    state["T"] = state["T"] + jnp.asarray(
        rng.standard_normal(state["T"].shape).astype(np.float32)) \
        * grid.wet_c
    fluxes = SurfaceFluxes.zeros(grid)

    ref = hm.step(model, state, fluxes, 600.0)

    mesh = make_mesh(shape=(2, 2), devices=jax.devices()[:4])
    step_fn, part, unpart = make_sharded_step_fn(model, mesh)
    out = unpart(step_fn(part(state), part(fluxes), 600.0))

    H = grid.H
    for k in ("eta", "u", "v", "T"):
        a = np.asarray(ref[k])[..., H:H + grid.Ny, H:H + grid.Nx]
        b = np.asarray(out[k])[..., H:H + grid.Ny, H:H + grid.Nx]
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=5e-5 * scale, err_msg=k)


def test_omip_protocol_distributed_with_block_kernels(monkeypatch, tmp_path):
    """VERDICT r3 item 1 'Done' condition: the production composition
    `omip_simulation(..., partition=(Py, Px))` runs the BLOCK kernels per
    tile (interpret mode on the CPU mesh) — barotropic and EVP — and
    matches the single-device run with the same kernels."""
    from climaocean_tpu.configurations.omip import omip_simulation

    if len(jax.devices()) < 8:
        pytest.skip("needs the faked 8-device mesh")
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_BAROTROPIC", "0")
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_EVP", "0")
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_BAROTROPIC_BLOCK", "1")
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_EVP_BLOCK", "1")

    def build(partition):
        return omip_simulation(
            "latlon", dt=1800.0, stop_iteration=8, with_sea_ice=True,
            sea_ice_dynamics=True, diagnostics=False, partition=partition,
            steps_per_dispatch=4, progress_interval=1000, resolution=15.0,
            Nz=4, depth=3000.0, free_surface_substeps=8)

    sim1 = build(None)
    sim1.run()
    sim8 = build((2, 4))
    sim8.run()

    grid = sim1.model.ocean.grid
    g1 = sim1.state
    g8 = sim8.callback_view.state

    def cut(a):
        return np.asarray(grid.interior(a))

    for name in ("T", "S", "u", "v", "eta"):
        a, b = cut(g1["ocean"][name]), cut(g8["ocean"][name])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() / scale < 2e-4, \
            f"ocean {name}: {np.abs(a - b).max() / scale:.2e}"
    for name in ("thickness", "concentration", "u", "v"):
        a, b = cut(g1["sea_ice"][name]), cut(g8["sea_ice"][name])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() / scale < 2e-4, \
            f"ice {name}: {np.abs(a - b).max() / scale:.2e}"
