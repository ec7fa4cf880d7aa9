"""shard_map + ppermute halo-exchange distribution tests (requires the
faked 8-device CPU mesh from conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def build():
    from climaocean_tpu.closures.catke import CATKEVerticalDiffusivity
    from climaocean_tpu.closures.scalar_diffusivity import VerticalScalarDiffusivity
    from climaocean_tpu.data.synthetic import (synthetic_bathymetry,
                                               synthetic_temperature)
    from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
    from climaocean_tpu.models.hydrostatic import HydrostaticModel, SurfaceFluxes

    grid = latitude_longitude_grid((48, 16, 5), longitude=(-180, 180),
                                   latitude=(-64, 64), z=(-3000.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat), -0.1),
                              minimum_depth=10)
    model = HydrostaticModel(
        grid=grid, substeps=8,
        closures=(CATKEVerticalDiffusivity(),
                  VerticalScalarDiffusivity(nu=1e-4, kappa=1e-5)))
    state = model.initial_state()
    zc = np.asarray(grid.z_c)
    H = grid.H
    Tp = np.zeros(grid.padded_shape, np.float32)
    Tp[:, H:H + 16, H:H + 48] = synthetic_temperature(lon[None], lat[None],
                                                      zc[:, None, None])
    state["T"] = jnp.asarray(Tp)
    tau = (1e-4 * np.cos(np.deg2rad(np.asarray(grid.lat_cc)) * 1.5)).astype(np.float32)
    fluxes = SurfaceFluxes.zeros(grid)._replace(tau_x=jnp.asarray(tau))
    return grid, model, state, fluxes


def test_halo_exchange_matches_global_fill():
    from jax.sharding import PartitionSpec as P
    from climaocean_tpu.core.halo import fill_halos
    from climaocean_tpu.parallel.mesh import make_mesh
    from climaocean_tpu.parallel.shard import halo_exchange, partition_array

    from climaocean_tpu.utils.compat import shard_map

    from climaocean_tpu.grids.grid import latitude_longitude_grid

    grid = latitude_longitude_grid((48, 16, 3), longitude=(-180, 180),
                                   latitude=(-64, 64), z=(-1000.0, 0.0), halo=4)
    H = grid.H
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(3, grid.Nyp, grid.Nxp)).astype(np.float32))
    a_true = fill_halos(a, grid)
    mesh = make_mesh((2, 4))
    ast = partition_array(a, grid, 2, 4)
    ex = shard_map(
        lambda t: halo_exchange(t[0], H, periodic_x=True, periodic_y=False)[None],
        mesh=mesh, in_specs=P(("y", "x")), out_specs=P(("y", "x")),
        )(ast)
    ny_loc, nx_loc = 8, 12
    idx = 0
    for j in range(2):
        for i in range(4):
            y0, x0 = j * ny_loc, i * nx_loc
            truth = np.asarray(a_true[:, y0:y0 + ny_loc + 2 * H,
                                      x0:x0 + nx_loc + 2 * H])
            np.testing.assert_allclose(np.asarray(ex[idx]), truth, atol=1e-6)
            idx += 1


def test_sharded_step_matches_single_device():
    from climaocean_tpu.models import hydrostatic as hm
    from climaocean_tpu.parallel.mesh import make_mesh
    from climaocean_tpu.parallel.shard import make_sharded_step_fn

    grid, model, state, fluxes = build()
    step1 = jax.jit(lambda s: hm.step(model, s, fluxes, 900.0))
    s_ref = step1(step1(state))

    mesh = make_mesh((2, 4))
    step_s, part, unpart = make_sharded_step_fn(model, mesh, donate=False)
    s_sh = part(state)
    f_sh = part(fluxes)
    s_sh = step_s(step_s(s_sh, f_sh, 900.0), f_sh, 900.0)
    s_back = unpart(s_sh)

    for k in ("u", "v", "T", "eta"):
        a = np.asarray(grid.interior(s_ref[k]))
        b = np.asarray(grid.interior(s_back[k]))
        scale = max(float(np.abs(a).max()), 1e-10)
        assert np.abs(a - b).max() / scale < 1e-5, k


def test_fold_exchange_matches_tripolar_fill():
    """Distributed northern-fold exchange (ppermute along x among the top
    device row + local flip) vs the single-device tripolar fill, for all
    locations and both vector signs."""
    from jax.sharding import PartitionSpec as P
    from climaocean_tpu.grids.tripolar import (fill_halos_tripolar,
                                               tripolar_grid)
    from climaocean_tpu.parallel.mesh import make_mesh
    from climaocean_tpu.parallel.shard import (_fold_params, halo_exchange,
                                               partition_array)
    from climaocean_tpu.utils.compat import shard_map

    # first_pole_longitude=45 → pole face column p=20 for Nx=32, and
    # nx_loc=8 divides 2p=40 (the distributed-fold alignment condition)
    grid = tripolar_grid((32, 16, 3), southernmost_latitude=-80, halo=4,
                         first_pole_longitude=45.0)
    H = grid.H
    py, px = 2, 4
    mesh = make_mesh((py, px))
    fold = _fold_params(grid, px)
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(3, grid.Nyp, grid.Nxp))
                    .astype(np.float32))
    ast = partition_array(a, grid, py, px)
    ny_loc, nx_loc = grid.Ny // py, grid.Nx // px

    for loc, sign in (("c", 1.0), ("u", -1.0), ("v", -1.0), ("c", -1.0)):
        truth = fill_halos_tripolar(a, grid, loc, sign)
        ex = shard_map(
            lambda t: halo_exchange(t[0], H, periodic_x=True,
                                    periodic_y=False, fold=fold,
                                    location=loc, fold_sign=sign)[None],
            mesh=mesh, in_specs=P(("y", "x")), out_specs=P(("y", "x")))(ast)
        idx = 0
        for j in range(py):
            for i in range(px):
                y0, x0 = j * ny_loc, i * nx_loc
                want = np.asarray(truth[:, y0:y0 + ny_loc + 2 * H,
                                        x0:x0 + nx_loc + 2 * H])
                got = np.asarray(ex[idx])
                # u-location: the outermost west halo column of the fold
                # rows wraps off-tile; the repair x-pass fills it from the
                # neighbor's post-fold rows, equivalent to the global map
                np.testing.assert_allclose(got, want, atol=1e-6,
                                           err_msg=f"{loc} tile {j},{i}")
                idx += 1


def test_sharded_tripolar_step_matches_single_device():
    """Ocean step on a TRIPOLAR grid under shard_map — the northern fold
    rides the ppermute exchange — vs the single-device step."""
    from climaocean_tpu.closures.catke import CATKEVerticalDiffusivity
    from climaocean_tpu.grids.tripolar import tripolar_grid
    from climaocean_tpu.models import hydrostatic as hm
    from climaocean_tpu.models.hydrostatic import (HydrostaticModel,
                                                   SurfaceFluxes)
    from climaocean_tpu.parallel.mesh import make_mesh
    from climaocean_tpu.parallel.shard import make_sharded_step_fn

    grid = tripolar_grid((32, 16, 4), southernmost_latitude=-78, halo=4,
                         first_pole_longitude=45.0, z=(-2000.0, 0.0))
    model = HydrostaticModel(grid=grid, substeps=8,
                             closures=(CATKEVerticalDiffusivity(),))
    state = model.initial_state()
    rng = np.random.default_rng(11)
    H = grid.H
    Tp = np.full(grid.padded_shape, 10.0, np.float32)
    Tp[:, H:H + grid.Ny, H:H + grid.Nx] += rng.uniform(
        -2, 2, (grid.Nz, grid.Ny, grid.Nx))
    state["T"] = jnp.asarray(Tp)
    tau = (5e-5 * np.cos(np.deg2rad(np.asarray(grid.lat_cc)))).astype(
        np.float32)
    fluxes = SurfaceFluxes.zeros(grid)._replace(tau_x=jnp.asarray(tau))

    step1 = jax.jit(lambda s: hm.step(model, s, fluxes, 600.0))
    s_ref = step1(step1(state))

    mesh = make_mesh((2, 4))
    step_s, part, unpart = make_sharded_step_fn(model, mesh, donate=False)
    f_sh = part(fluxes)
    s_sh = step_s(step_s(part(state), f_sh, 600.0), f_sh, 600.0)
    s_back = unpart(s_sh)

    for k in ("u", "v", "T", "eta"):
        a = np.asarray(grid.interior(s_ref[k]))
        b = np.asarray(grid.interior(s_back[k]))
        scale = max(float(np.abs(a).max()), 1e-10)
        assert np.abs(a - b).max() / scale < 2e-5, k


def test_sharded_coupled_step_matches_single_device():
    """FULL coupled step (atmosphere interp + bulk fluxes + EVP sea ice +
    ocean) under shard_map/ppermute vs the single-device step."""
    from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere
    from climaocean_tpu.models.coupled import OceanSeaIceModel, coupled_step
    from climaocean_tpu.models.sea_ice import SeaIceModel
    from climaocean_tpu.parallel.mesh import make_mesh
    from climaocean_tpu.parallel.shard import make_sharded_coupled_step_fn

    grid, ocean, state_o, _ = build()
    ice = SeaIceModel(grid=grid, dynamics=True, substeps=10)
    atmos = synthetic_prescribed_atmosphere(grid, 0.0, 86400.0)
    model = OceanSeaIceModel(ocean=ocean, atmosphere=atmos, sea_ice=ice)
    state = model.initial_state()
    state["ocean"] = state_o
    hi = np.zeros((grid.Nyp, grid.Nxp), np.float32)
    hi[np.asarray(grid.lat_cc) > 55] = 1.2
    state["sea_ice"]["thickness"] = jnp.asarray(hi)
    state["sea_ice"]["concentration"] = jnp.asarray(
        (hi > 0).astype(np.float32) * 0.9)

    step1 = jax.jit(lambda s, t: coupled_step(model, s, t, 900.0))
    s_ref = step1(step1(state, 0.0), 900.0)

    mesh = make_mesh((2, 4))
    step_s, part, unpart = make_sharded_coupled_step_fn(model, mesh,
                                                        donate=False)
    s_sh = step_s(step_s(part(state), 0.0, 900.0), 900.0, 900.0)
    s_back = unpart(s_sh)

    for k in ("u", "v", "T", "eta"):
        a = np.asarray(grid.interior(s_ref["ocean"][k]))
        b = np.asarray(grid.interior(s_back["ocean"][k]))
        scale = max(float(np.abs(a).max()), 1e-10)
        assert np.abs(a - b).max() / scale < 1e-5, f"ocean {k}"
    for k in ("thickness", "concentration", "u", "v"):
        a = np.asarray(grid.interior(s_ref["sea_ice"][k]))
        b = np.asarray(grid.interior(s_back["sea_ice"][k]))
        scale = max(float(np.abs(a).max()), 1e-10)
        assert np.abs(a - b).max() / scale < 1e-5, f"ice {k}"


def test_sharded_tripolar_coupled_matches_single_device():
    """Coupled step (bulk fluxes + EVP ice + ocean) on a TRIPOLAR grid
    under shard_map — ice rides the fold ppermute too."""
    from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere
    from climaocean_tpu.grids.tripolar import tripolar_grid
    from climaocean_tpu.models.coupled import OceanSeaIceModel, coupled_step
    from climaocean_tpu.models.hydrostatic import HydrostaticModel
    from climaocean_tpu.models.sea_ice import SeaIceModel
    from climaocean_tpu.parallel.mesh import make_mesh
    from climaocean_tpu.parallel.shard import make_sharded_coupled_step_fn

    grid = tripolar_grid((32, 16, 4), southernmost_latitude=-78, halo=4,
                         first_pole_longitude=45.0, z=(-2000.0, 0.0))
    ocean = HydrostaticModel(grid=grid, substeps=6)
    ice = SeaIceModel(grid=grid, dynamics=True, substeps=8)
    atmos = synthetic_prescribed_atmosphere(grid, 0.0, 86400.0)
    model = OceanSeaIceModel(ocean=ocean, atmosphere=atmos, sea_ice=ice)
    state = model.initial_state()
    state["ocean"]["T"] = state["ocean"]["T"] * 0 - 1.0
    hi = np.zeros((grid.Nyp, grid.Nxp), np.float32)
    hi[np.asarray(grid.lat_cc) > 60] = 1.0      # ice over the fold
    state["sea_ice"]["thickness"] = jnp.asarray(hi)
    state["sea_ice"]["concentration"] = jnp.asarray(
        (hi > 0).astype(np.float32) * 0.8)

    step1 = jax.jit(lambda s, t: coupled_step(model, s, t, 600.0))
    s_ref = step1(step1(state, 0.0), 600.0)

    mesh = make_mesh((2, 4))
    step_s, part, unpart = make_sharded_coupled_step_fn(model, mesh,
                                                        donate=False)
    s_back = unpart(step_s(step_s(part(state), 0.0, 600.0), 600.0, 600.0))

    for k in ("u", "v", "T", "eta"):
        a = np.asarray(grid.interior(s_ref["ocean"][k]))
        b = np.asarray(grid.interior(s_back["ocean"][k]))
        scale = max(float(np.abs(a).max()), 1e-10)
        assert np.abs(a - b).max() / scale < 2e-5, f"ocean {k}"
    for k in ("thickness", "u", "v"):
        a = np.asarray(grid.interior(s_ref["sea_ice"][k]))
        b = np.asarray(grid.interior(s_back["sea_ice"][k]))
        scale = max(float(np.abs(a).max()), 1e-10)
        assert np.abs(a - b).max() / scale < 2e-5, f"ice {k}"
