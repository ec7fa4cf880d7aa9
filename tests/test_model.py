"""Model-tier tests: rest state, wind-driven spin-up, coupled step, sea ice,
multi-device sharding (the construct-and-step smoke tier of the reference's
test pyramid, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climaocean_tpu.closures.scalar_diffusivity import (
    ConvectiveAdjustmentVerticalDiffusivity, VerticalScalarDiffusivity)
from climaocean_tpu.data.synthetic import (synthetic_bathymetry,
                                           synthetic_temperature)
from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.models import hydrostatic as hm
from climaocean_tpu.models.hydrostatic import HydrostaticModel, SurfaceFluxes


def make_grid(nx=24, ny=14, nz=5):
    grid = latitude_longitude_grid((nx, ny, nz), longitude=(-180, 180),
                                   latitude=(-65, 65), z=(-3000.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    return with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat), -0.1),
                              minimum_depth=10)


def stratified_state(model):
    grid = model.grid
    state = model.initial_state()
    zc = np.asarray(grid.z_c)
    state["T"] = state["T"] + jnp.asarray(15 + 10 * np.exp(zc / 700.0))[:, None, None]
    return state


def test_ocean_at_rest_stays_at_rest():
    grid = make_grid()
    model = HydrostaticModel(
        grid=grid, substeps=8,
        closures=(ConvectiveAdjustmentVerticalDiffusivity(),
                  VerticalScalarDiffusivity(nu=1e-4, kappa=1e-5)))
    state = stratified_state(model)
    fluxes = SurfaceFluxes.zeros(grid)
    step = jax.jit(lambda s: hm.step(model, s, fluxes, 1800.0))
    s = state
    for _ in range(3):
        s = step(s)
    assert float(jnp.abs(s["u"]).max()) == 0.0
    assert float(jnp.abs(s["v"]).max()) == 0.0
    assert float(jnp.abs(s["eta"]).max()) == 0.0


def test_wind_driven_spinup_physical():
    grid = make_grid()
    model = HydrostaticModel(
        grid=grid, substeps=8,
        closures=(ConvectiveAdjustmentVerticalDiffusivity(),
                  VerticalScalarDiffusivity(nu=1e-4, kappa=1e-5)))
    state = stratified_state(model)
    tau = 1e-4 * np.cos(np.asarray(grid.lat_cc) * np.pi / 65.0)
    fluxes = SurfaceFluxes.zeros(grid)._replace(
        tau_x=jnp.asarray(tau.astype(np.float32)))
    step = jax.jit(lambda s: hm.step(model, s, fluxes, 1800.0))
    s = state
    for _ in range(10):
        s = step(s)
    umax = float(jnp.abs(s["u"]).max())
    assert 0.0 < umax < 0.5
    assert not any(bool(jnp.isnan(v).any()) for v in s.values())
    # volume-mean eta conserved up to f32 roundoff accumulation in the
    # substep divergence (~1e-7 per substep; the reference tracks the same
    # Boussinesq drift via its `zosga` diagnostic, omip_diagnostics.jl:195)
    wet2 = grid.wet_c[-1]
    mean_eta = float(jnp.sum(s["eta"] * grid.az_cc * wet2)
                     / jnp.sum(grid.az_cc * wet2))
    eta_scale = float(jnp.abs(s["eta"]).max())
    assert abs(mean_eta) < max(2e-2 * eta_scale, 1e-6)


def test_tracer_conservation_under_advection():
    """Advection + implicit diffusion conserve total tracer (closed basin,
    no fluxes)."""
    grid = make_grid()
    model = HydrostaticModel(grid=grid, substeps=8, closures=())
    state = stratified_state(model)
    rng = np.random.default_rng(0)
    u0 = 0.05 * rng.normal(size=grid.padded_shape).astype(np.float32)
    state["u"] = jnp.asarray(u0) * grid.wet_u
    fluxes = SurfaceFluxes.zeros(grid)
    vol = grid.az_cc * grid.dz_c[:, None, None] * grid.wet_c

    def total(s):
        return float(jnp.sum(grid.interior(s["T"] * vol)))

    step = jax.jit(lambda s: hm.step(model, s, fluxes, 900.0))
    t0 = total(state)
    s = state
    for _ in range(5):
        s = step(s)
    t1 = total(s)
    assert abs(t1 - t0) / abs(t0) < 2e-5


def test_coupled_with_sea_ice_steps():
    from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere
    from climaocean_tpu.models.coupled import OceanSeaIceModel, make_coupled_step_fn
    from climaocean_tpu.models.sea_ice import SeaIceModel

    grid = latitude_longitude_grid((24, 14, 4), longitude=(-180, 180),
                                   latitude=(-80, 80), z=(-2000.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat), -0.1),
                              minimum_depth=10)
    ocean = HydrostaticModel(grid=grid, substeps=8)
    ice = SeaIceModel(grid=grid, dynamics=True, substeps=20)
    atmos = synthetic_prescribed_atmosphere(grid, 0.0, 86400.0)
    model = OceanSeaIceModel(ocean=ocean, atmosphere=atmos, sea_ice=ice)
    state = model.initial_state()
    zc = np.asarray(grid.z_c)
    H = grid.H
    Tp = np.zeros(grid.padded_shape, np.float32)
    Tp[:, H:H + 14, H:H + 24] = synthetic_temperature(lon[None], lat[None],
                                                      zc[:, None, None])
    state["ocean"]["T"] = jnp.asarray(Tp)
    hi = np.zeros((grid.Nyp, grid.Nxp), np.float32)
    hi[np.asarray(grid.lat_cc) > 72] = 1.5
    state["sea_ice"]["thickness"] = jnp.asarray(hi)
    state["sea_ice"]["concentration"] = jnp.asarray((hi > 0).astype(np.float32))

    step = make_coupled_step_fn(model, donate=False)
    s = state
    for i in range(3):
        s = step(s, i * 1800.0, 1800.0)
    leaves = jax.tree_util.tree_leaves(s)
    assert not any(bool(jnp.isnan(l).any()) for l in leaves)
    assert float(s["sea_ice"]["thickness"].max()) < 20.0


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device")
def test_sharded_coupled_step():
    from climaocean_tpu.parallel.mesh import make_mesh, shard_tree
    from climaocean_tpu.models.coupled import coupled_step, OceanSeaIceModel
    from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere

    grid = make_grid(32, 16, 4)
    ocean = HydrostaticModel(grid=grid, substeps=6)
    atmos = synthetic_prescribed_atmosphere(grid, 0.0, 86400.0)
    model = OceanSeaIceModel(ocean=ocean, atmosphere=atmos)
    state = model.initial_state()

    mesh = make_mesh(devices=jax.devices()[:4])
    model = shard_tree(model, mesh)
    state = shard_tree(state, mesh)
    out = jax.jit(lambda m, s: coupled_step(m, s, 0.0, 600.0))(model, state)
    jax.block_until_ready(out)
    assert not bool(jnp.isnan(out["ocean"]["T"]).any())


def test_column_frazil_limits_supercooling():
    """Sub-freezing water ANYWHERE in the column is restored to the
    freezing point and the heat deficit becomes new surface ice (reference:
    ClimaSeaIce frazil coupling). Guards the 1-degree rim-cell runaway
    (T drifted to -21 C with only the top-cell supercool term)."""
    from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere
    from climaocean_tpu.models.coupled import OceanSeaIceModel, make_coupled_step_fn
    from climaocean_tpu.models.sea_ice import SeaIceModel, freezing_temperature

    grid = make_grid(16, 8, 6)
    ocean = HydrostaticModel(grid=grid, substeps=6)
    ice = SeaIceModel(grid=grid, dynamics=False)
    atmos = synthetic_prescribed_atmosphere(grid, 0.0, 86400.0)
    model = OceanSeaIceModel(ocean=ocean, atmosphere=atmos, sea_ice=ice)
    state = model.initial_state()
    # supercool an interior cell (k = Nz-3) well below freezing
    T = np.zeros(grid.padded_shape, np.float32) + 2.0
    T[grid.Nz - 3, :, :] = -10.0
    state["ocean"]["T"] = jnp.asarray(T)

    step = make_coupled_step_fn(model, donate=False)
    s = step(state, 0.0, 600.0)
    Tn = np.asarray(s["ocean"]["T"])
    Sf = np.asarray(freezing_temperature(s["ocean"]["S"]))
    wet = np.asarray(grid.wet_c) > 0
    assert (Tn[wet] >= Sf[wet] - 1e-3).all(), "supercooling survived"
    # the deficit became ice
    assert float(s["sea_ice"]["thickness"].max()) > 0.5
