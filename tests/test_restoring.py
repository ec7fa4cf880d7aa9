"""Dataset / surface-flux restoring forcings."""

import jax
import jax.numpy as jnp
import numpy as np

from climaocean_tpu.data.restoring import DatasetRestoring, SurfaceFluxRestoring
from climaocean_tpu.grids.grid import latitude_longitude_grid
from climaocean_tpu.models import hydrostatic as hm
from climaocean_tpu.models.hydrostatic import HydrostaticModel, SurfaceFluxes
from climaocean_tpu.utils.units import days


def test_dataset_restoring_pulls_toward_target():
    grid = latitude_longitude_grid((16, 8, 4), z=(-400.0, 0.0), halo=4)
    target = jnp.full(grid.padded_shape, 10.0)
    restoring = DatasetRestoring(target=target, rate=1.0 / days, tracer="T")
    model = HydrostaticModel(grid=grid, closures=(restoring,), substeps=6)
    state = model.initial_state()
    state["T"] = state["T"] + 20.0
    fluxes = SurfaceFluxes.zeros(grid)
    step = jax.jit(lambda s: hm.step(model, s, fluxes, 3600.0))
    s = state
    for _ in range(24):                      # one day at 1/day rate
        s = step(s)
    H = grid.H
    T = float(s["T"][2, H + 4, H + 8])
    # T should decay toward 10 with e-folding 1 day: 10 + 10/e ≈ 13.7
    assert 12.5 < T < 15.0


def test_surface_flux_restoring_only_touches_top_cell():
    grid = latitude_longitude_grid((16, 8, 4), z=(-400.0, 0.0), halo=4)
    target = jnp.full((grid.Nyp, grid.Nxp), 30.0)
    restoring = SurfaceFluxRestoring(target_surface=target,
                                     piston_velocity=10.0, tracer="S")
    model = HydrostaticModel(grid=grid, closures=(restoring,), substeps=6)
    state = model.initial_state()        # S = 35 everywhere
    fluxes = SurfaceFluxes.zeros(grid)
    step = jax.jit(lambda s: hm.step(model, s, fluxes, 3600.0))
    s = step(state)
    H = grid.H
    S = np.asarray(s["S"][:, H + 4, H + 8])
    assert S[-1] < 35.0                  # surface freshens toward 30
    np.testing.assert_allclose(S[:-1], 35.0, atol=1e-5)  # interior untouched


def test_omip_with_salinity_restoring_builds():
    from climaocean_tpu.configurations.omip import omip_simulation
    sim = omip_simulation("latlon", dt=1800.0, stop_iteration=2,
                          with_sea_ice=False, diagnostics=False,
                          salinity_restoring=True,
                          resolution=15.0, Nz=5, depth=3000.0)
    sim.run()
    leaves = jax.tree_util.tree_leaves(sim.state)
    assert not any(bool(jnp.isnan(l).any()) for l in leaves)
