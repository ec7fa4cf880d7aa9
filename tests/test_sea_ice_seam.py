"""Sea-ice halo correctness: the full ice step (EVP dynamics + upwind
advection + slab thermodynamics) must commute with a rotation around the
periodic-x seam. Before per-substep halo fills, EVP rolled garbage across
the seam (the stencil contract in `core.stencil` only tolerates H substeps
without a refill; EVP runs O(100)) — this test fails loudly in that case."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climaocean_tpu.grids.grid import latitude_longitude_grid
from climaocean_tpu.models.hydrostatic import HydrostaticModel
from climaocean_tpu.models.sea_ice import SeaIceModel
from climaocean_tpu.models import sea_ice as si
from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere
from climaocean_tpu.models.coupled import OceanSeaIceModel


def _roll_interior(a, grid, k):
    """Roll the x-interior by k cells, leaving halos stale (the ice step
    refills every stencil-read halo at entry, so stale halos must not
    matter — that is part of what this test checks)."""
    H, Nx = grid.H, grid.Nx
    a = np.asarray(a).copy()
    a[..., H:H + Nx] = np.roll(a[..., H:H + Nx], k, axis=-1)
    return jnp.asarray(a)


def test_ice_step_commutes_with_seam_rotation():
    grid = latitude_longitude_grid((24, 12, 3), longitude=(-180, 180),
                                   latitude=(40, 80), z=(-200.0, 0.0), halo=4)
    ice_model = SeaIceModel(grid=grid, dynamics=True, substeps=20)
    ocean = HydrostaticModel(grid=grid, substeps=4)
    atmos = synthetic_prescribed_atmosphere(grid, 0.0, 86400.0)
    coupled = OceanSeaIceModel(ocean=ocean, atmosphere=atmos,
                               sea_ice=ice_model)

    rng = np.random.default_rng(7)
    H, Nx, Ny = grid.H, grid.Nx, grid.Ny
    lat_i = np.asarray(grid.lat_cc)[H:H + Ny, H:H + Nx]

    def rand2(scale, mask=None):
        a = np.zeros((grid.Nyp, grid.Nxp), np.float32)
        v = rng.uniform(0, scale, (Ny, Nx)).astype(np.float32)
        if mask is not None:
            v = v * mask
        a[H:H + Ny, H:H + Nx] = v
        return jnp.asarray(a)

    icy = (lat_i > 55).astype(np.float32)           # patch crosses the seam
    icy_p = np.zeros((grid.Nyp, grid.Nxp), np.float32)
    icy_p[H:H + Ny, H:H + Nx] = icy
    ice = ice_model.initial_state()
    ice = dict(ice,
               thickness=rand2(2.0, icy),
               concentration=jnp.minimum(rand2(1.0, icy)
                                         + 0.4 * jnp.asarray(icy_p), 1.0),
               snow=rand2(0.2, icy),
               u=rand2(0.2) - 0.1, v=rand2(0.2) - 0.1)

    ostate = ocean.initial_state()
    ostate["T"] = ostate["T"] * 0 - 1.0             # near freezing
    u3 = np.zeros(grid.padded_shape, np.float32)
    u3[:, H:H + Ny, H:H + Nx] = rng.uniform(-0.3, 0.3, (grid.Nz, Ny, Nx))
    ostate["u"] = jnp.asarray(u3)
    v3 = np.zeros(grid.padded_shape, np.float32)
    v3[:, H:H + Ny, H:H + Nx] = rng.uniform(-0.3, 0.3, (grid.Nz, Ny, Nx))
    ostate["v"] = jnp.asarray(v3)

    fields = atmos.at_time(1800.0)

    def run(ice_in, ostate_in, fields_in):
        new_ice, _ = si.step(ice_model, ice_in, ostate_in, fields_in,
                             coupled, 600.0)
        return new_ice

    run_j = jax.jit(run)
    out_a = run_j(ice, ostate, fields)

    k = 7
    roll = lambda t: jax.tree_util.tree_map(
        lambda a: _roll_interior(a, grid, k)
        if hasattr(a, "ndim") and a.ndim >= 2 and a.shape[-1] == grid.Nxp
        else a, t)
    out_b = run_j(roll(ice), roll(ostate), roll(fields))

    for name in ("thickness", "concentration", "snow", "u", "v", "Ts"):
        a = np.asarray(grid.interior(out_a[name]))
        b = np.asarray(grid.interior(out_b[name]))
        np.testing.assert_allclose(np.roll(a, k, axis=-1), b, atol=2e-5,
                                   err_msg=name)
