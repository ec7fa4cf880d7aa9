"""z★ moving vertical coordinate (reference ``mutable=true``,
`omip_simulation.jl:581`): tracer consistency under free-surface motion."""

import jax
import jax.numpy as jnp
import numpy as np

from climaocean_tpu.grids.grid import rectilinear_grid
from climaocean_tpu.models import hydrostatic as hm
from climaocean_tpu.models.hydrostatic import (HydrostaticModel, SurfaceFluxes,
                                               column_sigma)


def seiche_setup(zstar):
    grid = rectilinear_grid((32, 8, 6), x=(0.0, 3.2e5), y=(0.0, 8e4),
                            z=(-100.0, 0.0), halo=4,
                            topology=("periodic", "bounded", "bounded"))
    model = HydrostaticModel(grid=grid, substeps=20, rotation_rate=0.0,
                             zstar=zstar, closures=())
    state = model.initial_state()
    state["T"] = state["T"] + 15.0
    H = grid.H
    xx = np.arange(grid.Nxp)
    eta0 = np.broadcast_to(
        1.0 * np.sin(2 * np.pi * (xx - H) / 32)[None, :],
        (grid.Nyp, grid.Nxp)).astype(np.float32)
    state["eta"] = jnp.asarray(eta0.copy())
    return grid, model, state


def tracer_mass(grid, model, state):
    sig = column_sigma(model, state["eta"])
    w = 1.0 if sig is None else sig[None]
    return float(jnp.sum(grid.interior(
        w * state["T"] * grid.wet_c * grid.dz_c[:, None, None] * grid.az_cc)))


def test_zstar_seiche_tracer_consistency():
    grid, model, state = seiche_setup(True)
    fluxes = SurfaceFluxes.zeros(grid)
    step = jax.jit(lambda s: hm.step(model, s, fluxes, 30.0))
    m0 = tracer_mass(grid, model, state)
    s = state
    for _ in range(30):
        s = step(s)
    Ti = np.asarray(grid.interior(s["T"]))
    wet = np.asarray(grid.interior(grid.wet_c)) > 0
    # ROMS ordering (advect with mass-consistent effective transports +
    # σ-aware correction) preserves a constant tracer to f32 roundoff even
    # under a violent 1%-sigma seiche (was ~1e-2 with pre-correction
    # velocities)
    assert abs(Ti[wet] - 15.0).max() < 1e-4
    # sigma-weighted tracer mass conserved
    m1 = tracer_mass(grid, model, s)
    assert abs(m1 - m0) / abs(m0) < 5e-6
    # the seiche is alive
    assert float(jnp.abs(s["eta"]).max()) > 0.3


def test_zstar_rest_state():
    grid, model, state = seiche_setup(True)
    state["eta"] = jnp.zeros_like(state["eta"])
    zc = np.asarray(grid.z_c)
    state["T"] = state["T"] * 0 + jnp.asarray(
        (15 + 0.05 * (zc + 100)).astype(np.float32))[:, None, None]
    fluxes = SurfaceFluxes.zeros(grid)
    step = jax.jit(lambda s: hm.step(model, s, fluxes, 60.0))
    s = step(step(state))
    assert float(jnp.abs(s["u"]).max()) == 0.0
    assert float(jnp.abs(s["eta"]).max()) == 0.0


def test_zstar_seiche_ab2_consistency():
    """AB2 with ROMS ordering: constant tracer preserved to the blend
    residual (the G-history mix makes it approximate, unlike RK3's exact
    roundoff-level preservation)."""
    import dataclasses

    grid, model, _ = seiche_setup(True)
    model = dataclasses.replace(model, timestepper="QuasiAdamsBashforth2")
    state = model.initial_state()
    state["T"] = state["T"] + 15.0
    H = grid.H
    xx = np.arange(grid.Nxp)
    eta0 = np.broadcast_to(
        1.0 * np.sin(2 * np.pi * (xx - H) / 32)[None, :],
        (grid.Nyp, grid.Nxp)).astype(np.float32)
    state["eta"] = jnp.asarray(eta0.copy())
    fluxes = SurfaceFluxes.zeros(grid)
    step = jax.jit(lambda s: hm.step(model, s, fluxes, 30.0))
    s = state
    for _ in range(30):
        s = step(s)
    Ti = np.asarray(grid.interior(s["T"]))
    wet = np.asarray(grid.interior(grid.wet_c)) > 0
    assert abs(Ti[wet] - 15.0).max() < 0.01
    assert float(jnp.abs(s["eta"]).max()) > 0.3
