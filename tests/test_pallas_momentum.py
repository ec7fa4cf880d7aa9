"""Fused Pallas momentum kernel vs the XLA stencil chain (interpret mode
on CPU; the same kernel compiles on TPU).

The kernel fuses: vorticity (free-slip corner-masked) + Coriolis flux
(centered Sadourny or WENO-upwinded), KE gradient, vertical advective
form, the hydrostatic pressure integral, and quadratic bottom drag —
every term identical to `vector_invariant.momentum_tendencies` + the
pressure/drag blocks of `hydrostatic.tendencies` up to f32 reassociation.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climaocean_tpu.advection.pallas_momentum import (choose_block,
                                                      momentum_pressure_drag,
                                                      reach)
from climaocean_tpu.advection.vector_invariant import (coriolis_ff,
                                                       momentum_tendencies)
from climaocean_tpu.core.stencil import dxf, dyf, mxc, mxf, myc, myf, zm1
from climaocean_tpu.data.synthetic import synthetic_bathymetry
from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.models.hydrostatic import diagnose_w


def make_case(nx=48, ny=24, nz=6, seed=0):
    grid = latitude_longitude_grid((nx, ny, nz), longitude=(-180, 180),
                                   latitude=(-60, 60), z=(-2000.0, 0.0),
                                   halo=5)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat),
                                               -0.1), minimum_depth=10)
    rng = np.random.default_rng(seed)
    shape = grid.padded_shape
    u = jnp.asarray(rng.normal(0, 0.1, shape).astype(np.float32)) * grid.wet_u
    v = jnp.asarray(rng.normal(0, 0.1, shape).astype(np.float32)) * grid.wet_v
    b = jnp.asarray(rng.normal(0, 1e-3, shape).astype(np.float32))
    w = diagnose_w(u, v, grid)
    return grid, u, v, w, b


def xla_reference(grid, u, v, w, b, order, weights, Cd):
    f_ff = coriolis_ff(grid)
    scheme = "vector_invariant" if order is None else "weno_vector_invariant"
    G_u, G_v = momentum_tendencies(u, v, w, grid, f_ff, scheme=scheme,
                                   vorticity_order=order or 5,
                                   weights=weights)
    dz = grid.dz_c[:, None, None]
    b_dz = b * dz * grid.wet_c
    Bint = jnp.cumsum(b_dz[::-1], axis=0)[::-1] - 0.5 * b_dz
    G_u = G_u + dxf(Bint) / grid.dx_fc * grid.wet_u
    G_v = G_v + dyf(Bint) / grid.dy_cf * grid.wet_v
    if Cd:
        bottom_u = grid.wet_u * (1.0 - zm1(grid.wet_u).at[0].set(0.0))
        bottom_v = grid.wet_v * (1.0 - zm1(grid.wet_v).at[0].set(0.0))
        v_at_u = mxf(myc(v))
        u_at_v = myf(mxc(u))
        sp_u = jnp.sqrt(u ** 2 + v_at_u ** 2)
        sp_v = jnp.sqrt(v ** 2 + u_at_v ** 2)
        G_u = G_u - Cd * sp_u * u / dz * bottom_u
        G_v = G_v - Cd * sp_v * v / dz * bottom_v
    return G_u, G_v


def compare(grid, a, b, field):
    """Interior-only comparison (halo-row tendencies are recomputed from
    different garbage on either path and are rewritten by the next fill)."""
    wet = np.asarray(grid.interior(field)) > 0
    aa = np.asarray(grid.interior(a))
    bb = np.asarray(grid.interior(b))
    scale = max(np.abs(aa[wet]).max(), 1e-12)
    return np.abs(aa - bb)[wet].max() / scale


@pytest.mark.parametrize("order,weights", [(None, "zweno"), (5, "zweno"),
                                           (7, "zweno"),
                                           (5, "normal_division")])
@pytest.mark.parametrize("Cd", [0.0, 3e-3])
def test_pallas_momentum_matches_xla(order, weights, Cd):
    grid, u, v, w, b = make_case()
    f_ff = coriolis_ff(grid)
    dz = grid.dz_c[:, None, None]
    b_dz = b * dz * grid.wet_c

    Gx = jax.jit(lambda: xla_reference(grid, u, v, w, b, order, weights,
                                       Cd))()
    by = choose_block(grid.Nz, u.shape[-1])
    Gp = jax.jit(lambda: momentum_pressure_drag(
        u, v, w, b_dz, grid, f_ff, order=order, weights=weights, Cd=Cd,
        by=by))()

    assert compare(grid, Gx[0], Gp[0], grid.wet_u) < 2e-5
    assert compare(grid, Gx[1], Gp[1], grid.wet_v) < 2e-5


def test_tendencies_wiring_toggles():
    """Full `tendencies` with the env toggle: fused on vs off must agree on
    interior G_u/G_v (covers the wiring, premultiplies, and gating)."""
    from climaocean_tpu.closures.scalar_diffusivity import VerticalScalarDiffusivity
    from climaocean_tpu.models import hydrostatic as hm
    from climaocean_tpu.models.hydrostatic import HydrostaticModel, SurfaceFluxes

    grid, u, v, _w, _b = make_case()
    model = HydrostaticModel(grid=grid, substeps=4,
                             closures=(VerticalScalarDiffusivity(
                                 nu=1e-4, kappa=1e-5),),
                             momentum_scheme="weno_vector_invariant",
                             momentum_order=5, bottom_drag_coefficient=3e-3)
    state = model.initial_state()
    state["u"] = u
    state["v"] = v
    rng = np.random.default_rng(3)
    state["T"] = (20.0 + jnp.asarray(
        rng.normal(0, 0.5, grid.padded_shape).astype(np.float32))) * grid.wet_c
    fl = SurfaceFluxes.zeros(grid)

    def run():
        G, _aux, _ = hm.tendencies(model, state, fl, tracer_advection=False)
        return G["u"], G["v"]

    os.environ["CLIMAOCEAN_PALLAS_MOMENTUM"] = "0"
    try:
        Gx = jax.jit(run)()
    finally:
        os.environ["CLIMAOCEAN_PALLAS_MOMENTUM"] = "1"
    try:
        Gp = jax.jit(run)()
    finally:
        del os.environ["CLIMAOCEAN_PALLAS_MOMENTUM"]

    assert compare(grid, Gx[0], Gp[0], grid.wet_u) < 2e-5
    assert compare(grid, Gx[1], Gp[1], grid.wet_v) < 2e-5


def test_reach_and_gate():
    assert reach(None) == 2
    assert reach(5) == 4
    assert reach(7) == 5
    assert choose_block(10, 1440) is not None
