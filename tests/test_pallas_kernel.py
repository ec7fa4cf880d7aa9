"""Pallas fused WENO horizontal-divergence kernel vs the XLA path
(interpret mode on CPU; the same kernel compiles and runs on TPU).

The kernel shares the reconstruction tables with `advection/weno.py`, so
agreement must be f32-roundoff-exact, for BOTH orders (5, 7), both weight
computations, and through the full `tracer_flux_divergence` gate
(identical vertical flux on either path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climaocean_tpu.advection.pallas_weno import weno_horizontal_divergence
from climaocean_tpu.advection.tracer import tracer_flux_divergence
from climaocean_tpu.core.stencil import X, Y, dxc, dyc
from climaocean_tpu.advection.weno import weno_upwind
from climaocean_tpu.data.synthetic import synthetic_bathymetry
from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.models.hydrostatic import diagnose_w


def make_case(order, nx=48, ny=24, nz=6, seed=0):
    grid = latitude_longitude_grid((nx, ny, nz), longitude=(-180, 180),
                                   latitude=(-60, 60), z=(-2000.0, 0.0), halo=5)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat),
                                               -0.1), minimum_depth=10)
    rng = np.random.default_rng(seed)
    shape = grid.padded_shape
    c = jnp.asarray(rng.normal(10, 2, (2,) + shape).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 0.1, shape).astype(np.float32)) * grid.wet_u
    v = jnp.asarray(rng.normal(0, 0.1, shape).astype(np.float32)) * grid.wet_v
    return grid, c, u, v


@pytest.mark.parametrize("order", [5, 7])
@pytest.mark.parametrize("weights", ["zweno", "normal_division"])
def test_pallas_matches_xla_horizontal(order, weights):
    grid, c, u, v = make_case(order)
    dz = grid.dz_c[:, None, None]

    def xla():
        cx = weno_upwind(c, u, X, order, grid.wet_c, weights=weights)
        cy = weno_upwind(c, v, Y, order, grid.wet_c, weights=weights)
        qx = grid.dy_fc * dz * u * grid.wet_u * cx
        qy = grid.dx_cf * dz * v * grid.wet_v * cy
        return dxc(qx) + dyc(qy)

    def pallas():
        U = grid.dy_fc * dz * u * grid.wet_u
        V = grid.dx_cf * dz * v * grid.wet_v
        return weno_horizontal_divergence(c, U, V, grid.wet_c, order, weights)

    a = np.asarray(grid.interior(jax.jit(xla)()))
    b = np.asarray(grid.interior(jax.jit(pallas)()))
    wet = np.asarray(grid.interior(grid.wet_c)) > 0
    scale = max(np.abs(a[:, wet]).max(), 1e-12)
    assert np.abs(a - b)[:, wet].max() / scale < 1e-5


@pytest.mark.parametrize("order", [5, 7])
def test_flag_gate_full_divergence_parity(order, monkeypatch):
    """With the gate on, the FULL tracer_flux_divergence (horizontal fused
    + XLA vertical) must match the pure-XLA path to f32 roundoff — the
    bit-compatibility that lets the fused kernel be the default on TPU."""
    from climaocean_tpu.advection import tracer

    grid, c, u, v = make_case(order, seed=1)
    w = diagnose_w(u, v, grid)

    monkeypatch.setenv("CLIMAOCEAN_PALLAS_WENO", "0")
    ref = jax.jit(lambda: tracer.tracer_flux_divergence(c, u, v, w, grid,
                                                        order))()
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_WENO", "1")
    fused = jax.jit(lambda: tracer.tracer_flux_divergence(c, u, v, w, grid,
                                                          order))()
    wet = np.asarray(grid.interior(grid.wet_c)) > 0
    a = np.asarray(grid.interior(ref))
    b = np.asarray(grid.interior(fused))
    scale = max(np.abs(a[:, wet]).max(), 1e-12)
    assert np.abs(a - b)[:, wet].max() / scale < 1e-5


def test_odd_sizes_and_single_tile():
    """Grids whose ny is not a multiple of the slab height and tiny grids
    (single tile) pad correctly."""
    grid, c, u, v = make_case(5, nx=36, ny=13, nz=3, seed=2)
    dz = grid.dz_c[:, None, None]
    U = grid.dy_fc * dz * u * grid.wet_u
    V = grid.dx_cf * dz * v * grid.wet_v
    cx = weno_upwind(c, u, X, 5, grid.wet_c)
    cy = weno_upwind(c, v, Y, 5, grid.wet_c)
    ref = dxc(grid.dy_fc * dz * u * grid.wet_u * cx) + \
        dyc(grid.dx_cf * dz * v * grid.wet_v * cy)
    out = weno_horizontal_divergence(c, U, V, grid.wet_c, 5)
    wet = np.asarray(grid.interior(grid.wet_c)) > 0
    a = np.asarray(grid.interior(ref))
    b = np.asarray(grid.interior(out))
    scale = max(np.abs(a[:, wet]).max(), 1e-12)
    assert np.abs(a - b)[:, wet].max() / scale < 1e-5
