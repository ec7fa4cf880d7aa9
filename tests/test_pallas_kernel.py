"""Pallas fused WENO-5 tracer kernel vs the XLA path (interpret mode on
CPU; the same kernel compiles and runs on TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np

from climaocean_tpu.advection.pallas_weno import weno5_tracer_divergence
from climaocean_tpu.advection.tracer import tracer_flux_divergence
from climaocean_tpu.data.synthetic import synthetic_bathymetry
from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.models.hydrostatic import diagnose_w


def test_pallas_matches_xla_horizontal_fluxes():
    grid = latitude_longitude_grid((48, 24, 6), longitude=(-180, 180),
                                   latitude=(-60, 60), z=(-2000.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat), -0.1),
                              minimum_depth=10)
    rng = np.random.default_rng(0)
    shape = grid.padded_shape
    c = jnp.asarray(rng.normal(10, 2, (2,) + shape).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 0.1, shape).astype(np.float32)) * grid.wet_u
    v = jnp.asarray(rng.normal(0, 0.1, shape).astype(np.float32)) * grid.wet_v
    w0 = jnp.zeros((grid.Nz + 1,) + shape[1:], jnp.float32)

    ref = jax.jit(lambda: tracer_flux_divergence(c, u, v, w0, grid, 5,
                                                 vertical_order=1))()
    pal = jax.jit(lambda: weno5_tracer_divergence(c, u, v, w0, grid,
                                                  by=8, bx=64))()
    wet = np.asarray(grid.interior(grid.wet_c)) > 0
    a = np.asarray(grid.interior(ref))
    b = np.asarray(grid.interior(pal))
    scale = np.abs(a[:, wet]).max()
    assert np.abs(a - b)[:, wet].max() / scale < 1e-5


def test_flag_gate_routes_to_pallas(monkeypatch):
    """CLIMAOCEAN_PALLAS_WENO=1 routes the batched order-5 fixed-coordinate
    case of `tracer_flux_divergence` through the fused kernel."""
    from climaocean_tpu.advection import tracer

    grid = latitude_longitude_grid((48, 24, 6), longitude=(-180, 180),
                                   latitude=(-60, 60), z=(-2000.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat),
                                               -0.1), minimum_depth=10)
    rng = np.random.default_rng(1)
    shape = grid.padded_shape
    c = jnp.asarray(rng.normal(10, 2, (2,) + shape).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 0.1, shape).astype(np.float32)) * grid.wet_u
    v = jnp.asarray(rng.normal(0, 0.1, shape).astype(np.float32)) * grid.wet_v
    w = diagnose_w(u, v, grid)

    monkeypatch.setattr(tracer, "_PALLAS_WENO", True)
    routed = jax.jit(lambda: tracer.tracer_flux_divergence(c, u, v, w, grid, 5))()
    direct = jax.jit(lambda: weno5_tracer_divergence(c, u, v, w, grid))()
    np.testing.assert_array_equal(np.asarray(routed), np.asarray(direct))
    assert np.isfinite(np.asarray(grid.interior(routed))).all()
