"""Field-operation abstraction: algebra + metric-weighted reductions
(reference `AbstractOperations` surface — `Average(op; dims)`,
`Integral(f; condition)`, `KernelFunctionOperation`, field algebra;
`omip_diagnostics.jl:121-123,197-207`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from climaocean_tpu.core import operations as ops
from climaocean_tpu.data.synthetic import synthetic_bathymetry
from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.models.hydrostatic import HydrostaticModel


@pytest.fixture(scope="module")
def setup():
    grid = latitude_longitude_grid((32, 16, 6), longitude=(-180, 180),
                                   latitude=(-70, 70), z=(-3000.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat),
                                               -0.1), minimum_depth=10)
    model = HydrostaticModel(grid=grid, substeps=4, closures=())
    state = model.initial_state()
    rng = np.random.default_rng(3)
    state["T"] = jnp.asarray(10 + rng.normal(size=grid.padded_shape)
                             .astype(np.float32)) * grid.wet_c
    state["u"] = jnp.asarray(0.1 * rng.normal(size=grid.padded_shape)
                             .astype(np.float32)) * grid.wet_u
    state["eta"] = jnp.asarray(0.05 * rng.normal(
        size=grid.padded_shape[1:]).astype(np.float32)) * grid.wet_c[-1]
    return grid, state


def manual_mean(grid, a, w):
    H = grid.H
    a = np.asarray(a)[..., H:H + grid.Ny, H:H + grid.Nx]
    w = np.asarray(w)[..., H:H + grid.Ny, H:H + grid.Nx]
    w = np.broadcast_to(w, a.shape)
    return (a * w).sum() / w.sum()


def test_average_volume_mean(setup):
    grid, state = setup
    got = float(ops.Average(ops.prognostic("T"))(grid, state))
    w = np.asarray(grid.az_cc) * np.asarray(grid.wet_c) * \
        np.asarray(grid.dz_c)[:, None, None]
    want = manual_mean(grid, state["T"], w)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_average_surface_field(setup):
    grid, state = setup
    got = float(ops.Average(ops.prognostic("eta", "cc"))(grid, state))
    w = np.asarray(grid.az_cc) * np.asarray(grid.wet_c[-1])
    want = manual_mean(grid, state["eta"], w)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_average_dims_profile(setup):
    """Average over (x, y) returns the horizontal-mean profile (Nz,)."""
    grid, state = setup
    prof = ops.Average(ops.prognostic("T"), dims=("x", "y"))(grid, state)
    assert prof.shape == (grid.Nz,)
    H = grid.H
    w = (np.asarray(grid.az_cc) * np.asarray(grid.wet_c)
         )[:, H:H + grid.Ny, H:H + grid.Nx]
    a = np.asarray(state["T"])[:, H:H + grid.Ny, H:H + grid.Nx]
    want = (a * w).sum(axis=(1, 2)) / w.sum(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(prof), want, rtol=1e-5)


def test_integral_with_condition(setup):
    """Integral over a latitude-band condition = band volume for a unit
    field (reference ice extent/area integral pattern)."""
    grid, state = setup
    one = ops.KernelFunctionOperation(lambda g, s: jnp.ones_like(s["T"]))
    band = (grid.lat_cc > 0).astype(jnp.float32)
    got = float(ops.Integral(one, condition=band)(grid, state))
    H = grid.H
    w = (np.asarray(grid.az_cc) * np.asarray(grid.wet_c)
         * np.asarray(grid.dz_c)[:, None, None]
         * np.asarray(band))[:, H:H + grid.Ny, H:H + grid.Nx]
    np.testing.assert_allclose(got, w.sum(), rtol=1e-5)


def test_algebra_square_matches(setup):
    """tos*tos through the algebra == direct square (reference `tossq`)."""
    grid, state = setup
    tos = ops.at_surface(ops.prognostic("T"))
    sq = tos * tos
    np.testing.assert_allclose(np.asarray(sq(grid, state)),
                               np.asarray(state["T"][-1]) ** 2, rtol=1e-6)
    shifted = (2.0 * tos - tos) + 1.0
    np.testing.assert_allclose(np.asarray(shifted(grid, state)),
                               np.asarray(state["T"][-1]) + 1.0, rtol=1e-5,
                               atol=1e-5)


def test_location_mismatch_raises(setup):
    u = ops.prognostic("u", "fcc")
    T = ops.prognostic("T", "ccc")
    with pytest.raises(ValueError):
        _ = u * T


def test_scalar_diagnostics_recast(setup):
    """`scalar_diagnostics` (now composed from operations) matches direct
    computation of its products."""
    grid, state = setup
    from climaocean_tpu.simulation.diagnostics import scalar_diagnostics

    out = scalar_diagnostics(grid, state)
    w2 = np.asarray(grid.az_cc) * np.asarray(grid.wet_c[-1])
    np.testing.assert_allclose(float(out["zosga"]),
                               manual_mean(grid, state["eta"], w2), rtol=1e-5)
    w3 = np.asarray(grid.az_cc) * np.asarray(grid.wet_c) * \
        np.asarray(grid.dz_c)[:, None, None]
    np.testing.assert_allclose(float(out["soga"]),
                               manual_mean(grid, state["S"], w3), rtol=1e-5)
    assert float(out["ke"]) >= 0.0
