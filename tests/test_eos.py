"""TEOS-10 polynomial EOS vs published check values (Roquet et al. 2015)."""

import jax
import jax.numpy as jnp
import numpy as np

from climaocean_tpu.physics import eos


def test_polyteos10_check_value():
    # polyTEOS10-bsq published check value at (SA=30 g/kg, CT=10 C, z=-1000 m)
    r = jax.jit(eos.rho_anomaly)(30.0, 10.0, -1000.0)
    assert abs(float(r) - 1022.85377) < 5e-3


def test_expansion_contraction_signs():
    alpha = jax.jit(eos.thermal_expansion)(35.0, 15.0, 0.0)
    beta = jax.jit(eos.haline_contraction)(35.0, 15.0, 0.0)
    assert 1.5e-4 < float(alpha) < 3e-4
    assert 7e-4 < float(beta) < 8e-4


def test_density_monotonic_in_T_and_S():
    f = jax.jit(eos.rho_anomaly)
    T = jnp.linspace(5.0, 25.0, 6)
    rho_T = np.asarray(f(35.0 * jnp.ones_like(T), T, jnp.zeros_like(T)))
    assert np.all(np.diff(rho_T) < 0)          # warmer -> lighter
    S = jnp.linspace(30.0, 38.0, 6)
    rho_S = np.asarray(f(S, 15.0 * jnp.ones_like(S), jnp.zeros_like(S)))
    assert np.all(np.diff(rho_S) > 0)          # saltier -> denser


def test_buoyancy_zero_at_reference():
    # buoyancy magnitude is small for typical ocean state
    b = jax.jit(eos.buoyancy)(35.0, 12.0, -100.0)
    assert abs(float(b)) < 0.2


def test_z_coefficient_split_is_bitwise_identical():
    """`rho_anomaly_z_coefficients` + depth cubic == `rho_anomaly` exactly
    (same Horner association), at several depths."""
    import numpy as np
    import jax.numpy as jnp
    from climaocean_tpu.physics import eos

    rng = np.random.default_rng(0)
    SA = jnp.asarray(rng.uniform(2.0, 40.0, (5, 7)).astype(np.float32))
    CT = jnp.asarray(rng.uniform(-2.0, 32.0, (5, 7)).astype(np.float32))
    P = eos.rho_anomaly_z_coefficients(SA, CT)
    for z in (0.0, -10.0, -750.0, -5900.0):
        direct = np.asarray(eos.rho_anomaly(SA, CT, z))
        split = np.asarray(
            -eos.RHO_REF / eos.G_EARTH * 0.0 +
            (eos.buoyancy_from_z_coefficients(P, z) * (-eos.RHO_REF)
             / eos.G_EARTH + eos.RHO_REF))
        np.testing.assert_array_equal(split.astype(np.float32), direct)


def test_closure_aux_unchanged_by_eos_split():
    """closure_aux's N2/b are unchanged (to roundoff of the b algebra) by
    the per-cell z-coefficient evaluation path."""
    import numpy as np
    import jax.numpy as jnp
    from climaocean_tpu.grids.grid import latitude_longitude_grid
    from climaocean_tpu.models import hydrostatic as hm
    from climaocean_tpu.models.hydrostatic import HydrostaticModel, SurfaceFluxes
    from climaocean_tpu.physics import eos as eos_mod

    grid = latitude_longitude_grid((12, 8, 6), z=(-2000.0, 0.0), halo=4)
    rng = np.random.default_rng(1)
    model = HydrostaticModel(grid=grid, substeps=4)
    state = model.initial_state()
    state["T"] = jnp.asarray(
        rng.uniform(-1, 28, grid.padded_shape).astype(np.float32))
    state["S"] = jnp.asarray(
        rng.uniform(30, 38, grid.padded_shape).astype(np.float32))
    fl = SurfaceFluxes.zeros(grid)
    aux_new, b_new = hm.closure_aux(model, state, fl)

    # reference: the direct two-evaluation path (explicit TEOS10 object is
    # routed through the same fast path, so emulate the old path by hand)
    zf3 = grid.z_f[:-1, None, None]
    from climaocean_tpu.core.stencil import Z, shift_clamp
    b_up = eos_mod.buoyancy(state["S"], state["T"], zf3)
    b_dn = eos_mod.buoyancy(shift_clamp(state["S"], Z, -1),
                            shift_clamp(state["T"], Z, -1), zf3)
    db = b_up - b_dn
    dz_f = grid.dz_f[:, None, None]
    N2_ref = jnp.concatenate([db / dz_f[:-1], jnp.zeros_like(db[:1])], 0)
    np.testing.assert_allclose(np.asarray(aux_new.N2), np.asarray(N2_ref),
                               atol=1e-7, rtol=1e-5)
