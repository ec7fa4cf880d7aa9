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
