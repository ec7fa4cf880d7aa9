"""WENO reconstruction properties (convergence rates are exercised in the
slow suite; here: exactness, symmetry, ENO behavior near jumps and dry
cells)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from climaocean_tpu.advection.weno import weno_biased, weno_upwind


@partial(jax.jit, static_argnums=(1, 2))
def _recon(a, order, side):
    return weno_biased(a, -1, order, side)


def test_constant_and_linear_exact():
    N = 32
    const = jnp.full((1, 1, N), 3.7)
    for order in (3, 5, 7):
        r = np.asarray(_recon(const, order, "left"))
        np.testing.assert_allclose(r, 3.7, rtol=1e-6)
    # linear (periodic sawtooth breaks at wrap; check interior only)
    lin = jnp.asarray(np.arange(N, dtype=np.float32))[None, None, :]
    r = np.asarray(_recon(lin, 5, "left"))[0, 0, 8:24]
    np.testing.assert_allclose(r, np.arange(8, 24) - 0.5, atol=1e-4)


def test_no_overshoot_at_jump():
    N = 64
    a = np.zeros(N, dtype=np.float32)
    a[N // 2:] = 1.0
    aj = jnp.asarray(a)[None, None, :]
    for order in (5, 7):
        for side in ("left", "right"):
            r = np.asarray(_recon(aj, order, side))
            assert r.min() > -0.02 and r.max() < 1.02


def test_dry_cell_penalty_falls_back_to_wet_stencil():
    N = 32
    a = np.linspace(0.0, 1.0, N).astype(np.float32)
    a[20:] = 99.0                      # garbage in "dry" region
    wet = np.ones(N, dtype=np.float32)
    wet[20:] = 0.0
    aj = jnp.asarray(a)[None, None, :]
    wj = jnp.asarray(wet)[None, None, :]

    @jax.jit
    def recon(a, w):
        return weno_biased(a, -1, 5, "left", wet=w)

    r = np.asarray(recon(aj, wj))[0, 0]
    # reconstruction at face 19 (between wet cells 18,19) must not be
    # polluted by the garbage at cells >= 20
    expected = 0.5 * (a[18] + a[19])
    assert abs(r[19] - expected) < 0.05


def test_normal_division_weights():
    """`weights="normal_division"` (reference NormalDivision,
    omip_simulation.jl:562-564): classic Jiang-Shu weights — exact on
    smooth data at design order, non-oscillatory at jumps."""
    N = 64
    x = np.linspace(0, 2 * np.pi, N, endpoint=False)
    a = np.sin(x).astype(np.float32)[None, None, :]
    aj = jnp.asarray(a)

    @jax.jit
    def recon(a):
        return weno_biased(a, -1, 5, "left", weights="normal_division")

    r = np.asarray(recon(aj))[0, 0]
    # face i sits between centers i-1, i
    xf = x - (x[1] - x[0]) / 2
    assert np.max(np.abs(r - np.sin(xf))) < 2e-3

    jump = np.zeros(N, dtype=np.float32)
    jump[N // 2:] = 1.0
    rj = np.asarray(recon(jnp.asarray(jump)[None, None, :]))
    assert rj.min() > -0.02 and rj.max() < 1.02


def test_normal_division_plumbed_through_model():
    from climaocean_tpu.configurations.tripolar import half_degree_tripolar_ocean
    import inspect
    src = inspect.getsource(half_degree_tripolar_ocean)
    assert "normal_division" in src
    from climaocean_tpu.models.hydrostatic import HydrostaticModel
    assert HydrostaticModel.__dataclass_fields__["weno_weights"].default == "zweno"


def test_upwind_equals_selected_biased():
    """The input-selected single-reconstruction upwind path is
    mathematically identical to reconstructing both biased values and
    where-selecting (the optimization contract in `weno.weno_upwind`);
    compiled results may differ by FMA-contraction roundoff only."""
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.normal(size=(2, 4, 8, 32)).astype(np.float32))
    wet = jnp.asarray((rng.random(size=(4, 8, 32)) > 0.2).astype(np.float32))
    sign = jnp.asarray(rng.normal(size=(4, 8, 32)).astype(np.float32))

    @partial(jax.jit, static_argnums=(3, 4))
    def both(a, wet, sign, order, weights):
        fused = weno_upwind(a, sign, -1, order, wet=wet, weights=weights)
        left = weno_biased(a, -1, order, "left", wet=wet, weights=weights)
        right = weno_biased(a, -1, order, "right", wet=wet, weights=weights)
        return fused, jnp.where(sign >= 0, left, right)

    for order in (3, 5, 7):
        for weights in ("zweno", "normal_division"):
            fused, ref = both(a, wet, sign, order, weights)
            np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                       rtol=5e-6, atol=5e-7)
