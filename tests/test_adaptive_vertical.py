"""Adaptive vertically-implicit tracer advection (reference
`AdaptiveVerticallyImplicitDiscretization(cfl=0.4)`, `orca.jl:11-12`;
VERDICT round-1 item 9).

A coarse test grid cannot reach a genuine vertical CFL violation with
physically-consistent velocities, so the in-model tests force the split
with a tiny `cfl` and the stability property is tested directly on the
implicit operator with a synthetic super-CFL w.
"""

import jax
import jax.numpy as jnp
import numpy as np

from climaocean_tpu.data.synthetic import synthetic_bathymetry
from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.models import hydrostatic as hm
from climaocean_tpu.models.hydrostatic import HydrostaticModel, SurfaceFluxes

CFL_TINY = 1e-3       # forces clipping at test-grid velocity scales


def make_grid(nx=24, ny=14, nz=8):
    grid = latitude_longitude_grid((nx, ny, nz), longitude=(-180, 180),
                                   latitude=(-65, 65), z=(-3000.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    return with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat),
                                               -0.1), minimum_depth=10)


def spun_state(model, seed=0, amp=0.3):
    grid = model.grid
    state = model.initial_state()
    rng = np.random.default_rng(seed)
    state["u"] = jnp.asarray(amp * rng.normal(size=grid.padded_shape)
                             .astype(np.float32)) * grid.wet_u
    state["v"] = jnp.asarray(amp * rng.normal(size=grid.padded_shape)
                             .astype(np.float32)) * grid.wet_v
    zc = np.asarray(grid.z_c)
    state["T"] = state["T"] + jnp.asarray(15 + 10 * np.exp(zc / 700.0)
                                          )[:, None, None]
    return state


def test_split_is_active_and_conservative():
    """With the clip engaged, w_e + w_i == w exactly, and total tracer
    content is conserved across full steps (the split telescopes)."""
    grid = make_grid()
    model = HydrostaticModel(grid=grid, substeps=8, closures=(),
                             adaptive_vertical_cfl=CFL_TINY)
    state = spun_state(model)
    dt = 3600.0

    w = hm.diagnose_w(state["u"], state["v"], grid)
    w_e, w_i = hm._split_vertical_velocity(model, w, dt)
    assert w_i is not None
    assert float(jnp.abs(w_i).max()) > 0.0
    # exact decomposition on wet faces (w_i is masked by wet_w; w itself is
    # zero on dry faces so the sum still reproduces w everywhere)
    np.testing.assert_allclose(np.asarray(w_e + w_i), np.asarray(w),
                               rtol=0, atol=1e-9)

    fluxes = SurfaceFluxes.zeros(grid)
    vol = grid.az_cc * grid.dz_c[:, None, None] * grid.wet_c

    def total(s):
        return float(jnp.sum(grid.interior(s["T"] * vol)))

    def drift(cfl):
        m = HydrostaticModel(grid=grid, substeps=8, closures=(),
                             adaptive_vertical_cfl=cfl)
        step = jax.jit(lambda s: hm.step(m, s, fluxes, dt))
        s = state
        for _ in range(4):
            s = step(s)
        assert np.isfinite(np.asarray(s["T"])).all()
        return abs(total(s) - total(state)) / abs(total(state))

    # the split must not leak tracer beyond the fixed-coordinate free-
    # surface flux the fully-explicit scheme already has (O(dη/H) per step)
    d_explicit = drift(None)
    d_adaptive = drift(CFL_TINY)
    assert d_adaptive < max(3.0 * d_explicit, 1e-5)


def test_constant_tracer_split_adds_no_deviation():
    """The split must not degrade constancy: the explicit update leaves
    c(1 + dt ∂z w_i) and the implicit upwind operator inverts it exactly,
    so a constant tracer deviates by EXACTLY as much as the fully-explicit
    baseline (whose small deviation comes from the divergent random test
    flow over bathymetry, not from the split)."""
    grid = make_grid()
    fluxes = SurfaceFluxes.zeros(grid)

    def run(cfl):
        model = HydrostaticModel(grid=grid, substeps=8, closures=(),
                                 adaptive_vertical_cfl=cfl)
        state = spun_state(model)
        state["S"] = jnp.full_like(state["S"], 35.0)
        step = jax.jit(lambda s: hm.step(model, s, fluxes, 3600.0))
        s = step(step(state))
        S = np.asarray(grid.interior(s["S"]))
        wet = np.asarray(grid.interior(grid.wet_c)) > 0
        return np.max(np.abs(S[wet] - 35.0))

    dev_explicit = run(None)
    dev_adaptive = run(CFL_TINY)
    assert dev_adaptive <= dev_explicit + 1e-5


@np.errstate(all="ignore")
def test_implicit_operator_super_cfl_stable_positive_conservative():
    """The implicit upwind operator with a synthetic w at 20x the explicit
    CFL limit, both signs: unconditionally stable (finite), positivity-
    preserving (the system is an M-matrix: nonpositive off-diagonals,
    unit column sums), and exactly column-mass conserving when w_i
    vanishes at the column end faces (the flux sum telescopes).

    Note pointwise monotonicity is NOT expected: a w_i that vanishes at
    the boundaries is vertically compressive somewhere, and implicit
    upwind advection legitimately concentrates tracer there — the
    compensating stretch lives in the explicit part of the split."""
    grid = make_grid()
    model = HydrostaticModel(grid=grid, substeps=8, closures=(),
                             adaptive_vertical_cfl=0.4)
    dt = 3600.0
    dz = float(np.asarray(grid.dz_c)[0])
    state = spun_state(model, amp=0.0)
    G, aux, st = hm.tendencies(model, state, SurfaceFluxes.zeros(grid),
                               tracer_advection=False)

    for sign in (+1.0, -1.0):
        w = jnp.zeros((grid.Nz + 1,) + grid.padded_shape[1:])
        w = w.at[1:-1].set(sign * 20.0 * dz / dt) * grid.wet_w
        out = hm.implicit_vertical_step(model, st, aux, dt, w_impl=w)
        T0 = np.asarray(grid.interior(st["T"] * grid.wet_c))
        T1 = np.asarray(grid.interior(out["T"] * grid.wet_c))
        assert np.isfinite(T1).all()
        assert T1.min() >= -1e-6                       # positivity (T0 > 0)
        dzc = np.asarray(grid.dz_c)[:, None, None]
        col0 = (T0 * dzc).sum(axis=0)
        col1 = (T1 * dzc).sum(axis=0)
        np.testing.assert_allclose(col1, col0, rtol=2e-5)


def test_orca_config_uses_adaptive():
    import inspect
    from climaocean_tpu.configurations import orca
    assert "adaptive_vertical_cfl=0.4" in inspect.getsource(orca.orca_ocean)
