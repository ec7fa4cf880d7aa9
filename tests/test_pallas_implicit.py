"""Fused implicit-vertical-solve Pallas kernel vs the XLA matrix-build +
Thomas path (interpret mode on CPU; compiles on TPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climaocean_tpu.core.pallas_tridiagonal import (impl_choose_block,
                                                    implicit_vertical_solve_pallas)
from climaocean_tpu.core.tridiagonal import (implicit_vertical_diffusion_matrix,
                                             solve_tridiagonal)
from climaocean_tpu.data.synthetic import synthetic_bathymetry
from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height


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
    wshape = (nz + 1,) + shape[1:]
    fields = {k: jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
              for k in ("u", "v", "T", "S")}
    nu = jnp.asarray(rng.uniform(1e-5, 1e-2, wshape).astype(np.float32))
    kap = jnp.asarray(rng.uniform(1e-5, 1e-2, wshape).astype(np.float32))
    return grid, fields, nu, kap


def xla_solves(grid, f, nu, kap, dt, sig2=None):
    dz_c, dz_f = grid.dz_c, grid.dz_f
    if sig2 is not None:
        dz_c = sig2[None] * dz_c[:, None, None]
        dz_f = sig2[None] * dz_f[:, None, None]
    a, b, c = implicit_vertical_diffusion_matrix(kap, dz_c, dz_f, dt,
                                                 grid.wet_c, grid.wet_w)
    TS = solve_tridiagonal(a, b, c,
                           jnp.stack([f["T"], f["S"]]) * grid.wet_c)
    au, bu, cu = implicit_vertical_diffusion_matrix(nu, dz_c, dz_f, dt,
                                                    grid.wet_u, grid.wet_w)
    u = solve_tridiagonal(au, bu, cu, f["u"] * grid.wet_u)
    av, bv, cv = implicit_vertical_diffusion_matrix(nu, dz_c, dz_f, dt,
                                                    grid.wet_v, grid.wet_w)
    v = solve_tridiagonal(av, bv, cv, f["v"] * grid.wet_v)
    return u, v, TS[0], TS[1]


@pytest.mark.parametrize("zstar", [False, True])
def test_fused_implicit_matches_xla(zstar):
    grid, f, nu, kap = make_case()
    dt = 1200.0
    sig = None
    if zstar:
        rng = np.random.default_rng(7)
        sig = jnp.asarray(
            (1.0 + 0.01 * rng.normal(0, 1, grid.padded_shape[1:])).astype(
                np.float32))

    ux, vx, Tx, Sx = jax.jit(lambda: xla_solves(grid, f, nu, kap, dt, sig))()
    by = impl_choose_block(grid.Nz, f["u"].shape[-1])
    inv_sig2 = None if sig is None else 1.0 / (sig * sig)
    up, vp, Tp, Sp = jax.jit(lambda: implicit_vertical_solve_pallas(
        nu, kap, f["u"], f["v"], f["T"], f["S"], grid, dt,
        inv_sig2=inv_sig2, by=by))()

    for a, b in ((ux, up), (vx, vp), (Tx, Tp), (Sx, Sp)):
        aa = np.asarray(grid.interior(a))
        bb = np.asarray(grid.interior(b))
        scale = max(np.abs(aa).max(), 1e-12)
        assert np.abs(aa - bb).max() / scale < 2e-6


def test_implicit_step_wiring_toggles():
    """Full implicit_vertical_step with the env toggle on/off must agree
    (covers gating, premultiplies, and the closure-prognostics tail)."""
    from climaocean_tpu.closures.catke import CATKEVerticalDiffusivity
    from climaocean_tpu.models import hydrostatic as hm
    from climaocean_tpu.models.hydrostatic import (HydrostaticModel,
                                                   SurfaceFluxes, closure_aux)

    grid, f, _nu, _kap = make_case()
    model = HydrostaticModel(grid=grid, substeps=4,
                             closures=(CATKEVerticalDiffusivity(),))
    state = model.initial_state()
    state.update({k: f[k] * getattr(grid, "wet_" + ("c" if k in "TS" else k))
                  for k in ("u", "v", "T", "S")})
    state["T"] = 15.0 + state["T"]
    state["S"] = 35.0 + 0.1 * state["S"]
    fl = SurfaceFluxes.zeros(grid)
    aux, _b = jax.jit(lambda: closure_aux(model, state, fl))()

    def run():
        out = hm.implicit_vertical_step(model, state, aux, 1200.0)
        return out["u"], out["v"], out["T"], out["S"], out["e"]

    os.environ["CLIMAOCEAN_PALLAS_IMPLICIT"] = "0"
    try:
        ref = jax.jit(run)()
    finally:
        os.environ["CLIMAOCEAN_PALLAS_IMPLICIT"] = "1"
    try:
        new = jax.jit(run)()
    finally:
        del os.environ["CLIMAOCEAN_PALLAS_IMPLICIT"]

    for a, b in zip(ref, new):
        aa = np.asarray(grid.interior(a))
        bb = np.asarray(grid.interior(b))
        scale = max(np.abs(aa).max(), 1e-12)
        assert np.abs(aa - bb).max() / scale < 5e-6


@pytest.mark.parametrize("zstar", [False, True])
def test_fused_catke_implicit_matches_xla(zstar, monkeypatch):
    """The whole-implicit-step CATKE kernel (lengths incl. the round-4
    convective/entrainment branches, TKE production/dissipation, 5 solves)
    vs the XLA `implicit_vertical_step` with the same closure stack
    (CATKE + function-κ background)."""
    from climaocean_tpu.closures.catke import CATKEVerticalDiffusivity
    from climaocean_tpu.closures.scalar_diffusivity import (
        VerticalScalarDiffusivity, henyey_diffusivity)
    from climaocean_tpu.models import hydrostatic as hm
    from climaocean_tpu.models.hydrostatic import (HydrostaticModel,
                                                   SurfaceFluxes)

    grid, f, _, _ = make_case(nz=8, seed=3)
    rng = np.random.default_rng(4)
    model = HydrostaticModel(
        grid=grid, substeps=4, zstar=zstar,
        closures=(CATKEVerticalDiffusivity(),
                  VerticalScalarDiffusivity(
                      nu=3e-5, kappa=lambda lat, z: henyey_diffusivity(lat))))
    state = model.initial_state()
    for k in ("u", "v"):
        state[k] = f[k] * 0.1 * getattr(grid, f"wet_{k}")
    state["T"] = (10.0 + f["T"]) * grid.wet_c
    state["S"] = (35.0 + 0.1 * f["S"]) * grid.wet_c
    state["e"] = jnp.abs(f["T"]) * 1e-4 * grid.wet_c
    state["eta"] = jnp.asarray(
        rng.normal(0, 0.1, grid.padded_shape[1:]).astype(np.float32)) \
        * grid.wet_c[-1]
    fl = SurfaceFluxes.zeros(grid)
    # destabilizing surface cooling in a band -> convective/entrainment
    # branches active
    QT = np.zeros(grid.padded_shape[1:], np.float32)
    QT[:, : grid.Nxp // 2] = -2e-4
    fl = fl._replace(Q_T=jnp.asarray(QT) * grid.wet_c[-1],
                     tau_x=jnp.full(grid.padded_shape[1:], 1e-4,
                                    jnp.float32) * grid.wet_u[-1])
    aux, _ = hm.closure_aux(model, state, fl)

    monkeypatch.setenv("CLIMAOCEAN_PALLAS_CATKE", "0")
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_IMPLICIT", "0")
    ref = jax.jit(lambda s: hm.implicit_vertical_step(model, s, aux,
                                                      1200.0))(state)
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_CATKE", "1")
    fused = jax.jit(lambda s: hm.implicit_vertical_step(model, s, aux,
                                                        1200.0))(state)
    H = grid.H
    for k in ("u", "v", "T", "S", "e"):
        a = np.asarray(ref[k])[..., H:H + grid.Ny, H:H + grid.Nx]
        b = np.asarray(fused[k])[..., H:H + grid.Ny, H:H + grid.Nx]
        scale = max(np.abs(a).max(), 1e-10)
        assert np.abs(a - b).max() / scale < 5e-5, \
            f"{k}: {np.abs(a - b).max() / scale:.3e} (zstar={zstar})"
