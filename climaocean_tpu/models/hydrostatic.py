"""Hydrostatic free-surface model (the dynamical core).

TPU-native rebuild of Oceananigans' `HydrostaticFreeSurfaceModel` +
`ocean_simulation` inner loop (reference behavior contract: SURVEY.md §2b
and the hot-loop reconstruction §3.2): vector-invariant / WENO momentum
advection, WENO tracer advection, TEOS-10 buoyancy, enstrophy-conserving
spherical Coriolis, split-explicit barotropic substepping, implicit
vertical diffusion, and the `:SplitRungeKutta3` stepper
(`omip_simulation.jl:604`).

Everything is one pure function of a state pytree — `step(model, state,
fluxes, dt) -> state` — designed to be `jit`-compiled once and (later)
`shard_map`ped over a 2-D device mesh. No data-dependent Python control
flow; substep loops are `lax.scan`.

Sign/flux conventions
---------------------
Surface fluxes are *into the ocean* (positive heats/freshens/accelerates):
``tau_x, tau_y`` kinematic momentum fluxes [m²/s²], ``Q_T`` [K·m/s],
``Q_S`` [g/kg·m/s], ``Q_sw`` penetrating shortwave [K·m/s].
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..advection.tracer import tracer_flux_divergence
from ..advection.vector_invariant import coriolis_ff, momentum_tendencies
from ..closures.base import ClosureAux, sum_diffusivities, sum_horizontal_tendencies
from ..core.halo import fill_halos
from ..core.stencil import (Z, dxc, dxf, dyc, dyf, mxc, mxf, myc, myf,
                            shift_clamp)
from ..core.tridiagonal import implicit_vertical_diffusion_matrix, solve_tridiagonal
from ..physics import eos as eos_mod
from ..physics.eos import G_EARTH
from . import free_surface as fs


class SurfaceFluxes(NamedTuple):
    tau_x: jnp.ndarray   # (Nyp, Nxp) kinematic stress into ocean [m²/s²]
    tau_y: jnp.ndarray
    Q_T: jnp.ndarray     # non-penetrating heat flux into ocean [K·m/s]
    Q_S: jnp.ndarray     # salinity flux [g/kg·m/s]
    Q_sw: jnp.ndarray    # penetrating shortwave [K·m/s]
    ice_fraction: object = None   # optional sea-ice concentration (closures
                                  # damp wave-driven TKE under ice)

    @staticmethod
    def zeros(grid):
        z = grid.new_surface_field()
        return SurfaceFluxes(z, z, z, z, z)


# Two-band Jerlov-I shortwave penetration (reference: two-band SW with
# `first_color_fraction` + absorption coefficients, `kpp_surface_forcing.jl:37-51`)
SW_FRAC1 = 0.58
SW_SCALE1 = 0.35     # m
SW_SCALE2 = 23.0     # m


@partial(jax.tree_util.register_dataclass,
         data_fields=["grid", "closures"],
         meta_fields=["momentum_scheme", "momentum_order", "tracer_order",
                      "eos", "substeps", "g", "rotation_rate", "rk3_gammas",
                      "stage_mode", "zstar", "timestepper", "ab2_chi",
                      "bottom_drag_coefficient", "consistent_transport",
                      "weno_weights", "tracer_weno_weights",
                      "adaptive_vertical_cfl"])
@dataclass(frozen=True)
class HydrostaticModel:
    """Model configuration. Registered as a pytree so the grid's metric and
    mask arrays are *arguments* of the jitted step, not closed-over
    constants — embedding them as HLO literals bloats the serialized
    program past what the remote-compile transport accepts (and bloats the
    executable)."""
    grid: object
    closures: tuple = ()
    momentum_scheme: str = "vector_invariant"     # or "weno_vector_invariant"
    momentum_order: int = 5
    tracer_order: int = 5
    eos: object = None                            # None -> TEOS10
    substeps: int = 70
    g: float = G_EARTH
    rotation_rate: float = 7.292115e-5
    rk3_gammas: tuple = (1.0 / 3.0, 1.0 / 2.0, 1.0)
    # "scan": one stage graph via lax.scan with equal substeps — 3x smaller
    # HLO, faster compile, and MEASURED FASTER execution on the v5e target
    # (the compiler penalizes larger programs; the unrolled variant with
    # prorated substeps ran 1.8x slower despite 40% less 2-D work).
    stage_mode: str = "scan"
    # z★ moving vertical coordinate (reference `mutable=true`,
    # `omip_simulation.jl:581`): cell thicknesses stretch with the free
    # surface, h = σ Δz★, σ = 1 + η/H; tracers are thickness-weighted so a
    # constant tracer stays exactly constant under free-surface motion, and
    # the pressure gradient carries the +b ∇z|_z★ correction. The
    # barotropic solve keeps the linear (static-H) wave speed.
    zstar: bool = False
    # "SplitRungeKutta3" (reference OMIP choice, 3 tendency evaluations per
    # step) or "QuasiAdamsBashforth2" (Oceananigans' default family: ONE
    # tendency evaluation per step, ~2.5x cheaper, smaller stable Δt).
    timestepper: str = "SplitRungeKutta3"
    ab2_chi: float = 0.1
    # quadratic bottom drag τ_b = −Cd |u| u applied in each column's
    # deepest wet cell (NumericalEarth ocean_simulation default) — without
    # it boundary currents never equilibrate.
    bottom_drag_coefficient: float = 0.003
    # ROMS ordering: advect tracers AFTER the barotropic solve with
    # velocities corrected to the mass-consistent effective transports —
    # a constant tracer is then exactly constant under z★ for the RK3
    # steppers (`tracer_advection_tendency`); AB2 uses the same ordering
    # with blend-limited constancy. Default None = auto: ON iff zstar.
    # In fixed coordinates the pre-barotropic ordering already matches the
    # reference (tracers advect with the previous stage's corrected
    # velocities) and skipping the post-solve pass lets XLA overlap tracer
    # advection with the barotropic scan — measured ~25% faster steps on
    # the 1/4° benchmark workload.
    consistent_transport: object = None
    # WENO nonlinear-weight computation: "zweno" (Borges Z-weights) or
    # "normal_division" (classic Jiang-Shu division — the reference's
    # `weight_computation=NormalDivision` operating point for the
    # orca/halfdegree/tenthdegree configs, omip_simulation.jl:562-564,600).
    weno_weights: str = "zweno"
    # tracer-advection weight computation when it differs from momentum's —
    # the reference's OMIP override sets ALL configs' tracer scheme to
    # WENO(order=7, NormalDivision) while momentum stays per-config
    # (`omip_simulation.jl:600` vs :562-564). None = same as weno_weights.
    tracer_weno_weights: object = None
    # Adaptive vertically-implicit ADVECTION (reference
    # `AdaptiveVerticallyImplicitDiscretization(cfl=0.4)`, `orca.jl:11-12`):
    # where the vertical tracer CFL exceeds `cfl`, the excess vertical
    # velocity w_i = w − clip(w, ±cfl·Δz_f/Δt) advects implicitly (first-
    # order upwind folded into the vertical tridiagonal solve) so strong
    # convective plumes don't constrain Δt. Splitting is exact for constant
    # tracers: the explicit update leaves c(1 + Δt ∂z w_i), which the
    # implicit operator (1 + Δt ∂z w_i·) inverts back to c. Applied to
    # tracers (the binding constraint); momentum keeps explicit vertical
    # advection. None = fully explicit.
    adaptive_vertical_cfl: object = None

    def roms_ordering(self):
        ct = self.consistent_transport
        return self.zstar if ct is None else bool(ct)

    def initial_state(self, T=None, S=None):
        grid = self.grid
        state = {
            "u": grid.new_field(), "v": grid.new_field(),
            "T": grid.new_field() if T is None else T,
            "S": grid.new_field() + 35.0 if S is None else S,
            "eta": grid.new_surface_field(),
        }
        for cl in self.closures:
            init = getattr(cl, "initial_prognostics", None)
            if init is not None:
                state.update(init(grid))
        if self.timestepper == "QuasiAdamsBashforth2":
            state["G_prev"] = {k: grid.new_field() for k in ("u", "v", "T", "S")}
            state["ab2_first"] = jnp.ones(())
        return state

    def buoyancy(self, state):
        grid = self.grid
        z = grid.z_c[:, None, None]
        if self.eos is None:
            return eos_mod.buoyancy(state["S"], state["T"], z)
        return self.eos.buoyancy(state["S"], state["T"], z)


def diagnose_w(u, v, grid, dzc3=None):
    """Vertical velocity from continuity, integrated up from the bottom.
    Returns (Nz+1, Nyp, Nxp).

    With a moving coordinate (``dzc3`` = σ Δz★), the dia-surface velocity
    subtracts the column-uniform free-surface stretching (−∂tσ Δz★ with
    ∂tσ = −∇·U / H), which makes w̃ vanish at the free surface exactly."""
    dz = grid.dz_c[:, None, None] if dzc3 is None else dzc3
    div_h = (dxc(grid.dy_fc * dz * u * grid.wet_u)
             + dyc(grid.dx_cf * dz * v * grid.wet_v)) / grid.az_cc
    if dzc3 is not None:
        H_col = jnp.maximum(grid.column_depth, 1e-8)
        div_total = jnp.sum(div_h * grid.wet_c, axis=0)
        frac = (grid.dz_c[:, None, None] * grid.wet_c
                / H_col)                      # Δz★_k / H per wet cell
        div_h = div_h - frac * div_total
    w_inc = -div_h                                 # ∂z w · dz
    w = jnp.concatenate([jnp.zeros_like(w_inc[:1]),
                         jnp.cumsum(w_inc, axis=0)], axis=0)
    return w * grid.wet_w


def closure_aux(model, state, fluxes, t=0.0):
    """Shared diagnostics for the closures (buoyancy, N², S², u★, Qb).

    N² is *locally referenced*: both cells adjacent to an interface are
    evaluated at the interface depth, so the thermobaric z-dependence of the
    TEOS-10 anomaly polynomial cancels — differencing in-situ buoyancy at
    each cell's own z would diagnose spurious deep convection.

    The cell-center buoyancy reuses the two interface evaluations of the
    SAME cell's state (b_c[k] = ½(b(c_k, z_f[k]) + b(c_k, z_f[k+1]))) —
    exact to O(Δz²) in the thermobaric term only, and saves a third
    full-grid 55-term polynomial evaluation per stage."""
    grid = model.grid
    dz_f = grid.dz_f[:, None, None]

    import os
    zf3 = grid.z_f[:-1, None, None]                 # face k below cell k
    # z-coefficient split: trades one 55-term eval per cell for 4 extra
    # coefficient arrays of traffic. Measured: wins in the compute-heavy
    # shallow-column regime (1/4° Nz=10: 48.7 → 48.1 ms/step), loses when
    # memory-bound (1° Nz=60: +0.7 ms) — default on for Nz ≤ 24;
    # CLIMAOCEAN_EOS_SPLIT=0/1 forces.
    env_split = os.environ.get("CLIMAOCEAN_EOS_SPLIT")
    use_split = (grid.Nz <= 24) if env_split is None \
        else env_split not in ("", "0")
    if use_split and (model.eos is None or
                      isinstance(model.eos, eos_mod.TEOS10EquationOfState)):
        # every cell is evaluated at BOTH of its faces — split the 55-term
        # polynomial into per-cell z-coefficients (one expensive (s,t)
        # evaluation per cell) + two 3-FMA depth cubics. Bitwise-identical
        # Horner association; halves the stage's dominant VPU cost.
        kw = {} if model.eos is None else \
            {"rho0": model.eos.rho0, "g": model.eos.g}
        P = eos_mod.rho_anomaly_z_coefficients(state["S"], state["T"])
        b_up = eos_mod.buoyancy_from_z_coefficients(P, zf3, **kw)
        zup3 = grid.z_f[1:, None, None]             # face k+1 above cell k
        b_own_upper = eos_mod.buoyancy_from_z_coefficients(P, zup3, **kw)
        # cell k-1 at face k == cell (k-1)'s upper-face value; the bottom
        # face closes with the bottom cell's own value (db[0] = 0, as the
        # clamped shift produced before)
        b_dn = jnp.concatenate([b_up[:1], b_own_upper[:-1]], axis=0)
    else:
        bfun = eos_mod.buoyancy if model.eos is None else model.eos.buoyancy
        b_up = bfun(state["S"], state["T"], zf3)    # cell k at face k
        b_dn = bfun(shift_clamp(state["S"], Z, -1),  # cell k-1 at face k
                    shift_clamp(state["T"], Z, -1), zf3)
        b_own_upper = None
    db = b_up - b_dn                                # at faces 0..Nz-1
    N2 = jnp.concatenate([db / dz_f[:-1], jnp.zeros_like(db[:1])], axis=0)

    # cell k at face k+1 == b_dn[k+1]; top cell closes with its own face value
    if b_own_upper is not None:
        b_at_upper = jnp.concatenate([b_own_upper[:-1], b_up[-1:]], axis=0)
    else:
        b_at_upper = jnp.concatenate([b_dn[1:], b_up[-1:]], axis=0)
    b = 0.5 * (b_up + b_at_upper)

    u_c = mxc(state["u"])
    v_c = myc(state["v"])
    du = (u_c - shift_clamp(u_c, Z, -1)) / dz_f[:-1]
    dv = (v_c - shift_clamp(v_c, Z, -1)) / dz_f[:-1]
    S2 = jnp.concatenate([du ** 2 + dv ** 2, jnp.zeros_like(du[:1])], axis=0)

    u_star = (fluxes.tau_x ** 2 + fluxes.tau_y ** 2) ** 0.25

    z0 = jnp.zeros_like(b[-1])
    alpha = eos_mod.thermal_expansion(state["S"][-1], state["T"][-1], z0)
    beta = eos_mod.haline_contraction(state["S"][-1], state["T"][-1], z0)
    Qb = model.g * (alpha * (fluxes.Q_T + fluxes.Q_sw) - beta * fluxes.Q_S)

    return ClosureAux(b=b, N2=N2, S2=S2, u_star=u_star, Qb=Qb,
                      fluxes=fluxes, alpha=alpha, beta=beta, t=t), b


def shortwave_tendency(Q_sw, grid):
    """Two-band penetrating shortwave heating tendency [K/s]."""
    zf = grid.z_f

    def frac(z):
        return SW_FRAC1 * jnp.exp(z / SW_SCALE1) + (1 - SW_FRAC1) * jnp.exp(z / SW_SCALE2)

    absorbed = frac(zf[1:]) - frac(zf[:-1])        # fraction absorbed per cell
    prof = (absorbed / grid.dz_c)[:, None, None]
    return Q_sw[None, :, :] * prof


def column_sigma(model, eta):
    """z★ column stretch σ = 1 + η/H (1 on land and when zstar is off)."""
    grid = model.grid
    if not model.zstar:
        return None
    H_col = grid.column_depth
    sig = 1.0 + fill_halos(eta, grid) / jnp.maximum(H_col, 1e-8)
    return jnp.where(H_col > 0, jnp.clip(sig, 0.1, 10.0), 1.0)


def _split_vertical_velocity(model, w, dt):
    """Adaptive implicit-advection split (reference
    `AdaptiveVerticallyImplicitDiscretization(cfl)`, `orca.jl:11-12`):
    w = w_explicit + w_implicit with w_explicit = clip(w, ±cfl·Δz_f/Δt).
    Returns (w_explicit, w_implicit or None). The CFL bound uses the static
    Δz_f (under z★ the σ stretch is O(η/H) ≪ 1 — a stabilization bound, not
    a conservation-critical metric)."""
    cfl = model.adaptive_vertical_cfl
    if cfl is None or dt is None:
        return w, None
    grid = model.grid
    w_max = (cfl / dt) * grid.dz_f[:, None, None]
    w_i = (w - jnp.clip(w, -w_max, w_max)) * grid.wet_w
    # the free-surface face carries NO implicit flux (the tridiagonal's
    # top super-diagonal is dropped by the solver, which would make the
    # surface flux one-sided and leak tracer) — it stays fully explicit,
    # where w at the surface is the tiny −∂η/∂t residual anyway
    w_i = w_i.at[..., -1, :, :].set(0.0)
    return w - w_i, w_i


def _tracer_advection_terms(model, T, S, u, v, w, sigma, dzc3, dt=None):
    """Advective T/S tendencies (thickness-weighted under z★). Returns
    (G_T, G_S, w_implicit): with `adaptive_vertical_cfl` set, the super-CFL
    part of w is withheld here and returned for the implicit vertical
    solve."""
    grid = model.grid
    w_e, w_i = _split_vertical_velocity(model, w, dt)
    TS = jnp.stack([T, S])
    G_TS = tracer_flux_divergence(TS, u, v, w_e, grid, model.tracer_order,
                                  dzc3=dzc3,
                                  weights=(model.tracer_weno_weights
                                           or model.weno_weights))
    if sigma is not None:
        # convert per-moving-volume tendency to thickness-weighted ∂t(σc)
        G_TS = G_TS * sigma[None, None]
    return G_TS[0], G_TS[1], w_i


def tracer_advection_tendency(model, state_f, averaged, dt=None):
    """ROMS-ordered tracer advection: advect with the tendency-state
    velocities corrected so their (σ-weighted) depth-integrated transport
    equals the barotropic solve's mass-consistent effective transport
    (`fs.AveragedBarotropic.U_eff`). Because η_avg = η₀ − Δt ∇·U_eff holds
    exactly and σ is column-uniform, a constant tracer stays constant to
    roundoff under z★ (reference: Oceananigans advects tracers AFTER the
    barotropic correction for the same reason; ROMS "consistency" ordering).

    ``state_f`` must have halo-filled u, v, T, S (the dict returned by
    `tendencies`)."""
    grid = model.grid
    sigma = column_sigma(model, state_f["eta"])
    dzc3 = None if sigma is None else sigma[None] * grid.dz_c[:, None, None]
    u_adv, v_adv = fs.barotropic_correct(
        state_f["u"], state_f["v"], averaged.U_eff, averaged.V_eff, grid,
        sigma=sigma)
    u_adv = fill_halos(u_adv, grid, "u", vector=True) * grid.wet_u
    v_adv = fill_halos(v_adv, grid, "v", vector=True) * grid.wet_v
    w_adv = diagnose_w(u_adv, v_adv, grid, dzc3)
    return _tracer_advection_terms(model, state_f["T"], state_f["S"],
                                   u_adv, v_adv, w_adv, sigma, dzc3, dt=dt)


def _fused_momentum_block(model, u, v, w, b_dz, sigma, f_ff):
    """Route the momentum + pressure-gradient + bottom-drag block through
    the fused Pallas kernel (`advection/pallas_momentum.py`) when the
    backend / scheme / halo / VMEM gates allow; None -> XLA path.
    CLIMAOCEAN_PALLAS_MOMENTUM=1/0 forces it either way."""
    import os

    env = os.environ.get("CLIMAOCEAN_PALLAS_MOMENTUM")
    if env is not None:
        on = env not in ("", "0")
    else:
        from ..advection.tracer import _use_pallas
        on = _use_pallas()
    if not on:
        return None
    if model.momentum_scheme == "weno_vector_invariant":
        order = model.momentum_order
        if order not in (5, 7):
            return None
    elif model.momentum_scheme == "vector_invariant":
        order = None
    else:
        return None
    from ..advection import pallas_momentum as pm

    grid = model.grid
    nz, _, nxp = u.shape
    if grid.H < pm.reach(order) or nxp < 2 * pm.reach(order) + 8:
        return None
    by = pm.choose_block(nz, nxp)
    if by is None:
        return None
    inv_sigma = None if sigma is None else 1.0 / sigma
    return pm.momentum_pressure_drag(
        u, v, w, b_dz, grid, f_ff, order=order, weights=model.weno_weights,
        Cd=model.bottom_drag_coefficient or 0.0, inv_sigma=inv_sigma, by=by)


def tendencies(model, state, fluxes, tracer_advection=True, dt=None, t=0.0):
    """Explicit tendencies for u, v, T, S (barotropic η-gradient excluded —
    it lives in the substepped 2-D mode). With z★ the returned tracer
    tendencies are THICKNESS-WEIGHTED: G_c = ∂t(σ c).

    ``tracer_advection=False`` omits the advective T/S terms (surface
    fluxes, shortwave, and closure tendencies are kept) — the ROMS-ordered
    steppers add advection AFTER the barotropic solve with velocities
    corrected to the mass-consistent effective transports
    (`tracer_advection_tendency`)."""
    grid = model.grid

    u = fill_halos(state["u"], grid, "u", vector=True) * grid.wet_u
    v = fill_halos(state["v"], grid, "v", vector=True) * grid.wet_v
    T = fill_halos(state["T"], grid)
    S = fill_halos(state["S"], grid)
    state = dict(state, u=u, v=v, T=T, S=S)

    sigma = column_sigma(model, state["eta"])
    dzc3 = None if sigma is None else sigma[None] * grid.dz_c[:, None, None]

    w = diagnose_w(u, v, grid, dzc3)
    aux, b = closure_aux(model, state, fluxes, t=t)

    # --- momentum: vorticity + KE + vertical advection + Coriolis + the
    # baroclinic pressure gradient + bottom drag — fused Pallas kernel on
    # TPU, else the XLA stencil chain (identical term-by-term) -------------
    f_ff = coriolis_ff(grid, model.rotation_rate)
    dz = grid.dz_c[:, None, None] if dzc3 is None else dzc3
    b_dz = b * dz * grid.wet_c
    fused = _fused_momentum_block(model, u, v, w, b_dz, sigma, f_ff)
    if fused is not None:
        G_u, G_v = fused
    else:
        G_u, G_v = momentum_tendencies(u, v, w, grid, f_ff,
                                       scheme=model.momentum_scheme,
                                       vorticity_order=model.momentum_order,
                                       weights=model.weno_weights)
        Bint = (jnp.cumsum(b_dz[::-1], axis=0)[::-1] - 0.5 * b_dz)  # ∫_z^0 b dz'
        G_u = G_u + dxf(Bint) / grid.dx_fc * grid.wet_u
        G_v = G_v + dyf(Bint) / grid.dy_cf * grid.wet_v
    if sigma is not None:
        # moving-coordinate correction +b ∇z|_z★ with
        # ∂x z|_z★ = ∂x η · (H + z★)/H
        H_col = jnp.maximum(grid.column_depth, 1e-8)
        zfac = b * (H_col + grid.z_c[:, None, None]) / H_col * grid.wet_c
        eta_f = fill_halos(state["eta"], grid)
        G_u = G_u + mxf(zfac) * dxf(eta_f) / grid.dx_fc * grid.wet_u
        G_v = G_v + myf(zfac) * dyf(eta_f) / grid.dy_cf * grid.wet_v

    w_impl = None
    if tracer_advection:
        # batched: one WENO graph instance for T and S — keeps the
        # serialized HLO small; the stencil ops broadcast over the leading
        # axis
        G_T, G_S, w_impl = _tracer_advection_terms(model, T, S, u, v, w,
                                                   sigma, dzc3, dt=dt)
    else:
        G_T = jnp.zeros_like(T)
        G_S = jnp.zeros_like(S)

    # --- quadratic bottom drag (deepest wet cell per column; the fused
    # momentum kernel already applied it) ------------------------------------
    if model.bottom_drag_coefficient and fused is None:
        from ..core.stencil import zm1
        bottom_u = grid.wet_u * (1.0 - zm1(grid.wet_u).at[0].set(0.0))
        bottom_v = grid.wet_v * (1.0 - zm1(grid.wet_v).at[0].set(0.0))
        v_at_u = mxf(myc(v))
        u_at_v = myf(mxc(u))
        sp_u = jnp.sqrt(u ** 2 + v_at_u ** 2)
        sp_v = jnp.sqrt(v ** 2 + u_at_v ** 2)
        Cd = model.bottom_drag_coefficient
        G_u = G_u - Cd * sp_u * u / dz * bottom_u
        G_v = G_v - Cd * sp_v * v / dz * bottom_v

    # --- surface fluxes ----------------------------------------------------
    dz_top = grid.dz_c[-1]
    top_u = grid.wet_u[-1]
    top_v = grid.wet_v[-1]
    top_c = grid.wet_c[-1]
    G_u = G_u.at[-1].add(fluxes.tau_x / dz_top * top_u)
    G_v = G_v.at[-1].add(fluxes.tau_y / dz_top * top_v)
    G_T = G_T.at[-1].add(fluxes.Q_T / dz_top * top_c)
    G_S = G_S.at[-1].add(fluxes.Q_S / dz_top * top_c)
    G_T = G_T + shortwave_tendency(fluxes.Q_sw, grid) * grid.wet_c

    # --- horizontal closures (biharmonic, Laplacian, GM...) ----------------
    hor = sum_horizontal_tendencies(model.closures, grid, state, aux)
    G = {"u": G_u, "v": G_v, "T": G_T, "S": G_S}
    for k, t in hor.items():
        if sigma is not None and k in ("T", "S"):
            t = t * sigma[None]               # thickness-weight tracer terms
        G[k] = G[k] + t
    if w_impl is not None:
        G["_w_impl"] = w_impl                 # popped by the steppers

    return G, aux, state


def _fused_implicit_solve(model, state, nu_w, kap_w, sig, dt, w_impl):
    """Route the u/v/T/S implicit vertical solves through the fused Pallas
    kernel (coefficient build + 4 Thomas solves VMEM-resident,
    `core/pallas_tridiagonal.implicit_vertical_solve_pallas`). None ->
    XLA path (CPU backends, VMEM overflow, or the adaptive-implicit-
    advection case, whose T/S matrix carries the upwind w_impl terms).
    CLIMAOCEAN_PALLAS_IMPLICIT=1/0 forces it either way."""
    import os

    env = os.environ.get("CLIMAOCEAN_PALLAS_IMPLICIT")
    if env is not None:
        on = env not in ("", "0")
    else:
        from ..advection.tracer import _use_pallas
        on = _use_pallas()
    if not on or w_impl is not None:
        return None
    from ..core.pallas_tridiagonal import (impl_choose_block,
                                           implicit_vertical_solve_pallas)
    grid = model.grid
    nz, _, nxp = state["u"].shape
    by = impl_choose_block(nz, nxp)
    if by is None:
        return None
    inv_sig2 = None if sig is None else 1.0 / (sig * sig)
    return implicit_vertical_solve_pallas(
        nu_w, kap_w, state["u"], state["v"], state["T"], state["S"],
        grid, dt, inv_sig2=inv_sig2, by=by)


def _fused_catke_implicit(model, state, aux, dt, sig, w_impl):
    """Route the WHOLE implicit vertical step — CATKE diffusivities, TKE
    production/dissipation, and all five solves (u, v, T, S, e) — through
    `core.pallas_tridiagonal.implicit_vertical_catke_pallas` when the
    closure stack is CATKE + diagnostic-only companions (background /
    Henyey / GM / biharmonic / restoring: anything without
    `step_prognostics`). The non-CATKE face diffusivities are summed in
    XLA and enter the kernel as background fields. None -> XLA path.
    CLIMAOCEAN_PALLAS_CATKE=1/0 forces."""
    import os

    env = os.environ.get("CLIMAOCEAN_PALLAS_CATKE")
    if env is not None:
        on = env not in ("", "0")
    else:
        from ..advection.tracer import _use_pallas
        on = _use_pallas()
    if not on or w_impl is not None or "e" not in state:
        return None
    from ..closures.catke import CATKEVerticalDiffusivity

    cats = [c for c in model.closures
            if isinstance(c, CATKEVerticalDiffusivity)]
    others = [c for c in model.closures
              if not isinstance(c, CATKEVerticalDiffusivity)]
    if len(cats) != 1 or any(getattr(c, "step_prognostics", None)
                             for c in others):
        return None
    from ..core.pallas_tridiagonal import (catke_choose_block,
                                           implicit_vertical_catke_pallas)
    grid = model.grid
    nz, _, nxp = state["u"].shape
    by = catke_choose_block(nz, nxp)
    if by is None:
        return None
    nu_bg, kap_bg = sum_diffusivities(others, grid, state, aux)
    inv_sig2 = None if sig is None else 1.0 / (sig * sig)
    u, v, T, S, e = implicit_vertical_catke_pallas(
        cats[0], nu_bg, kap_bg, state, aux, grid, dt, inv_sig2=inv_sig2,
        by=by)
    return dict(state, u=u, v=v, T=T, S=S, e=e)


def implicit_vertical_step(model, state, aux, dt, w_impl=None):
    """Implicit vertical mixing of u, v, T, S (+ closure prognostics).

    ``w_impl``: super-CFL vertical velocity withheld from explicit tracer
    advection (`_split_vertical_velocity`) — folded into the T/S tridiagonal
    as first-order upwind implicit advection (reference
    `AdaptiveVerticallyImplicitDiscretization`, `orca.jl:11-12`)."""
    grid = model.grid

    sig0 = None
    if model.zstar:
        sig0 = column_sigma(model, state["eta"])
    fused_all = _fused_catke_implicit(model, state, aux, dt, sig0, w_impl)
    if fused_all is not None:
        return fused_all

    nu_w, kap_w = sum_diffusivities(model.closures, grid, state, aux)

    dz_c, dz_f = grid.dz_c, grid.dz_f
    sig = sig0
    if sig is not None:
        dz_c = sig[None] * dz_c[:, None, None]
        dz_f = sig[None] * dz_f[:, None, None]

    fused = _fused_implicit_solve(model, state, nu_w, kap_w, sig, dt,
                                  w_impl)
    if fused is not None:
        out = dict(state, u=fused[0], v=fused[1], T=fused[2], S=fused[3])
        for cl in model.closures:
            stepper = getattr(cl, "step_prognostics", None)
            if stepper is not None:
                out.update(stepper(grid, out, aux, dt))
        return out

    a, b, c = implicit_vertical_diffusion_matrix(
        kap_w, dz_c, dz_f, dt, grid.wet_c, grid.wet_w)
    if w_impl is not None:
        # upwind flux F[k] = w⁺[k] x[k-1] + w⁻[k] x[k] at face k, treated
        # implicitly: x[k] + Δt/Δz (F[k+1] − F[k]) = rhs. Row action on a
        # constant is (1 + Δt ∂z w_i)·x — exactly undoing the explicit
        # update's (1 + Δt ∂z w_i) factor, so constants are preserved.
        dzc3 = dz_c[:, None, None] if dz_c.ndim == 1 else dz_c
        wi = w_impl * grid.wet_w
        wp = jnp.maximum(wi, 0.0)
        wm = jnp.minimum(wi, 0.0)
        lam = dt / dzc3 * grid.wet_c
        a = a - lam * wp[:-1]
        b = b + lam * (wp[1:] - wm[:-1])
        c = c + lam * wm[1:]
    TS = solve_tridiagonal(a, b, c,
                           jnp.stack([state["T"], state["S"]]) * grid.wet_c)
    T, S = TS[0], TS[1]

    au, bu, cu = implicit_vertical_diffusion_matrix(
        nu_w, dz_c, dz_f, dt, grid.wet_u, grid.wet_w)
    u = solve_tridiagonal(au, bu, cu, state["u"] * grid.wet_u)
    av, bv, cv = implicit_vertical_diffusion_matrix(
        nu_w, dz_c, dz_f, dt, grid.wet_v, grid.wet_w)
    v = solve_tridiagonal(av, bv, cv, state["v"] * grid.wet_v)

    out = dict(state, u=u, v=v, T=T, S=S)

    for cl in model.closures:
        stepper = getattr(cl, "step_prognostics", None)
        if stepper is not None:
            out.update(stepper(grid, out, aux, dt))
    return out


def rk3_substage(model, state0, state_prev, fluxes, dt_stage, substeps,
                 t=0.0):
    """One SplitRungeKutta3 stage: explicit update from ``state0`` with
    tendencies at ``state_prev``, barotropic substepping, correction,
    implicit vertical mixing."""
    grid = model.grid
    roms = model.roms_ordering()
    G, aux, state_prev = tendencies(model, state_prev, fluxes,
                                    tracer_advection=not roms, dt=dt_stage,
                                    t=t)
    w_impl = G.pop("_w_impl", None)

    # barotropic forcing: depth-integral of the slow momentum tendencies
    dz = grid.dz_c[:, None, None]
    GU = jnp.sum(G["u"] * grid.wet_u * dz, axis=0)
    GV = jnp.sum(G["v"] * grid.wet_v * dz, axis=0)

    U0, V0 = fs.barotropic_transport(state0["u"], state0["v"], grid)
    bt0 = fs.BarotropicState(state0["eta"], U0, V0)
    averaged, _ = fs.substep_barotropic(
        bt0, grid, GU, GV, dt_stage, substeps,
        lambda a: fill_halos(a, grid), model.g,
        fill_U=lambda a: fill_halos(a, grid, "u", vector=True),
        fill_V=lambda a: fill_halos(a, grid, "v", vector=True),
        need_eff=roms, need_final=False)

    if roms:
        adv_T, adv_S, w_impl = tracer_advection_tendency(model, state_prev,
                                                         averaged, dt=dt_stage)
        G = dict(G, T=G["T"] + adv_T, S=G["S"] + adv_S)

    # explicit 3-D update (closure prognostics restart from state0 too)
    new = dict(state0)
    new["u"] = (state0["u"] + dt_stage * G["u"]) * grid.wet_u
    new["v"] = (state0["v"] + dt_stage * G["v"]) * grid.wet_v
    if model.zstar:
        # thickness-weighted tracer update: σⁿ⁺¹ cⁿ⁺¹ = σⁿ cⁿ + Δt ∂t(σc)
        sig0 = column_sigma(model, state0["eta"])
        sig1 = column_sigma(model, averaged.eta)
        for name in ("T", "S"):
            new[name] = ((sig0[None] * state0[name]
                          + dt_stage * G[name] * grid.wet_c) / sig1[None])
    else:
        new["T"] = state0["T"] + dt_stage * G["T"] * grid.wet_c
        new["S"] = state0["S"] + dt_stage * G["S"] * grid.wet_c

    # reconcile barotropic mode
    new["u"], new["v"] = fs.barotropic_correct(
        new["u"], new["v"], averaged.U, averaged.V, grid)
    new["eta"] = averaged.eta

    # implicit vertical mixing + closure prognostics
    new = implicit_vertical_step(model, new, aux, dt_stage, w_impl=w_impl)
    return new


def ab2_step(model, state, fluxes, dt, t=0.0):
    """Quasi-Adams-Bashforth-2 step (Oceananigans' default timestepper
    family): uⁿ⁺¹ = uⁿ + Δt[(1.5+χ)Gⁿ − (0.5+χ)Gⁿ⁻¹], ONE tendency
    evaluation per step. Gⁿ⁻¹ is carried in the state (zero on the first
    step = forward Euler). Barotropic substepping, reconciliation, and the
    implicit vertical solve run once over the full Δt."""
    grid = model.grid
    chi = model.ab2_chi
    roms = model.roms_ordering()
    G, aux, state_f = tendencies(model, state, fluxes,
                                 tracer_advection=not roms, dt=dt, t=t)
    w_impl = G.pop("_w_impl", None)
    Gp = state.get("G_prev")
    first = state.get("ab2_first", jnp.ones(()))
    # forward Euler on the very first step (no history yet)
    w_new = jnp.where(first > 0, 1.0, 1.5 + chi)
    w_old = jnp.where(first > 0, 0.0, 0.5 + chi)

    def blend(name):
        g_old = G[name] if Gp is None else Gp[name]
        return w_new * G[name] - w_old * g_old

    Gb = {k: blend(k) for k in ("u", "v", "T", "S")}

    dz = grid.dz_c[:, None, None]
    GU = jnp.sum(Gb["u"] * grid.wet_u * dz, axis=0)
    GV = jnp.sum(Gb["v"] * grid.wet_v * dz, axis=0)
    U0, V0 = fs.barotropic_transport(state["u"], state["v"], grid)
    bt0 = fs.BarotropicState(state["eta"], U0, V0)
    averaged, _ = fs.substep_barotropic(
        bt0, grid, GU, GV, dt, model.substeps,
        lambda a: fill_halos(a, grid), model.g,
        fill_U=lambda a: fill_halos(a, grid, "u", vector=True),
        fill_V=lambda a: fill_halos(a, grid, "v", vector=True),
        need_eff=roms, need_final=False)

    if roms:
        # ROMS ordering for AB2 too: tracer advection runs AFTER the
        # barotropic solve with mass-consistent velocities; the advective
        # tendency joins G before it is stored as G_prev, so the AB2 blend
        # of the NEXT step sees the full tendency history.
        adv_T, adv_S, w_impl = tracer_advection_tendency(model, state_f,
                                                         averaged, dt=dt)
        G = dict(G, T=G["T"] + adv_T, S=G["S"] + adv_S)
        Gb["T"] = blend("T")
        Gb["S"] = blend("S")

    new = dict(state)
    new["u"] = (state["u"] + dt * Gb["u"]) * grid.wet_u
    new["v"] = (state["v"] + dt * Gb["v"]) * grid.wet_v
    if model.zstar:
        sig0 = column_sigma(model, state["eta"])
        sig1 = column_sigma(model, averaged.eta)
        for name in ("T", "S"):
            new[name] = ((sig0[None] * state[name]
                          + dt * Gb[name] * grid.wet_c) / sig1[None])
    else:
        new["T"] = state["T"] + dt * Gb["T"] * grid.wet_c
        new["S"] = state["S"] + dt * Gb["S"] * grid.wet_c

    new["u"], new["v"] = fs.barotropic_correct(
        new["u"], new["v"], averaged.U, averaged.V, grid)
    new["eta"] = averaged.eta
    new = implicit_vertical_step(model, new, aux, dt, w_impl=w_impl)
    new["G_prev"] = G
    new["ab2_first"] = jnp.zeros(())
    return new


def step(model, state, fluxes, dt, t=0.0):
    """One full time step. timestepper="QuasiAdamsBashforth2" dispatches to
    `ab2_step`; default is SplitRungeKutta3 (reference `:SplitRungeKutta3`,
    `omip_simulation.jl:604`): u¹ = uⁿ + Δt/3 G(uⁿ); u² = uⁿ + Δt/2 G(u¹);
    uⁿ⁺¹ = uⁿ + Δt G(u²).

    ``t``: absolute model time [s] at step start, handed to time-dependent
    closures/forcings through `ClosureAux.t`.

    stage_mode="unrolled": stages unroll in Python with per-stage prorated
    barotropic substeps ceil(γ·substeps) like the reference (~40% less 2-D
    substep work). stage_mode="scan": one stage graph via `lax.scan` with
    equal substeps — 3x smaller serialized HLO (remote-compile limits) and
    faster compiles."""
    if model.timestepper == "QuasiAdamsBashforth2":
        return ab2_step(model, state, fluxes, dt, t=t)
    if model.stage_mode == "unrolled":
        s = state
        for gamma in model.rk3_gammas:
            nsub = max(4, int(-(-model.substeps * gamma // 1)))
            s = rk3_substage(model, state, s, fluxes, gamma * dt, nsub, t=t)
        return s

    gammas = jnp.asarray(model.rk3_gammas, dtype=state["eta"].dtype)

    def stage_body(s_prev, gamma):
        s = rk3_substage(model, state, s_prev, fluxes, gamma * dt,
                         model.substeps, t=t)
        return s, None

    s, _ = jax.lax.scan(stage_body, state, gammas)
    return s


def make_step_fn(model):
    """Return a jitted ``(state, fluxes, dt) -> state`` (the model pytree is
    an argument so its arrays stay HLO parameters, not literals)."""
    jitted = jax.jit(step)

    def f(state, fluxes, dt):
        return jitted(model, state, fluxes, dt)

    return f
