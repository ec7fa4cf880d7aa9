"""GM/Redi mesoscale eddy parameterization.

TPU-native rebuild of Oceananigans' `IsopycnalSkewSymmetricDiffusivity`
(reference call site: `one_degree_tripolar.jl` closure with κ_skew = 500,
κ_symmetric = 200 m²/s; selector `omip_simulation.jl:481-485`).

Redi (symmetric) part — small-slope Griffies (1998) tensor with isoneutral
slope S = −∇_h b / ∂_z b (flux-tapered at |S| > S_max):

    Fx = −κ_R (∂x c + Sx ∂z c)
    Fz = −κ_R (Sx ∂x c + Sy ∂y c) − κ_R |S|² ∂z c

with the diagonal vertical piece κ_R |S|² riding the shared implicit
tridiagonal solve (`diffusivities`); the rest explicit.

GM (skew) part — ADVECTIVE (bolus-velocity) form: the eddy-induced
streamfunction ψ = κ_GM S gives

    u★ = −∂z ψx,  v★ = −∂z ψy,  w★ = ∂x ψx + ∂y ψy

discretely DIVERGENCE-FREE by construction (the δx/δz operators commute),
and tracers are advected with (u★, v★, w★) by donor-cell upwind fluxes —
unconditionally variance-non-increasing. The equivalent skew-FLUX
discretization (±κ_GM S cross terms with independently interpolated
gradients) is not discretely antisymmetric and pumps tracer variance where
the taper pins |S| at S_max: measured at 1° tripolar as exponential
salinity growth (~/2 days) in weakly-stratified high latitudes — the
round-4 year-long validation caught it; the advective form is neutral
there by construction. Applied to T and S, not momentum.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core.stencil import (Z, dxc, dxf, dyc, dyf, mxc, mxf, myc, myf,
                            shift_clamp)


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["kappa_skew", "kappa_symmetric", "slope_max", "N2_min"])
@dataclass(frozen=True)
class IsopycnalSkewSymmetricDiffusivity:
    kappa_skew: float = 500.0          # κ_GM (bolus/skew)
    kappa_symmetric: float = 200.0     # κ_R (Redi isoneutral)
    slope_max: float = 1e-2            # flux-tapering slope limit
    N2_min: float = 1e-9               # ∂z b floor for slope computation

    def initial_prognostics(self, grid):
        return {}

    def _slopes(self, grid, aux):
        """Isoneutral slopes at x-faces (f,c,c) and y-faces (c,f,c), plus
        the taper factor; all at cell-center vertical levels."""
        b = aux.b
        # ∂z b at centers (mean of WET face N² — a dry face below a bottom
        # cell differences real buoyancy against the land cell's masked
        # state, garbage that must not set the slope), floored
        N2f = aux.N2 * grid.wet_w
        N2_c = 0.5 * (N2f[:-1] + N2f[1:])
        bz = jnp.maximum(N2_c, self.N2_min)

        bx = dxf(b) / grid.dx_fc                     # at (f,c,c)
        by = dyf(b) / grid.dy_cf                     # at (c,f,c)
        Sx = -bx / mxf(bz)
        Sy = -by / myf(bz)

        # tapering: the (S_max/|S|)² flux limit ALONE holds rotation at
        # full strength exactly at the cap, and a capped-slope rotated
        # flux at weakly-stratified bottom corners is antidiffusive —
        # measured in the round-4 year run as a coastal bottom cell
        # densifying without bound (S +0.2/day). The added
        # Danabasoglu–McWilliams-style tanh factor switches rotation
        # smoothly OFF above S_max instead (interior slopes ~1e-3 are
        # untouched; fac ≈ 0.02 by 1.2·S_max).
        def taper(S):
            mag = jnp.abs(S)
            fac = jnp.where(mag > self.slope_max,
                            (self.slope_max / jnp.maximum(mag, 1e-30)) ** 2,
                            1.0)
            fac = fac * 0.5 * (1.0 + jnp.tanh(
                (self.slope_max - mag) / (0.1 * self.slope_max)))
            return jnp.clip(S, -10 * self.slope_max, 10 * self.slope_max), fac

        Sx, tx = taper(Sx)
        Sy, ty = taper(Sy)
        return Sx, Sy, tx, ty

    def diffusivities(self, grid, fields, aux):
        """Diagonal vertical Redi piece κ_R |S|², implicit."""
        Sx, Sy, tx, ty = self._slopes(grid, aux)
        # |S|² at w-faces: interp face-located slopes to centers then faces
        # (wall-face slopes are spurious — see horizontal_tendencies)
        Sx_c = mxc(Sx * tx * grid.wet_u)
        Sy_c = myc(Sy * ty * grid.wet_v)
        S2_c = Sx_c ** 2 + Sy_c ** 2
        S2_w = jnp.concatenate([S2_c[:1], 0.5 * (S2_c[:-1] + S2_c[1:]),
                                S2_c[-1:]], axis=0)
        kap_w = self.kappa_symmetric * jnp.minimum(S2_w, self.slope_max ** 2 * 100)
        zeros = jnp.zeros_like(kap_w)
        return zeros, kap_w * grid.wet_w

    def horizontal_tendencies(self, grid, fields, aux):
        from ..core.stencil import xm1, ym1

        Sx, Sy, tx, ty = self._slopes(grid, aux)
        kR = self.kappa_symmetric
        kGM = self.kappa_skew
        dz = grid.dz_c[:, None, None]

        # --- eddy-induced (bolus) velocities from ψ = κ_GM S -------------
        # ψ lives at u/v-face W-LEVELS and VANISHES at the surface, the
        # column bottom, and every level where either adjacent face level
        # is dry — the streamfunction boundary condition. u★ = −δz ψ and
        # w★ = ∇·ψ then carry NO transport through bathymetry and are
        # discretely divergence-free INCLUDING at staircases (the δx/δz
        # operators commute on the same masked ψ). Masking the fluxes
        # instead (round-4 first attempt) breaks the cancellation exactly
        # at coastal steps and pumps tracer there — the year-validation
        # blowup's second act.
        psi_x = kGM * tx * Sx * grid.wet_u
        psi_y = kGM * ty * Sy * grid.wet_v

        def to_w(p, wet):
            inner = 0.5 * (p[:-1] + p[1:]) * (wet[:-1] * wet[1:])
            return jnp.concatenate([jnp.zeros_like(p[:1]), inner,
                                    jnp.zeros_like(p[:1])], axis=0)

        psi_xw = to_w(psi_x, grid.wet_u)              # (Nz+1, f,c)
        psi_yw = to_w(psi_y, grid.wet_v)
        u_star = -(psi_xw[1:] - psi_xw[:-1]) / dz     # (f,c,c), self-masked
        v_star = -(psi_yw[1:] - psi_yw[:-1]) / dz
        w_star = (dxc(grid.dy_fc * psi_xw) + dyc(grid.dx_cf * psi_yw)) \
            / grid.az_cc                              # (c,c,f), 0 at ends

        out = {}
        for name in ("T", "S"):
            if name not in fields:
                continue
            c = fields[name]
            dcdz_c = _dz_centered(c, grid)            # ∂z c at centers

            # --- Redi symmetric part (κ_R) -------------------------------
            Fx = (-kR * tx * dxf(c) / grid.dx_fc
                  - kR * tx * Sx * mxf(dcdz_c)) * grid.wet_u
            Fy = (-kR * ty * dyf(c) / grid.dy_cf
                  - kR * ty * Sy * myf(dcdz_c)) * grid.wet_v
            # explicit vertical cross-flux at w-faces. The face gradients
            # MUST be wet-masked like Fx/Fy: at an immersed wall dxf(c)
            # differences a land cell's masked value (≈0) against the
            # ocean — a huge spurious gradient driving an anti-diffusive
            # vertical flux (measured at 1° as runaway subsurface cooling
            # along freshly-dried coastlines).
            cross_c = (mxc(tx * Sx * dxf(c) / grid.dx_fc * grid.wet_u)
                       + myc(ty * Sy * dyf(c) / grid.dy_cf * grid.wet_v))
            cross_w = jnp.concatenate(
                [jnp.zeros_like(cross_c[:1]),
                 0.5 * (cross_c[:-1] + cross_c[1:]),
                 jnp.zeros_like(cross_c[:1])], axis=0)
            Fz = -kR * cross_w * grid.wet_w

            # --- GM bolus advection (donor-cell upwind) ------------------
            # no extra wet mask on the advective part: u★/v★ are already
            # zero at dry faces BY CONSTRUCTION of ψ, and re-masking would
            # break the divergence-free cancellation at staircases
            c_up_x = jnp.where(u_star >= 0, xm1(c), c)
            c_up_y = jnp.where(v_star >= 0, ym1(c), c)
            Ax = grid.dy_fc * dz * (u_star * c_up_x + Fx)
            Ay = grid.dx_cf * dz * (v_star * c_up_y + Fy)
            c_up_z = jnp.where(w_star[1:-1] >= 0, c[:-1], c[1:])
            wc = jnp.concatenate([jnp.zeros_like(c[:1]),
                                  w_star[1:-1] * c_up_z,
                                  jnp.zeros_like(c[:1])], axis=0)

            div = (dxc(Ax) + dyc(Ay)) / (grid.az_cc * dz) \
                + ((wc[1:] - wc[:-1]) + (Fz[1:] - Fz[:-1])) / dz
            out[name] = -div * grid.wet_c
        return out


def _dz_centered(c, grid):
    """∂z c at centers via clamped differences, WET-FACE masked: the
    bottom wet cell of a column must not difference against the dry cell
    below (masked value ≈ 0 → a huge spurious gradient ~c/Δz that drives
    runaway Redi cross fluxes along bathymetry — a round-4 year-validation
    find, T swinging to −125 °C at mid-depth coastal cells)."""
    dz_f = grid.dz_f[:, None, None]
    d_lo = (c - shift_clamp(c, Z, -1)) / dz_f[:-1] \
        * grid.wet_w[:-1]                              # at faces 0..Nz-1
    d_hi = jnp.concatenate([d_lo[1:], jnp.zeros_like(d_lo[:1])], axis=0)
    return 0.5 * (d_lo + d_hi)
