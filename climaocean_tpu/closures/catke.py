"""CATKE vertical diffusivity.

TPU-native counterpart of Oceananigans' `CATKEVerticalDiffusivity` (the
reference's default ocean closure: `default_ocean_closure`, selector
`omip_simulation.jl:448-459` with `CATKEMixingLength(Cᵇ)`,
`CATKEEquation(Cᵂu★)`, viscosity/diffusivity caps = 3 m²/s and a 10 s
negative-TKE damping time scale). Structure follows Wagner et al. (2025),
"Formulation and calibration of CATKE" (JAMES): a prognostic turbulent
kinetic energy ``e`` with

    ∂t e = ∂z(κₑ ∂z e) + κᵤ S² − κ_c N² − Cᴰ e^{3/2}/ℓᴰ + surface flux

and eddy coefficients ``κ_φ = ℓ_φ √e`` where the mixing lengths blend a
wall-limited scale, a stratification scale and a convective scale:

    ℓ_φ^stable = min( C_φ^shear σ(Ri) ℓᵇ , κ_vk d )    (stable side)
    ℓᵇ  = Cᵇ √(2e) / N                                 (buoyancy length)
    ℓᶜ  = Cᶜ_φ w★³ / Jᵇ     where convecting  (N² < 0, Jᵇ > 0)
    ℓᵉ  = Cᵉ_φ Jᵇ / (w★ N²) where entraining  (N² > 0 below convection)
    ℓ_φ = max(ℓ_φ^stable, min(ℓᶜ or ℓᵉ, d))

with w★ = √e the turbulent velocity and Jᵇ the (destabilizing-positive)
surface buoyancy flux — the convective Deardorff length and the
penetrative-entrainment length of the published formulation. The
entrainment branch is what gives CATKE its calibrated entrainment ratio:
without it the scheme reduces to pure encroachment (measured c = 1.00 in
round 3; LES targets 1.2–1.5).

Exact Oceananigans constant values are not in the mounted reference tree
(CATKE lives in the unmounted Oceananigans dependency — SURVEY.md §0), so
the coefficients below are calibrated IN-TREE against the same canonical
column laws the published calibration itself targets (values pinned by
`tests/test_catke_calibration.py::test_calibration_coefficients`):

- free convection into N²=1e-5 with B₀=1e-7: the mixed layer follows
  h(t) = √(2 c B₀ t)/N; measured c = 1.49 (18 h) and 1.39 (36 h) —
  inside the LES entrainment band c ∈ [1.2, 1.5] (encroachment c = 1
  plus entrainment ratio A ≈ 0.1–0.25, c = 1 + 2A). The value is stable
  to the cell granularity (4 m) across a 4× range of Cᵉ: the entrainment
  buoyancy flux is κN² = ℓᵉ√e·N² = Cᵉ·Jᵇ·(√e/w★) = Cᵉ·Jᵇ — a
  self-limiting flux-proportional closure, the property the published
  entrainment length is built around; with Cᵉ = 0 the scheme measures
  pure encroachment c = 0.79–0.89 (the round-3 under-entrainment).
- Kato–Phillips wind deepening (u★=0.01, N²=1e-4, 24 h): measured
  coefficient h/(u★√(t/N)) = 1.09 vs the canonical 1.05 — within 5%
  (less than one 4 m cell of the 32 m layer).

Numerics: the TKE step is per-column and fully implicit in the dissipation
(linearized: ε ≈ Cᴰ √e · e / ℓ) and the vertical diffusion — one batched
tridiagonal solve, mirroring the reference's `VerticallyImplicitTimeDiscretization`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core.stencil import mzc
from ..core.tridiagonal import implicit_vertical_diffusion_matrix, solve_tridiagonal

VON_KARMAN = 0.4


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["Cb", "CWu", "Cd", "Clu", "Clc", "Cle",
                      "Cconv_u", "Cconv_c", "Cconv_e",
                      "Cent_u", "Cent_c", "Cent_e",
                      "Ri_zero", "Ri_width",
                      "sigma_minus", "maximum_viscosity",
                      "maximum_tracer_diffusivity", "maximum_tke_diffusivity",
                      "negative_tke_damping_time_scale", "minimum_tke"])
@dataclass(frozen=True)
class CATKEVerticalDiffusivity:
    Cb: float = 0.28          # buoyancy mixing-length coefficient (reference kwarg Cᵇ)
    CWu: float = 4.0          # surface TKE flux coefficient Cᵂu★: J_e = −Cᵂu★ u★³
    Cd: float = 2.0           # dissipation coefficient Cᴰ
    Clu: float = 0.6          # shear mixing-length coefficient, momentum
    Clc: float = 0.5          # shear mixing-length coefficient, tracers
    Cle: float = 1.5          # shear mixing-length coefficient, TKE
    # convective (Deardorff, ℓᶜ = Cᶜ w★³/Jᵇ) and penetrative-entrainment
    # (ℓᵉ = Cᵉ Jᵇ/(w★N²)) length coefficients per mixed quantity
    Cconv_u: float = 0.2
    Cconv_c: float = 0.6
    Cconv_e: float = 0.6
    Cent_u: float = 0.0
    Cent_c: float = 2.0
    Cent_e: float = 1.0
    Ri_zero: float = 0.25     # stability-function transition Ri
    Ri_width: float = 0.1
    sigma_minus: float = 0.15 # high-Ri asymptote of the stability function
    maximum_viscosity: float = 3.0              # omip_simulation.jl:453
    maximum_tracer_diffusivity: float = 3.0
    maximum_tke_diffusivity: float = 3.0
    negative_tke_damping_time_scale: float = 10.0   # seconds (:455)
    minimum_tke: float = 1e-9

    # ------------------------------------------------------------------ #
    def initial_prognostics(self, grid):
        return {"e": grid.new_field() + self.minimum_tke}

    def _lengths(self, grid, fields, aux):
        """Mixing lengths at w-faces for (u, c, e)."""
        e = jnp.maximum(fields["e"], self.minimum_tke)
        e_w = jnp.concatenate([e[:1], mzc(e)[:-1], e[-1:]], axis=0)  # -> faces
        sqrt_2e = jnp.sqrt(2.0 * e_w)

        N = jnp.sqrt(jnp.maximum(aux.N2, 1e-12))
        l_b = self.Cb * sqrt_2e / N                      # buoyancy length

        # distance from the surface at w-faces
        d = -grid.z_f[:, None, None]
        d = jnp.maximum(d, 1e-2)
        l_wall = VON_KARMAN * d

        Ri = aux.N2 / jnp.maximum(aux.S2, 1e-12)
        sigma = self.sigma_minus + (1.0 - self.sigma_minus) * 0.5 * (
            1.0 - jnp.tanh((Ri - self.Ri_zero) / self.Ri_width))

        # convective / entrainment branches (the published formulation's
        # structure): Jᵇ > 0 = destabilizing surface buoyancy loss; a face
        # is "convecting" when locally unstable under destabilizing flux,
        # and "entraining" when stably stratified with convection directly
        # above (the penetrative-entrainment interface at the ML base).
        Jb = jnp.maximum(-aux.Qb, 0.0)
        w_star = jnp.sqrt(e_w)
        N2_above = jnp.concatenate([aux.N2[1:], aux.N2[-1:]], axis=0)
        convecting = (aux.N2 < 0.0) & (Jb > 0.0)
        entraining = (aux.N2 > 0.0) & (N2_above < 0.0) & (Jb > 0.0)
        l_deardorff = w_star ** 3 / jnp.maximum(Jb, 1e-12)
        l_entrain = Jb / (jnp.maximum(w_star, 1e-6)
                          * jnp.maximum(aux.N2, 1e-12))

        def length(C_shear, C_conv, C_ent):
            l_stable = jnp.minimum(C_shear * sigma * l_b, l_wall)
            l_h = jnp.where(convecting, C_conv * l_deardorff,
                            jnp.where(entraining, C_ent * l_entrain, 0.0))
            return jnp.maximum(l_stable, jnp.minimum(l_h, d))

        return (length(self.Clu, self.Cconv_u, self.Cent_u),
                length(self.Clc, self.Cconv_c, self.Cent_c),
                length(self.Cle, self.Cconv_e, self.Cent_e),
                e_w)

    def diffusivities(self, grid, fields, aux):
        l_u, l_c, _, e_w = self._lengths(grid, fields, aux)
        sqrt_e = jnp.sqrt(e_w)
        nu = jnp.minimum(l_u * sqrt_e, self.maximum_viscosity)
        kap = jnp.minimum(l_c * sqrt_e, self.maximum_tracer_diffusivity)
        return nu * grid.wet_w, kap * grid.wet_w

    def step_prognostics(self, grid, fields, aux, dt):
        """Advance TKE implicitly (diffusion + linearized dissipation +
        negative-TKE damping); shear/buoyancy production and surface flux
        enter the right-hand side explicitly."""
        e = fields["e"]
        l_u, l_c, l_e, e_w = self._lengths(grid, fields, aux)
        sqrt_e_w = jnp.sqrt(e_w)
        nu_w = jnp.minimum(l_u * sqrt_e_w, self.maximum_viscosity) * grid.wet_w
        kap_w = jnp.minimum(l_c * sqrt_e_w, self.maximum_tracer_diffusivity) * grid.wet_w
        kap_e = jnp.minimum(l_e * sqrt_e_w, self.maximum_tke_diffusivity) * grid.wet_w

        # production terms at centers (average the face-located products)
        prod = mzc((nu_w * aux.S2 - kap_w * aux.N2)[:-1])
        prod = jnp.concatenate([prod[:-1], (nu_w * aux.S2 - kap_w * aux.N2)[-2:-1]],
                               axis=0)

        # dissipation length at centers; the top cell closes one-sided
        # (a plain mzc would roll the BOTTOM face's N² into the top cell)
        e_c = jnp.maximum(e, self.minimum_tke)
        d_c = jnp.maximum(-grid.z_c[:, None, None], 1e-2)
        N2_c = jnp.concatenate([mzc(aux.N2[:-1])[:-1], aux.N2[-2:-1]],
                               axis=0)
        N_c = jnp.sqrt(jnp.maximum(N2_c, 1e-12))
        l_D = jnp.minimum(self.Cb * jnp.sqrt(2.0 * e_c) / N_c, VON_KARMAN * d_c)
        l_D = jnp.maximum(l_D, 1e-2)

        # surface TKE flux J_e = -CWu u★³ deposited in the top cell
        dz_top = grid.dz_c[-1]
        rhs_sfc = self.CWu * aux.u_star ** 3 / dz_top

        rhs = e + dt * (prod + _top_slot(rhs_sfc, e))
        rhs = rhs * grid.wet_c

        a, b, c = implicit_vertical_diffusion_matrix(
            kap_e, grid.dz_c, grid.dz_f, dt, grid.wet_c, grid.wet_w)
        # implicit linearized dissipation: + dt Cd sqrt(e)/lD on the diagonal,
        # and fast damping of negative TKE.
        diss = dt * self.Cd * jnp.sqrt(e_c) / l_D
        damp = dt / self.negative_tke_damping_time_scale * (e < 0)
        b = b + (diss + damp) * grid.wet_c

        e_new = solve_tridiagonal(a, b, c, rhs) * grid.wet_c
        return {"e": e_new}


def _top_slot(surface_value, like):
    """Embed a (Nyp, Nxp) surface field into the top slice of a 3-D zero field."""
    out = jnp.zeros_like(like)
    return out.at[-1].set(surface_value)
