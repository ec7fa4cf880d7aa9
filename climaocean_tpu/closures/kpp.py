"""KPP (K-Profile Parameterization) vertical mixing.

TPU-native port of the reference's vendored KPP closure — Large, McWilliams
& Doney (1994) as implemented by MITgcm/pkg/kpp and vendored at
`/root/reference/src/OMIPConfigurations/KPP/` (551 LoC; SURVEY.md §2a).
Parameters are the reference's calibrated MITgcm defaults
(`kpp_parameters.jl:62-98`), and each stage mirrors the reference files:

* Monin-Obukhov velocity scales wm/ws, branchless stable/unstable
  (`kpp_velocity_scales.jl:4-26`);
* interior mixing = internal-wave background + cubic-smoothed shear
  instability + convective instability (`kpp_interior_mixing.jl:30-46`);
* bulk-Richardson boundary-layer depth with first-crossing linear
  interpolation + Ekman/Monin-Obukhov stable clamps
  (`kpp_boundary_layer_depth.jl:4-65`);
* cubic shape function G(σ) with C¹ interior matching and clamped dG1,
  nonlocal transport coefficient γ = min(cg/(ws·hbl), 100), active only
  under destabilizing forcing (`kpp_boundary_layer_mixing.jl:4-33`);
* nonlocal tracer flux −κ·γ·Q₀ treated explicitly alongside the implicit
  local diffusion (`kpp_nonlocal_flux.jl:1-27`).

The reference's two KernelAbstractions kernels (per-column sweep + per-
interface pointwise, `kpp_compute_closure_fields.jl`) become a reverse
`lax.scan` over z with full (y, x) planes vectorized on the VPU, plus fused
pointwise math — the same branchless structure, TPU-shaped.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core.stencil import mxc, myc

# two-band shortwave (mirrors models.hydrostatic's Jerlov-I profile and the
# reference's radiation.first_color_fraction / absorption coefficients)
_SW_FRAC1 = 0.58
_SW_KAPPA1 = 1.0 / 0.35
_SW_KAPPA2 = 1.0 / 23.0


@partial(jax.tree_util.register_dataclass, data_fields=[], meta_fields=[
    "Ri_c", "C_ek", "C_mo", "C_cv", "boundary_layer_solar_fraction",
    "limit_hbl_stable", "kappa_v", "eps", "C_st",
    "Am", "Bm", "Cm", "zeta_m", "As", "Bs", "Cs", "zeta_s",
    "Ri_inf", "nu0_sh", "kappa0_sh", "nu_iw", "kappa_iw",
    "N2_con", "nu_con", "kappa_con", "C_star",
    "minimum_boundary_layer_depth", "minimum_friction_velocity",
    "maximum_viscosity", "maximum_diffusivity"])
@dataclass(frozen=True)
class KPPVerticalDiffusivity:
    """Reference `KPPParameters` MITgcm defaults (`kpp_parameters.jl:62-98`)
    + closure caps (`kpp_vertical_diffusivity.jl`: max ν = max κ = 1)."""
    Ri_c: float = 0.3
    C_ek: float = 0.7
    C_mo: float = 1.0
    C_cv: float = 1.8
    boundary_layer_solar_fraction: float = 1.0
    limit_hbl_stable: bool = True
    kappa_v: float = 0.4          # von Karman
    eps: float = 0.1              # surface-layer fraction ε
    C_st: float = 5.0
    Am: float = 1.257
    Bm: float = 8.380
    Cm: float = 16.0
    zeta_m: float = -0.2
    As: float = -28.86
    Bs: float = 98.96
    Cs: float = 16.0
    zeta_s: float = -1.0
    Ri_inf: float = 0.7
    nu0_sh: float = 5e-3
    kappa0_sh: float = 5e-3
    nu_iw: float = 5e-5
    kappa_iw: float = 5e-6
    N2_con: float = -0.2e-4
    nu_con: float = 0.1
    kappa_con: float = 0.1
    C_star: float = 10.0
    minimum_boundary_layer_depth: float = 1.0
    minimum_friction_velocity: float = 1e-6
    maximum_viscosity: float = 1.0
    maximum_diffusivity: float = 1.0

    # ------------------------------------------------------------------ #
    def initial_prognostics(self, grid):
        return {}

    def _velocity_scales(self, sigma, hbl, u_star, Bf):
        """`velocity_scales` (`kpp_velocity_scales.jl:4-26`), branchless."""
        p = self
        zeta = p.kappa_v * sigma * hbl * Bf / jnp.maximum(u_star ** 3, 1e-20)
        zeta_u = jnp.minimum(zeta, 0.0)
        w_stable = p.kappa_v * u_star / (1.0 + p.C_st * jnp.maximum(zeta, 0.0))
        wm_unst = p.kappa_v * u_star * jnp.where(
            zeta_u > p.zeta_m,
            jnp.sqrt(jnp.sqrt(1.0 - p.Cm * zeta_u)),
            jnp.cbrt(p.Am - p.Bm * jnp.minimum(zeta_u, p.zeta_m)))
        ws_unst = p.kappa_v * u_star * jnp.where(
            zeta_u > p.zeta_s,
            jnp.sqrt(1.0 - p.Cs * zeta_u),
            jnp.cbrt(p.As - p.Bs * jnp.minimum(zeta_u, p.zeta_s)))
        stable = Bf >= 0.0
        return (jnp.where(stable, w_stable, wm_unst),
                jnp.where(stable, w_stable, ws_unst))

    def _interior(self, grid, aux):
        """Interior (ν, κ) at w-faces (`kpp_interior_mixing.jl:30-46`)."""
        p = self
        Ri = aux.N2 / jnp.maximum(aux.S2, 1e-10)
        r = jnp.clip(jnp.maximum(Ri, 0.0) / p.Ri_inf, 0.0, 1.0)
        f_sh = (1.0 - r * r) ** 3
        Ng = jnp.maximum(aux.N2, p.N2_con)
        rc = jnp.clip((p.N2_con - Ng) / p.N2_con, None, 1.0)
        f_cv = (1.0 - rc * rc) ** 3
        nu = p.nu_iw + f_sh * p.nu0_sh + f_cv * p.nu_con
        kap = p.kappa_iw + f_sh * p.kappa0_sh + f_cv * p.kappa_con
        return nu * grid.wet_w, kap * grid.wet_w

    def _surface_forcing(self, grid, aux):
        """u★, non-solar Bo (positive = stabilizing), α, solar flux."""
        u_star = jnp.maximum(aux.u_star, self.minimum_friction_velocity)
        fl = aux.fluxes
        g = 9.80665
        Bo = g * (aux.alpha * fl.Q_T - aux.beta * fl.Q_S)
        J_sw = g * aux.alpha * fl.Q_sw         # solar buoyancy flux, + into ocean
        return u_star, Bo, J_sw

    @staticmethod
    def _sw_fraction(d):
        return (_SW_FRAC1 * jnp.exp(-_SW_KAPPA1 * d)
                + (1.0 - _SW_FRAC1) * jnp.exp(-_SW_KAPPA2 * d))

    def _Bf_at(self, d, Bo, J_sw):
        """Buoyancy forcing integrated above depth d: Bo + solar absorbed
        above d (`kpp_surface_forcing.jl:37-54`)."""
        return Bo + J_sw * (1.0 - self._sw_fraction(d))

    def _boundary_layer_depth(self, grid, fields, aux, u_star, Bo, J_sw):
        """Bulk-Ri first-crossing sweep (`kpp_boundary_layer_depth.jl:24-65`),
        as a reverse lax.scan over cell centers with (y, x) planes."""
        p = self
        Nz = grid.Nz
        beta_T = 0.2
        Vtc = p.C_cv * jnp.sqrt(beta_T / (p.Bs * p.eps)) / (p.Ri_c * p.kappa_v ** 2)

        b = aux.b
        u_c = mxc(fields["u"])
        v_c = myc(fields["v"])
        b0, u0, v0 = b[-1], u_c[-1], v_c[-1]
        z0 = grid.z_c[-1]

        # N² at centers = mean of the two adjacent faces
        N2_center = 0.5 * (aux.N2[:-1] + aux.N2[1:])   # (Nz, ...)

        H_col = grid.column_depth

        def body(carry, xs):
            found, hbl, Rib_p, d_p = carry
            bk, uk, vk, zc_k, wet_k, N2_k = xs
            d = z0 - zc_k
            db = b0 - bk
            dV2 = (u0 - uk) ** 2 + (v0 - vk) ** 2
            Bf = self._Bf_at(d, Bo, J_sw)
            sigma = jnp.where(Bf >= 0.0, 1.0, p.eps)
            _, ws = self._velocity_scales(sigma, d, u_star, Bf)
            Vt2 = d * ws * jnp.sqrt(jnp.maximum(N2_k, 0.0)) * Vtc
            Rib = d * db / jnp.maximum(dV2 + Vt2, 1e-10)
            Rib = jnp.where(wet_k > 0, Rib, 0.0)
            crossed = (Rib >= p.Ri_c) & (~found)
            hbl_new = jnp.where(
                crossed,
                d_p + (d - d_p) * (p.Ri_c - Rib_p)
                / jnp.maximum(Rib - Rib_p, 1e-10),
                hbl)
            found = found | (Rib >= p.Ri_c)
            return (found, hbl_new, Rib, d), None

        shape = b0.shape
        init = (jnp.zeros(shape, bool), H_col,
                jnp.zeros(shape, b.dtype), jnp.zeros(shape, b.dtype))
        zc3 = jnp.broadcast_to(grid.z_c[:, None, None], b.shape)
        xs = (b[:-1], u_c[:-1], v_c[:-1], zc3[:-1], grid.wet_c[:-1],
              N2_center[:-1])
        (found, hbl, _, _), _ = jax.lax.scan(body, init, xs, reverse=True)

        # stable clamps (`apply_stable_hbl_limits`)
        f_cor = 2.0 * 7.292115e-5 * jnp.abs(jnp.sin(jnp.deg2rad(grid.lat_cc)))
        h_ek = p.C_ek * u_star / jnp.maximum(f_cor, 1e-10)
        h_mo = p.C_mo * u_star ** 3 / jnp.maximum(p.kappa_v * Bo, 1e-10)
        stable = (Bo > 0.0) & p.limit_hbl_stable
        hbl = jnp.where(stable, jnp.minimum(jnp.minimum(hbl, h_ek), h_mo), hbl)
        hbl = jnp.where(found, hbl, p.minimum_boundary_layer_depth)
        return jnp.maximum(hbl, p.minimum_boundary_layer_depth)

    def _compute(self, grid, fields, aux):
        """Full KPP: returns (κu, κc, γ) at w-faces."""
        p = self
        nu_i, kap_i = self._interior(grid, aux)
        u_star, Bo, J_sw = self._surface_forcing(grid, aux)
        hbl = self._boundary_layer_depth(grid, fields, aux, u_star, Bo, J_sw)

        z0 = grid.z_c[-1]
        d_f = (z0 - grid.z_f)[:, None, None]            # depth of each face

        # FD pair around hbl: k_cross = #faces with d > hbl (d decreases in k)
        below = (d_f > hbl[None]).astype(jnp.int32)
        k_cross = jnp.sum(below, axis=0)
        k_lo = jnp.clip(k_cross - 1, 0, grid.Nz)
        k_hi = jnp.clip(k_cross, 0, grid.Nz)

        def take_k(a, k2d):
            return jnp.take_along_axis(a, k2d[None], axis=0)[0]

        nu_lo, nu_hi = take_k(nu_i, k_lo), take_k(nu_i, k_hi)
        kap_lo, kap_hi = take_k(kap_i, k_lo), take_k(kap_i, k_hi)
        zf = jnp.broadcast_to(grid.z_f[:, None, None], nu_i.shape)
        dz_pair = jnp.maximum(take_k(zf, k_hi) - take_k(zf, k_lo), 1e-10)
        have_below = k_cross >= 1
        dnu = jnp.where(have_below, (nu_hi - nu_lo) / dz_pair, 0.0)
        dkap = jnp.where(have_below, (kap_hi - kap_lo) / dz_pair, 0.0)

        # matching coefficients at σ = 1 (`matching_coefficients`)
        sigma1 = jnp.where(Bo >= 0.0, 1.0, p.eps)
        wm1, ws1 = self._velocity_scales(sigma1, hbl, u_star, Bo)

        def matching(K_int, dKdz, w):
            G1 = K_int / jnp.maximum(hbl * w, 1e-30)
            f1 = jnp.where(Bo >= 0.0,
                           p.C_st * Bo / jnp.maximum(u_star ** 4, 1e-30), 0.0)
            dG1 = -dKdz / jnp.maximum(w, 1e-30) + f1 * K_int
            return G1, jnp.minimum(dG1, 0.0)

        G1u, dG1u = matching(nu_lo, dnu, wm1)
        G1s, dG1s = matching(kap_lo, dkap, ws1)

        # per-interface profile
        sigma = d_f / jnp.maximum(hbl, 1e-10)[None]
        in_bl = (sigma < 1.0) & (sigma >= 0.0)
        Bf = self._Bf_at(d_f, Bo[None], J_sw[None])
        sigw = jnp.where(Bf >= 0.0, 1.0, p.eps)
        wm, ws = self._velocity_scales(sigw, hbl[None], u_star[None], Bf)

        def G(sig, G1, dG1):
            return (sig - 2.0) + (3.0 - 2.0 * sig) * G1 + (sig - 1.0) * dG1

        nu_bl = hbl[None] * wm * sigma * (1.0 + sigma * G(sigma, G1u[None], dG1u[None]))
        kap_bl = hbl[None] * ws * sigma * (1.0 + sigma * G(sigma, G1s[None], dG1s[None]))

        nu = jnp.minimum(jnp.where(in_bl, jnp.maximum(nu_bl, nu_i), nu_i),
                         p.maximum_viscosity)
        kap = jnp.minimum(jnp.where(in_bl, jnp.maximum(kap_bl, kap_i), kap_i),
                          p.maximum_diffusivity)

        cg = p.C_star * p.kappa_v * jnp.cbrt(p.Bs * p.kappa_v * p.eps)
        gamma = jnp.minimum(cg / jnp.maximum(ws * hbl[None], 1e-30), 100.0)
        gamma = jnp.where(in_bl & (Bo < 0.0)[None], gamma, 0.0)

        wet = grid.wet_w
        return nu * wet, kap * wet, gamma * wet

    # --- closure protocol ------------------------------------------------- #
    def diffusivities(self, grid, fields, aux):
        nu, kap, _ = self._compute(grid, fields, aux)
        return nu, kap

    def horizontal_tendencies(self, grid, fields, aux):
        """Nonlocal tracer flux −κ·γ·Q₀ divergence, explicit
        (`kpp_nonlocal_flux.jl`)."""
        _, kap, gamma = self._compute(grid, fields, aux)
        fl = aux.fluxes
        dz = grid.dz_c[:, None, None]
        out = {}
        for name, Q0 in (("T", fl.Q_T + fl.Q_sw * self.boundary_layer_solar_fraction),
                         ("S", fl.Q_S)):
            # flux at faces (KPP sign: F = −κ γ Q₀; tendency = −∂z F)
            F = -kap * gamma * Q0[None]
            F = F.at[0].set(0.0).at[-1].set(0.0) * grid.wet_w
            out[name] = -(F[1:] - F[:-1]) / dz * grid.wet_c
        return out
