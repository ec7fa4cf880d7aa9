"""NEMO 3.6 TKE vertical mixing (zdftke + zdfevd).

TPU-native port of the reference's vendored NEMOTKE closure
(`/root/reference/src/OMIPConfigurations/NEMOTKE/`, 663 LoC; SURVEY.md §2a)
— Blanke & Delecluse (1993) / Gaspar et al. (1990) with the OMIP-2 ORCA1
namelist preset (`nemo_tke_parameters.jl:11-35`, NEMO names in comments):

* prognostic TKE ``e`` with a per-column implicit (Thomas) solve, surface
  Dirichlet ``e = max(rn_emin0, rn_ebb·u★²)``, implicit linearized
  dissipation ω = Cᴰ√eⁿ/ℓ_prev (`nemo_tke_compute_closure_fields.jl:101-168`);
* eⁿ snapshot per outer RK3 step: every substage integrates its Δτ from the
  same eⁿ (realized here by the stepper's restart-from-state0 semantics);
* gradient-limited mixing length ℓ = max(ℓ_min, √(2e/N²)) with the two-pass
  up/down limiter |Δℓ| ≤ Δz (`nemo_tke_mixing_length.jl`, nn_mxl=2);
* K = Cᴷ·ℓ·√e with background floors (rn_avm0=1.2e-4, rn_avt0=1.2e-5) and
  caps (`nemo_tke_diffusivities.jl`);
* Langmuir source (Axell 2002) with the diagnostic LC depth integral
  (`nemo_tke_langmuir.jl`); Mellor-Blumberg wave penetration with
  latitude-dependent decay length and ice damping (`nemo_tke_wave_penetration.jl`);
* EVD overwrite K → 100 m²/s where N² ≤ −1e-12 (`nemo_tke_evd.jl`).

The reference's branchless in-kernel Thomas solve + column sweeps become
`lax.scan`s over z with (y, x) planes on the VPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core.stencil import shift_clamp, Z
from ..core.tridiagonal import solve_tridiagonal


@partial(jax.tree_util.register_dataclass, data_fields=[], meta_fields=[
    "C_K", "C_D", "C_b", "C_L", "C_f", "C_s", "kappa_evd", "nu_bg", "kappa_bg",
    "minimum_TKE", "minimum_surface_TKE", "minimum_mixing_length",
    "apply_langmuir", "apply_wave_penetration", "apply_evd",
    "apply_evd_to_momentum", "latitude_dependent_htau",
    "maximum_viscosity", "maximum_diffusivity"])
@dataclass(frozen=True)
class NEMOTKEVerticalDiffusivity:
    C_K: float = 0.1            # rn_ediff
    C_D: float = 0.7            # rn_ediss
    C_b: float = 3.75           # rn_ebb
    C_L: float = 0.15           # rn_lc
    C_f: float = 1.0            # rn_efr
    C_s: float = 0.016          # Stokes proxy u_s = C_s sqrt(|tau|)
    kappa_evd: float = 100.0    # rn_avevd
    nu_bg: float = 1.2e-4       # rn_avm0
    kappa_bg: float = 1.2e-5    # rn_avt0
    minimum_TKE: float = 1.4142135623730951e-6   # rn_emin = sqrt(2)e-6
    minimum_surface_TKE: float = 1e-4            # rn_emin0
    minimum_mixing_length: float = 0.04          # rn_mxl0
    apply_langmuir: bool = True
    apply_wave_penetration: bool = True
    apply_evd: bool = True
    apply_evd_to_momentum: bool = True
    latitude_dependent_htau: bool = True         # nn_htau = 1
    maximum_viscosity: float = 100.0
    maximum_diffusivity: float = 100.0

    # ------------------------------------------------------------------ #
    def initial_prognostics(self, grid):
        return {"e": grid.new_field() + self.minimum_TKE,
                "ell": grid.new_field() + self.minimum_mixing_length}

    def _N2_centered(self, aux):
        """N² averaged to centers with clamped end faces
        (`_N²_centered`: faces clamped to [2, Nz] 1-based = our [1, Nz-1])."""
        N2 = aux.N2
        Nz = N2.shape[0] - 1
        k = jnp.arange(Nz)
        k_lo = jnp.clip(k, 1, Nz - 1)
        k_hi = jnp.clip(k + 1, 1, Nz - 1)
        return 0.5 * (N2[k_lo] + N2[k_hi])

    def _faces_from_centers(self, a):
        """Clamped mean of adjacent centers at every face (Nz+1)."""
        lo = shift_clamp(a, Z, -1)
        mid = 0.5 * (a + lo)
        return jnp.concatenate([a[:1], mid[1:], a[-1:]], axis=0)

    def _K_faces(self, e, ell):
        return self.C_K * self._faces_from_centers(ell) * jnp.sqrt(
            jnp.maximum(self._faces_from_centers(e), 0.0))

    # --- closure protocol: diffusivities -------------------------------- #
    def diffusivities(self, grid, fields, aux):
        p = self
        KT = self._K_faces(fields["e"], fields["ell"])
        Km = jnp.clip(KT, p.nu_bg, p.maximum_viscosity)
        Kr = jnp.clip(KT, p.kappa_bg, p.maximum_diffusivity)
        if p.apply_evd:
            evd = aux.N2 <= -1e-12
            Kr = jnp.where(evd, p.kappa_evd, Kr)
            if p.apply_evd_to_momentum:
                Km = jnp.where(evd, p.kappa_evd, Km)
        return Km * grid.wet_w, Kr * grid.wet_w

    # --- closure protocol: prognostic TKE step --------------------------- #
    def step_prognostics(self, grid, fields, aux, dt):
        p = self
        Nz = grid.Nz
        e_n = fields["e"]                 # stage-anchor eⁿ (stepper semantics)
        ell_prev = jnp.maximum(fields["ell"], p.minimum_mixing_length)
        wet = grid.wet_c
        fl = aux.fluxes

        # surface forcing
        tau_mag = jnp.sqrt(fl.tau_x ** 2 + fl.tau_y ** 2)
        u_star2 = tau_mag
        e_surf = jnp.maximum(p.minimum_surface_TKE, p.C_b * u_star2)
        ice_frac = getattr(fl, "ice_fraction", None)
        alpha_ice = jnp.zeros_like(tau_mag) if ice_frac is None else ice_frac

        # Langmuir setup
        u_s = p.C_s * jnp.sqrt(tau_mag)
        u_s2 = u_s * u_s
        depth_c = -grid.z_c[:, None, None]                       # z_c < 0
        dz = grid.dz_c[:, None, None]
        N2_c = jnp.maximum(self._N2_centered(aux), 0.0)
        # diagnostic LC depth: first (from top) crossing of the cumulative
        # integral max(N²,0)·|z|·Δz > u_s²/2  (`_diagnose_langmuir_depth`)
        contrib = (N2_c * depth_c * dz * wet)[::-1]              # top -> bottom
        cum = jnp.cumsum(contrib, axis=0)
        crossed = cum > 0.5 * u_s2[None]
        first = crossed & (jnp.cumsum(crossed.astype(jnp.int32), axis=0) == 1)
        h_LC = jnp.sum(jnp.where(first, depth_c[::-1], 0.0), axis=0)

        lat = grid.lat_cc
        if p.latitude_dependent_htau:
            h_tau = jnp.clip(45.0 * jnp.abs(jnp.sin(jnp.deg2rad(lat))), 0.5, 30.0)
        else:
            h_tau = jnp.full_like(lat, 10.0)

        # sources at centers
        if p.apply_langmuir:
            h_safe = jnp.maximum(h_LC, 1e-10)[None]
            arg = jnp.where(depth_c < h_LC[None], jnp.pi * depth_c / h_safe, 0.0)
            w_lc = p.C_L * u_s[None] * jnp.sin(arg)
            LC = w_lc ** 3 / h_safe
        else:
            LC = 0.0
        if p.apply_wave_penetration:
            WP = (p.C_f * e_surf[None]
                  * jnp.exp(-depth_c / jnp.maximum(h_tau, 1e-10)[None])
                  * (1.0 - alpha_ice[None]))
        else:
            WP = 0.0

        # tridiagonal system (K at faces from previous e, ℓ — the reference
        # reads the cached K.κu)
        Km = jnp.clip(self._K_faces(e_n, ell_prev), p.nu_bg,
                      p.maximum_viscosity) * grid.wet_w
        K_lo = Km[:-1]                                  # face below cell k
        K_hi = Km[1:]                                   # face above
        dz_lo = jnp.concatenate([jnp.ones_like(dz[:1]), dz[:-1]], axis=0)
        dz_hi = jnp.concatenate([dz[1:], jnp.ones_like(dz[:1])], axis=0)
        K_lo = K_lo.at[0].set(0.0)                      # bottom no-flux
        K_hi = K_hi.at[-1].set(0.0)                     # (top row replaced)

        a = -dt * K_lo / (dz * dz_lo)
        c = -dt * K_hi / (dz * dz_hi)
        omega = p.C_D * jnp.sqrt(jnp.maximum(e_n, 0.0)) / ell_prev
        Kc = 0.5 * (K_lo + K_hi)
        S2_c = 0.5 * (aux.S2[:-1] + aux.S2[1:])
        d_rhs = e_n + dt * (Kc * S2_c - Kc * self._N2_centered(aux) + LC + WP)
        b = 1.0 + dt * omega - a - c

        # surface Dirichlet row
        a = a.at[-1].set(0.0)
        c = c.at[-1].set(0.0)
        b = b.at[-1].set(1.0)
        d_rhs = d_rhs.at[-1].set(e_surf)

        # dry rows -> identity with the floor
        a = a * wet
        c = c * wet
        b = jnp.where(wet > 0, b, 1.0)
        d_rhs = jnp.where(wet > 0, d_rhs, p.minimum_TKE)

        e_new = jnp.maximum(solve_tridiagonal(a, b, c, d_rhs), p.minimum_TKE)
        e_new = jnp.where(wet > 0, e_new, p.minimum_TKE)

        # mixing length: natural scale + two-pass gradient limiter
        N2_safe = jnp.maximum(self._N2_centered(aux), 1e-32)
        ell = jnp.maximum(p.minimum_mixing_length, jnp.sqrt(2.0 * e_new / N2_safe))
        ell = jnp.where(wet > 0, ell, p.minimum_mixing_length)

        wet_pair_dn = wet * jnp.concatenate([wet[1:], wet[-1:]], axis=0)

        def down(carry, xs):
            ell_k, dz_above, wet_pair = xs
            lim = jnp.minimum(carry + dz_above, ell_k)
            out = jnp.where(wet_pair > 0, lim, ell_k)
            return out, out

        dz_above = jnp.concatenate([dz[1:], dz[-1:]], axis=0)
        _, ell_d = jax.lax.scan(down, ell[-1],
                                (ell[:-1], dz_above[:-1], wet_pair_dn[:-1]),
                                reverse=True, unroll=min(Nz - 1, 8))
        ell = jnp.concatenate([ell_d, ell[-1:]], axis=0)

        wet_pair_up = wet * jnp.concatenate([wet[:1], wet[:-1]], axis=0)

        def up(carry, xs):
            ell_k, dz_below, wet_pair = xs
            lim = jnp.minimum(carry + dz_below, ell_k)
            out = jnp.where(wet_pair > 0, lim, ell_k)
            return out, out

        dz_below = jnp.concatenate([dz[:1], dz[:-1]], axis=0)
        _, ell_u = jax.lax.scan(up, ell[0],
                                (ell[1:], dz_below[1:], wet_pair_up[1:]))
        ell = jnp.concatenate([ell[:1], ell_u], axis=0)

        return {"e": e_new, "ell": ell}
