"""Monin–Obukhov similarity-theory bulk turbulent fluxes.

TPU-native rebuild of NumericalEarth's `SimilarityTheoryFluxes` and
`CoefficientBasedFluxes` (reference configurations at
`omip_simulation.jl:40-113`: COARE-3.6 "corrected" fluxes with
wind-dependent Charnock roughness, fixed-roughness sea-ice fluxes, and the
NCAR Large & Yeager (2004/2009) coefficient-based algorithm with
`FixedIterations(5)`).

Everything is pointwise surface math inside a fixed-iteration
`lax.fori_loop` (SURVEY.md §7 hard part (c): a static iteration count keeps
the MOST solve jit-friendly — the reference itself uses FixedIterations(5)
for NCAR), fully vectorized over the surface plane and fused by XLA.

Sign convention: returned fluxes are *downward into the surface* — positive
momentum flux accelerates the ocean; ``Q_sensible``/``Q_latent`` are W/m²
*into* the surface (usually negative: ocean loses heat).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .thermodynamics import (CP_AIR, LV, air_density, air_kinematic_viscosity,
                             virtual_temperature)

VON_KARMAN = 0.4
GRAVITY = 9.80665


class AtmosphereState(NamedTuple):
    """Near-surface atmosphere at reference height (arrays over the surface)."""
    u: jnp.ndarray        # [m/s] at h_ref
    v: jnp.ndarray
    T: jnp.ndarray        # [K]
    q: jnp.ndarray        # specific humidity [kg/kg]
    p: jnp.ndarray        # surface pressure [Pa]
    Qsw_down: jnp.ndarray   # downwelling shortwave [W/m²]
    Qlw_down: jnp.ndarray   # downwelling longwave [W/m²]
    rain: jnp.ndarray     # liquid precip [kg/m²/s]
    snow: jnp.ndarray     # frozen precip [kg/m²/s]


class TurbulentFluxes(NamedTuple):
    tau_x: jnp.ndarray        # [N/m²] on the surface
    tau_y: jnp.ndarray
    Q_sensible: jnp.ndarray   # [W/m²] into surface
    Q_latent: jnp.ndarray     # [W/m²] into surface
    evaporation: jnp.ndarray  # [kg/m²/s] (positive = water leaves surface)
    u_star: jnp.ndarray


# --------------------------------------------------------------------------
# stability functions ψ(ζ)
# --------------------------------------------------------------------------

def psi_paulson_unstable_m(zeta):
    x = (1.0 - 16.0 * zeta) ** 0.25
    return (2.0 * jnp.log((1.0 + x) / 2.0) + jnp.log((1.0 + x * x) / 2.0)
            - 2.0 * jnp.arctan(x) + jnp.pi / 2.0)


def psi_paulson_unstable_h(zeta):
    x = (1.0 - 16.0 * zeta) ** 0.25
    return 2.0 * jnp.log((1.0 + x * x) / 2.0)


def psi_linear_stable(zeta):
    return -5.0 * zeta


def psi_m(zeta):
    """Paulson (1970) unstable + linear stable (Large & Yeager / NCAR)."""
    zeta_u = jnp.minimum(zeta, -1e-10)
    zeta_s = jnp.maximum(zeta, 0.0)
    return jnp.where(zeta < 0, psi_paulson_unstable_m(zeta_u),
                     psi_linear_stable(zeta_s))


def psi_h(zeta):
    zeta_u = jnp.minimum(zeta, -1e-10)
    zeta_s = jnp.maximum(zeta, 0.0)
    return jnp.where(zeta < 0, psi_paulson_unstable_h(zeta_u),
                     psi_linear_stable(zeta_s))


# SHEBA-like stability functions over sea ice (Grachev et al.): we use the
# same Paulson unstable branch with a stronger stable branch, matching the
# reference's `atmosphere_sea_ice_stability_functions` intent.
def psi_m_ice(zeta):
    # Holtslag & De Bruin (1988) stable form (the SHEBA-era polar
    # operating choice): ψ = −(0.7ζ + 0.75(ζ−14.3)e^{−0.35ζ} + 10.7).
    # The constant cancels at ζ→0 through the 0.75·(−14.3) term
    # (ψ(0⁺) ≈ +0.025), so NO offset may be re-added — a previous +10.7
    # "normalization" made ψ ≈ +10 at small stable ζ, collapsed
    # χ = log(h/z0) − ψ to its clamp, and inflated stable-regime
    # ice-atmosphere fluxes ~10× (caught by the iterated-Ts balance test).
    stable = -(0.7 * zeta + 0.75 * (zeta - 14.3)
               * jnp.exp(-jnp.minimum(0.35 * zeta, 20.0)) + 10.7)
    stable = jnp.where(zeta > 0, stable, 0.0)
    return jnp.where(zeta < 0, psi_paulson_unstable_m(jnp.minimum(zeta, -1e-10)),
                     stable)


# --------------------------------------------------------------------------
# roughness lengths
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class MomentumRoughnessLength:
    """Charnock + smooth-flow momentum roughness:
    z0 = α(U) u★²/g + 0.11 ν_air/u★. With ``wind_dependent=True`` the
    Charnock parameter follows Edson et al. (2013) eq. 13 (reference
    `WindDependentWaveFormulation`)."""
    charnock: float = 0.011
    wind_dependent: bool = True
    max_roughness: float = 1.0

    def __call__(self, u_star, nu_air, wind_speed):
        alpha = jnp.where(self.wind_dependent,
                          jnp.clip(0.0017 * wind_speed - 0.005, 0.005, 0.028),
                          self.charnock)
        us = jnp.maximum(u_star, 1e-8)
        z0 = alpha * us ** 2 / GRAVITY + 0.11 * nu_air / us
        return jnp.clip(z0, 1e-8, self.max_roughness)


@dataclass(frozen=True)
class ScalarRoughnessLength:
    """COARE-style scalar roughness from the roughness Reynolds number:
    z0s = min(1.6e-4, 5.85e-5 R★^{-0.72}) (Edson et al. 2013)."""

    def __call__(self, u_star, nu_air, z0m):
        us = jnp.maximum(u_star, 1e-8)
        r_star = jnp.maximum(z0m * us / nu_air, 1e-8)
        return jnp.clip(5.85e-5 * r_star ** (-0.72), 1e-9, 1.6e-4)


@dataclass(frozen=True)
class FixedRoughnessLength:
    z0: float = 5e-4

    def __call__(self, *args):
        return jnp.asarray(self.z0)


# --------------------------------------------------------------------------
# similarity-theory solver
# --------------------------------------------------------------------------

def _iterate(body, init, n):
    """Run the fixed-count MOST/coefficient iteration UNROLLED by default:
    the body is a small chain of 2-D elementwise ops, and unrolling lets
    XLA fuse all ~n iterations into a handful of kernels instead of one
    HBM round-trip per `fori_loop` step (the bulk-flux block was ~4.6 ms
    of the 1/4° step — VERDICT r3 item 3). The big-3-D-body caveat from
    DESIGN.md ("unrolled RK3 stages measured slower") does not apply to
    2-D surface fields; CLIMAOCEAN_UNROLL_FLUXES=0 restores the loop."""
    import os
    if os.environ.get("CLIMAOCEAN_UNROLL_FLUXES", "1") in ("", "0"):
        return jax.lax.fori_loop(0, n, body, init)
    carry = init
    for i in range(n):
        carry = body(i, carry)
    return carry


@dataclass(frozen=True)
class SimilarityTheoryFluxes:
    """MOST iteration on roughness lengths (reference
    `SimilarityTheoryFluxes`; `corrected_atmosphere_ocean_fluxes` /
    `corrected_atmosphere_sea_ice_fluxes`)."""
    momentum_roughness: object = MomentumRoughnessLength()
    scalar_roughness: object = ScalarRoughnessLength()
    gustiness_parameter: float = 1.2   # β convective gustiness
    minimum_gustiness: float = 0.5     # m/s (CORE-II convention, :41)
    reference_height: float = 10.0     # m
    boundary_layer_height: float = 600.0
    # MOST iteration count: COARE-class solvers converge in ~3-5; the
    # reference's NCAR config fixes 5 (`FixedIterations(5)`)
    iterations: int = 6
    stable_psi: str = "ocean"          # "ocean" (linear) | "ice" (SHEBA-like)

    def __call__(self, atmos: AtmosphereState, T_surf_K, q_surf,
                 u_surf=0.0, v_surf=0.0) -> TurbulentFluxes:
        h = self.reference_height
        du = atmos.u - u_surf
        dv = atmos.v - v_surf
        nu_air = air_kinematic_viscosity(atmos.T)
        rho_a = air_density(atmos.T, atmos.p, atmos.q)

        theta_a = atmos.T + 0.0098 * h          # potential temp at h
        dtheta = theta_a - T_surf_K
        dq = atmos.q - q_surf
        Tv = virtual_temperature(atmos.T, atmos.q)

        psim = psi_m if self.stable_psi == "ocean" else psi_m_ice

        def body(i, carry):
            u_star, theta_star, q_star, gust = carry
            S = jnp.sqrt(du ** 2 + dv ** 2 + gust ** 2)
            z0m = self.momentum_roughness(u_star, nu_air, S)
            z0s = self.scalar_roughness(u_star, nu_air, z0m)

            # Obukhov length
            bflux = (GRAVITY / Tv) * (theta_star * (1 + 0.608 * atmos.q)
                                      + 0.608 * atmos.T * q_star)
            L = jnp.where(jnp.abs(bflux) > 1e-12,
                          u_star ** 2 / (VON_KARMAN * bflux), 1e8)
            zeta = jnp.clip(h / L, -10.0, 10.0)

            # COARE logarithmic similarity profile (no ψ(z0/L) term, :34-37)
            chi_m = jnp.maximum(jnp.log(h / z0m) - psim(zeta), 1.0)
            chi_h = jnp.maximum(jnp.log(h / z0s) - psi_h(zeta), 1.0)

            u_star = VON_KARMAN * S / chi_m
            theta_star = VON_KARMAN * dtheta / chi_h
            q_star = VON_KARMAN * dq / chi_h

            # convective gustiness (Fairall et al. 1996)
            wb = jnp.maximum(-(GRAVITY / Tv) * (theta_star * u_star
                                                * (1 + 0.608 * atmos.q)
                                                + 0.608 * atmos.T * q_star * u_star)
                             * self.boundary_layer_height, 0.0)
            gust = jnp.maximum(self.gustiness_parameter * wb ** (1.0 / 3.0),
                               self.minimum_gustiness)
            return (u_star, theta_star, q_star, gust)

        S0 = jnp.sqrt(du ** 2 + dv ** 2 + self.minimum_gustiness ** 2)
        init = (0.036 * S0, jnp.zeros_like(S0), jnp.zeros_like(S0),
                jnp.full_like(S0, self.minimum_gustiness))
        u_star, theta_star, q_star, gust = _iterate(body, init,
                                                    self.iterations)

        S = jnp.sqrt(du ** 2 + dv ** 2 + gust ** 2)
        coeff = rho_a * u_star ** 2 / jnp.maximum(S, 1e-8)
        tau_x = coeff * du
        tau_y = coeff * dv
        Q_sens = rho_a * CP_AIR * u_star * theta_star
        evap = -rho_a * u_star * q_star            # positive = evaporation
        Q_lat = -LV * evap
        return TurbulentFluxes(tau_x, tau_y, Q_sens, Q_lat, evap, u_star)


@dataclass(frozen=True)
class CoefficientBasedFluxes:
    """Large & Yeager (2004/2009) transfer-coefficient bulk algorithm with a
    fixed number of stability iterations (reference
    `ncar_atmosphere_ocean_fluxes`, `FixedIterations(5)`)."""
    iterations: int = 5
    reference_height: float = 10.0
    minimum_wind: float = 0.5

    def __call__(self, atmos: AtmosphereState, T_surf_K, q_surf,
                 u_surf=0.0, v_surf=0.0) -> TurbulentFluxes:
        h = self.reference_height
        du = atmos.u - u_surf
        dv = atmos.v - v_surf
        S = jnp.maximum(jnp.sqrt(du ** 2 + dv ** 2), self.minimum_wind)
        rho_a = air_density(atmos.T, atmos.p, atmos.q)
        theta_a = atmos.T + 0.0098 * h
        dtheta = theta_a - T_surf_K
        dq = atmos.q - q_surf
        Tv = virtual_temperature(atmos.T, atmos.q)

        def cd_neutral(U10):
            U = jnp.clip(U10, 0.5, 33.0)
            return 1e-3 * (2.7 / U + 0.142 + 0.0764 * U)

        def body(i, carry):
            U10n, _, _, _ = carry
            Cd_n = cd_neutral(U10n)
            sq = jnp.sqrt(Cd_n)
            Ce_n = 1e-3 * 34.6 * sq
            Ch_n_stab = 1e-3 * 18.0 * sq
            Ch_n_unst = 1e-3 * 32.7 * sq
            # stability parameter from the bulk Richardson number
            Rib = GRAVITY * h * (dtheta / Tv + 0.608 * dq) / jnp.maximum(S ** 2, 1e-4)
            zeta = jnp.clip(10.0 * Rib, -10.0, 10.0)
            stable = zeta > 0
            Ch_n = jnp.where(stable, Ch_n_stab, Ch_n_unst)
            # height/stability-adjusted coefficients
            fm = 1.0 / (1.0 + sq / VON_KARMAN * (-psi_m(zeta))) ** 2
            fh = 1.0 / ((1.0 + Ch_n / (VON_KARMAN * sq) * (-psi_h(zeta)))
                        * (1.0 + sq / VON_KARMAN * (-psi_m(zeta))))
            Cd = Cd_n * fm
            Ch = Ch_n * fh
            Ce = Ce_n * fh
            # neutral 10 m wind for the next iteration
            U10n_new = S * (1.0 + sq / VON_KARMAN * (jnp.log(h / 10.0) - psi_m(zeta))) ** -1
            return (jnp.maximum(U10n_new, self.minimum_wind), Cd, Ch, Ce)

        init = (S, cd_neutral(S), 1e-3 * 32.7 * jnp.sqrt(cd_neutral(S)),
                1e-3 * 34.6 * jnp.sqrt(cd_neutral(S)))
        _, Cd, Ch, Ce = _iterate(body, init, self.iterations)

        tau_x = rho_a * Cd * S * du
        tau_y = rho_a * Cd * S * dv
        Q_sens = rho_a * CP_AIR * Ch * S * dtheta
        evap = -rho_a * Ce * S * dq
        Q_lat = -LV * evap
        u_star = jnp.sqrt(Cd) * S
        return TurbulentFluxes(tau_x, tau_y, Q_sens, Q_lat, evap, u_star)
