"""TEOS-10 equation of state (Roquet et al. 2015 polynomial).

TPU-native replacement for the reference's `SeawaterPolynomials.jl`
TEOS10EquationOfState (reference dependency `Project.toml:30`; capability row
SURVEY.md §2b "TEOS-10 equation of state"). Implements the 55-term
``polyTEOS10-bsq`` Boussinesq polynomial of

    Roquet, Madec, McDougall & Barker (2015), "Accurate polynomial
    expressions for the density and specific volume of seawater using the
    TEOS-10 standard", Ocean Modelling 90, 29-43.

The coefficients below are the published polyTEOS10-bsq constants (also used
by NEMO's `eosbn2` and SeawaterPolynomials.jl). Inputs are Absolute Salinity
SA [g/kg], Conservative Temperature CT [°C], and geopotential height
z [m] (<= 0 in the ocean).

The polynomial splits in-situ density as ``rho = r0(z) + r'(SA, CT, z)``
where ``r0`` is a salinity/temperature-independent vertical profile
capturing compressibility. Boussinesq buoyancy uses only the anomaly part:
``b = -g (r' - r'(SA0, CT0, z→ref)) / rho0`` — the ``r0`` part has zero
horizontal gradient and does not stratify.

Everything here is pure elementwise math — it fuses into the surrounding
stencil kernels under jit (VPU-bound, no MXU work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

G_EARTH = 9.80665      # m/s², standard gravity (Oceananigans g_Earth)
RHO_REF = 1020.0       # kg/m³, polyTEOS10-bsq design reference density

# normalization (Roquet et al. 2015, Table 3)
_SAU = 40.0 * 35.16504 / 35.0
_CTU = 40.0
_ZU = 1.0e4
_DELTAS = 32.0

# vertical reference profile r0(z)
_R00 = 4.6494977072e+01
_R01 = -5.2099962525e+00
_R02 = 2.2601900708e-01
_R03 = 6.4326772569e-02
_R04 = 1.5616995503e-02
_R05 = -1.7243708991e-03

# 55-term anomaly polynomial EOSijk: i -> s power, j -> t power, k -> h power
_EOS = {
    (0, 0, 0): 8.0189615746e+02, (1, 0, 0): 8.6672408165e+02,
    (2, 0, 0): -1.7864682637e+03, (3, 0, 0): 2.0375295546e+03,
    (4, 0, 0): -1.2849161071e+03, (5, 0, 0): 4.3227585684e+02,
    (6, 0, 0): -6.0579916612e+01,
    (0, 1, 0): 2.6010145068e+01, (1, 1, 0): -6.5281885265e+01,
    (2, 1, 0): 8.1770425108e+01, (3, 1, 0): -5.6888046321e+01,
    (4, 1, 0): 1.7681814114e+01, (5, 1, 0): -1.9193502195e+00,
    (0, 2, 0): -3.7074170417e+01, (1, 2, 0): 6.1548258127e+01,
    (2, 2, 0): -6.0362551501e+01, (3, 2, 0): 2.9130021253e+01,
    (4, 2, 0): -5.4723692739e+00,
    (0, 3, 0): 2.1661789529e+01, (1, 3, 0): -3.3449108469e+01,
    (2, 3, 0): 1.9717078466e+01, (3, 3, 0): -3.1742946532e+00,
    (0, 4, 0): -8.3627885467e+00, (1, 4, 0): 1.1311538584e+01,
    (2, 4, 0): -5.3563304045e+00,
    (0, 5, 0): 5.4048723791e-01, (1, 5, 0): 4.8169980163e-01,
    (0, 6, 0): -1.9083568888e-01,
    (0, 0, 1): 1.9681925209e+01, (1, 0, 1): -4.2549998214e+01,
    (2, 0, 1): 5.0774768218e+01, (3, 0, 1): -3.0938076334e+01,
    (4, 0, 1): 6.6051753097e+00,
    (0, 1, 1): -1.3336301113e+01, (1, 1, 1): -4.4870114575e+00,
    (2, 1, 1): 5.0042598061e+00, (3, 1, 1): -6.5399043664e-01,
    (0, 2, 1): 6.7080479603e+00, (1, 2, 1): 3.5063081279e+00,
    (2, 2, 1): -1.8795372996e+00,
    (0, 3, 1): -2.4649669534e+00, (1, 3, 1): -5.5077101279e-01,
    (0, 4, 1): 5.5927935970e-01,
    (0, 0, 2): 2.0660924175e+00, (1, 0, 2): -4.9527603989e+00,
    (2, 0, 2): 2.5019633244e+00,
    (0, 1, 2): 2.0564311499e+00, (1, 1, 2): -2.1311365518e-01,
    (0, 2, 2): -1.2419983026e+00,
    (0, 0, 3): -2.3342758797e-02, (1, 0, 3): -1.8507636718e-02,
    (0, 1, 3): 3.7969820455e-01,
}


def _normalized(SA, CT, z):
    s = jnp.sqrt(jnp.abs(SA + _DELTAS) / _SAU)
    t = CT / _CTU
    h = -z / _ZU           # positive below the surface
    return s, t, h


def rho_anomaly(SA, CT, z):
    """Density anomaly r'(SA, CT, z) [kg/m³] (excludes the r0(z) profile)."""
    s, t, h = _normalized(SA, CT, z)
    # Horner in h; per-h-power Horner in t with inner Horner in s.
    out = 0.0
    for k in (3, 2, 1, 0):
        tk = 0.0
        jmax = max(j for (i, j, kk) in _EOS if kk == k)
        for j in range(jmax, -1, -1):
            sk = 0.0
            imax = max((i for (i, jj, kk) in _EOS if kk == k and jj == j),
                       default=-1)
            for i in range(imax, -1, -1):
                coef = _EOS.get((i, j, k), 0.0)
                sk = sk * s + coef
            tk = tk * t + sk
        out = out * h + tk
    return out


def rho_anomaly_z_coefficients(SA, CT):
    """(P0, P1, P2, P3)(SA, CT) with r'(SA, CT, z) = ((P3·h + P2)·h + P1)·h
    + P0, h = −z/ZU — the (s,t) polynomials evaluated ONCE per point for
    reuse at multiple depths. `closure_aux` evaluates every cell at both of
    its faces (locally-referenced N²); with the plain `rho_anomaly` that is
    two full 55-term evaluations per cell, with this split it is one
    coefficient set plus two 3-FMA cubics — and the Horner association is
    identical, so the results are BITWISE equal to `rho_anomaly`."""
    s, t, _ = _normalized(SA, CT, 0.0)
    out = []
    for k in range(4):
        tk = 0.0
        jmax = max(j for (i, j, kk) in _EOS if kk == k)
        for j in range(jmax, -1, -1):
            sk = 0.0
            imax = max((i for (i, jj, kk) in _EOS if kk == k and jj == j),
                       default=-1)
            for i in range(imax, -1, -1):
                coef = _EOS.get((i, j, k), 0.0)
                sk = sk * s + coef
            tk = tk * t + sk
        out.append(tk)
    return tuple(out)


def buoyancy_from_z_coefficients(P, z, rho0=RHO_REF, g=G_EARTH):
    """Buoyancy at depth ``z`` from `rho_anomaly_z_coefficients` output."""
    h = -z / _ZU
    rp = ((P[3] * h + P[2]) * h + P[1]) * h + P[0]
    return -g * (rp - rho0) / rho0


def rho_reference_profile(z):
    """r0(z) [kg/m³]: the T/S-independent compressibility profile."""
    h = -z / _ZU
    return h * (_R00 + h * (_R01 + h * (_R02 + h * (_R03 + h * (_R04 + h * _R05)))))


def rho_insitu(SA, CT, z):
    """Full in-situ Boussinesq density [kg/m³]."""
    return rho_reference_profile(z) + rho_anomaly(SA, CT, z)


def buoyancy(SA, CT, z, rho0=RHO_REF, g=G_EARTH):
    """Boussinesq buoyancy b = -g (r' - rho0) / rho0 [m/s²]."""
    return -g * (rho_anomaly(SA, CT, z) - rho0) / rho0


def thermal_expansion(SA, CT, z, rho0=RHO_REF):
    """alpha = -(1/rho0) d(rho')/dCT [1/K] (elementwise forward-mode AD)."""
    SA, CT, z = jnp.broadcast_arrays(jnp.asarray(SA), jnp.asarray(CT), jnp.asarray(z))
    _, drho = jax.jvp(lambda ct: rho_anomaly(SA, ct, z), (CT,), (jnp.ones_like(CT),))
    return -drho / rho0


def haline_contraction(SA, CT, z, rho0=RHO_REF):
    """beta = (1/rho0) d(rho')/dSA [kg/g] (elementwise forward-mode AD)."""
    SA, CT, z = jnp.broadcast_arrays(jnp.asarray(SA), jnp.asarray(CT), jnp.asarray(z))
    _, drho = jax.jvp(lambda sa: rho_anomaly(sa, CT, z), (SA,), (jnp.ones_like(SA),))
    return drho / rho0


class LinearEquationOfState:
    """b = g (alpha (T - T0) - beta (S - S0)); cheap option for tests."""

    def __init__(self, alpha=2e-4, beta=8e-4, T0=0.0, S0=35.0, g=G_EARTH):
        self.alpha, self.beta, self.T0, self.S0, self.g = alpha, beta, T0, S0, g

    def buoyancy(self, SA, CT, z):
        return self.g * (self.alpha * (CT - self.T0) - self.beta * (SA - self.S0))


class TEOS10EquationOfState:
    """Mirror of the reference's TEOS10 seawater buoyancy."""

    def __init__(self, rho0=RHO_REF, g=G_EARTH):
        self.rho0, self.g = rho0, g

    def buoyancy(self, SA, CT, z):
        return buoyancy(SA, CT, z, rho0=self.rho0, g=self.g)
