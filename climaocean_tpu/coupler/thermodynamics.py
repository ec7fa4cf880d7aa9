"""Moist-air thermodynamics for bulk flux computations.

Supports the interface-flux layer (reference: NumericalEarth
`InterfaceComputations`; SURVEY.md §2b "Bulk flux algorithms").
"""

from __future__ import annotations

import jax.numpy as jnp

CP_AIR = 1004.0          # J/kg/K
R_DRY = 287.05           # J/kg/K
R_VAP = 461.5
LV = 2.5e6               # J/kg latent heat of vaporization
LS = 2.834e6             # J/kg sublimation
STEFAN_BOLTZMANN = 5.67e-8
CELSIUS = 273.15
RHO_AIR0 = 1.2


def saturation_vapor_pressure(T_K):
    """Buck (1981)-style e_sat over water [Pa]."""
    Tc = T_K - CELSIUS
    return 611.2 * jnp.exp(17.67 * Tc / (Tc + 243.5))


def saturation_specific_humidity(T_K, p=101325.0, over_ocean=True):
    """q_sat [kg/kg]; the 0.98 factor accounts for salinity over the ocean."""
    es = saturation_vapor_pressure(T_K)
    q = 0.622 * es / (p - 0.378 * es)
    return jnp.where(over_ocean, 0.98 * q, q) if not isinstance(over_ocean, bool) \
        else (0.98 * q if over_ocean else q)


def air_density(T_K, p=101325.0, q=0.0):
    Tv = T_K * (1.0 + 0.608 * q)
    return p / (R_DRY * Tv)


def air_kinematic_viscosity(T_K):
    """Temperature-dependent ν_air (reference
    `TemperatureDependentAirViscosity`): polynomial fit ~1.5e-5 at 20°C."""
    Tc = T_K - CELSIUS
    return 1.326e-5 * (1.0 + 6.542e-3 * Tc + 8.301e-6 * Tc ** 2 - 4.84e-9 * Tc ** 3)


def virtual_temperature(T_K, q):
    return T_K * (1.0 + 0.608 * q)
