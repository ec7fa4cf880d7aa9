"""Surface radiation properties.

TPU-native mirror of NumericalEarth's `SurfaceRadiationProperties` and CCSM3
`SeaIceAlbedo` (reference: `atmosphere.jl:34-44` — ocean albedo 0.06 /
emissivity 1.00; sea-ice albedo reading live h/hs/Ts fields).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .thermodynamics import CELSIUS, STEFAN_BOLTZMANN

OCEAN_ALBEDO = 0.06        # atmosphere.jl:43
OCEAN_EMISSIVITY = 1.00


@dataclass(frozen=True)
class SurfaceRadiationProperties:
    albedo: float = OCEAN_ALBEDO
    emissivity: float = OCEAN_EMISSIVITY


def net_longwave(Qlw_down, T_surf_K, emissivity=OCEAN_EMISSIVITY):
    """Net LW into the surface [W/m²]."""
    return emissivity * (Qlw_down - STEFAN_BOLTZMANN * T_surf_K ** 4)


def net_shortwave(Qsw_down, albedo=OCEAN_ALBEDO):
    return (1.0 - albedo) * Qsw_down


def ccsm3_sea_ice_albedo(h_ice, h_snow, T_surf_K,
                         albedo_cold_snow=0.98, albedo_cold_ice=0.70,
                         albedo_melt_snow=0.82, albedo_melt_ice=0.64):
    """CCSM3 thickness/temperature/snow-dependent sea-ice albedo (reference
    `SeaIceAlbedo(hi, hs, Ts)`, `atmosphere.jl:34-39`).

    Cold albedos ramp down linearly over the last 1 °C below melt; thin ice
    (< 0.5 m) blends toward the ocean albedo with an atan profile; snow
    cover blends by a snow-patchiness fraction hs/(hs + 0.02).
    """
    Tc = T_surf_K - CELSIUS
    melt_ramp = jnp.clip(-Tc, 0.0, 1.0)          # 1 when >= 1°C below melting
    alb_ice = albedo_melt_ice + (albedo_cold_ice - albedo_melt_ice) * melt_ramp
    alb_snow = albedo_melt_snow + (albedo_cold_snow - albedo_melt_snow) * melt_ramp

    thin = jnp.arctan(5.0 * h_ice) / jnp.arctan(5.0 * 0.5)
    thin = jnp.clip(thin, 0.0, 1.0)
    alb_ice = OCEAN_ALBEDO + (alb_ice - OCEAN_ALBEDO) * thin

    f_snow = h_snow / (h_snow + 0.02)
    return alb_ice * (1.0 - f_snow) + alb_snow * f_snow
