"""Richardson-number-based vertical diffusivity.

TPU-native counterpart of Oceananigans' `RiBasedVerticalDiffusivity`
(reference selector `vertical_closure = :rbvd`,
`omip_simulation.jl:470-473`, including the `FivePointHorizontalFilter`
on Ri). The scheme sets

    ν = ν₀ [σ_shear(Ri) + Cᶜᵒⁿᵛ·1(N²<0)],   κ = κ₀ [...]

with a smooth step σ(Ri) = (1 + tanh((Ri₀ − Ri)/δ))/2 — shear-enhanced
mixing below the critical Ri, a convective-adjustment boost in statically
unstable water. Exact Oceananigans constants live in the unmounted
dependency; the defaults below follow its published calibration to recall
precision (declared approximation, same policy as CATKE).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core.stencil import xm1, xp1, ym1, yp1


def five_point_filter(a):
    """Horizontal 5-point smoothing filter (reference
    `FivePointHorizontalFilter`)."""
    return 0.5 * a + 0.125 * (xp1(a) + xm1(a) + yp1(a) + ym1(a))


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["nu0", "kappa0", "Ri0", "Ri_delta", "nu_conv",
                      "kappa_conv", "filter_Ri"])
@dataclass(frozen=True)
class RiBasedVerticalDiffusivity:
    nu0: float = 0.78
    kappa0: float = 0.50
    Ri0: float = 0.25
    Ri_delta: float = 0.10
    nu_conv: float = 0.1
    kappa_conv: float = 1.0
    filter_Ri: bool = True

    def initial_prognostics(self, grid):
        return {}

    def diffusivities(self, grid, fields, aux):
        Ri = aux.N2 / jnp.maximum(aux.S2, 1e-14)
        if self.filter_Ri:
            Ri = five_point_filter(Ri)
        sigma = 0.5 * (1.0 + jnp.tanh((self.Ri0 - Ri) / self.Ri_delta))
        unstable = (aux.N2 < 0.0).astype(Ri.dtype)
        nu = self.nu0 * sigma + self.nu_conv * unstable
        kap = self.kappa0 * sigma + self.kappa_conv * unstable
        return nu * grid.wet_w, kap * grid.wet_w
