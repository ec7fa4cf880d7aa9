"""NORi base Richardson-number vertical diffusivity.

TPU-native counterpart of the reference's `NORiBaseVerticalDiffusivity`
(exported `src/ClimaOcean.jl:22`, selected by `vertical_closure = :nori`,
`omip_simulation.jl:465-466`; documented at `:271-273` as vendored from
xkykai/NORiOceanParameterization.jl — the vendored `nori_base_closure.jl`
file is absent from the reference tree, so this is a reconstruction of the
documented SHAPE: a standalone local Richardson closure with calibrated
defaults, "no Cᵇ parameter", used complete with no background closure).

Distinct from `RiBasedVerticalDiffusivity` (a tanh step at a critical Ri +
binary convective switch): NORi-base is the rational-function
Pacanowski–Philander (1981) family,

    ν(Ri) = ν₀ / (1 + α·Ri)ⁿ + ν_b
    κ(Ri) = ν₀ / (1 + α·Ri)ⁿ⁺¹ + κ_b           (Ri ≥ 0)

with a SMOOTH convective ramp in N² instead of an indicator — mixing ramps
to the convective-adjustment values over a finite N² transition width,
which keeps the closure C¹ in the state (the property the NORi calibration
relies on — gradient-based/EKI calibration needs differentiable
parameterizations, and it is also what XLA fuses best: no select chains,
three rational/tanh evaluations per interface).

All terms are fused pointwise over (Nz+1, Nyp, Nxp) interface planes —
one VPU pass, no scans, no column loops.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["nu0", "alpha", "n_exp", "nu_background",
                      "kappa_background", "nu_conv", "kappa_conv",
                      "N2_width", "max_diffusivity"])
@dataclass(frozen=True)
class NORiBaseVerticalDiffusivity:
    """Calibrated defaults: PP81 canonical constants (ν₀ = 10⁻² m²/s,
    α = 5, n = 2) with NEMO-magnitude convective adjustment
    (κ_conv = 1 m²/s) and IW-background floors — the operating point the
    NORi base closure departs from. Standalone: the `:nori` selector adds
    no background `VerticalScalarDiffusivity` (reference
    `omip_simulation.jl:466` returns `nothing` for the background)."""
    nu0: float = 1.0e-2
    alpha: float = 5.0
    n_exp: int = 2
    nu_background: float = 1.0e-4
    kappa_background: float = 1.0e-5
    nu_conv: float = 0.1
    kappa_conv: float = 1.0
    # smooth convective ramp width in N² [1/s²]: full convective mixing by
    # N² ≲ −width, pure shear form by N² ≳ +width
    N2_width: float = 1.0e-6
    max_diffusivity: float = 3.0

    def initial_prognostics(self, grid):
        return {}

    def diffusivities(self, grid, fields, aux):
        Ri = jnp.maximum(aux.N2, 0.0) / jnp.maximum(aux.S2, 1e-14)
        denom = 1.0 + self.alpha * Ri
        shear_nu = self.nu0 / denom ** self.n_exp
        shear_kap = shear_nu / denom
        # C¹ convective ramp: w = 1 in strongly unstable water, 0 in stable
        w_conv = 0.5 * (1.0 - jnp.tanh(aux.N2 / self.N2_width))
        nu = shear_nu + self.nu_background + w_conv * self.nu_conv
        kap = shear_kap + self.kappa_background + w_conv * self.kappa_conv
        nu = jnp.minimum(nu, self.max_diffusivity)
        kap = jnp.minimum(kap, self.max_diffusivity)
        return nu * grid.wet_w, kap * grid.wet_w
