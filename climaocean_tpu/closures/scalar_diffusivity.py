"""Background / horizontal / biharmonic scalar diffusivities.

TPU-native replacements for Oceananigans'
`VerticalScalarDiffusivity` (function-valued κ/ν — e.g. the Henyey
latitude-dependent background, `OceanConfigurations.jl:32`),
`HorizontalScalarDiffusivity`, and
`HorizontalScalarBiharmonicDiffusivity(ν=νhb, discrete_form=true)` with the
grid-area-scaled viscosity ``νhb = Az²/λ`` (`OceanConfigurations.jl:26-27`);
reference selector `omip_simulation.jl:486-496`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
import jax
import jax.numpy as jnp

from ..core.stencil import dxc, dxf, dyc, dyf


def henyey_diffusivity(lat_deg, z=None, t=None):
    """Henyey et al. (1986) latitude-dependent background diffusivity,
    ``max(2e-6, 3e-5 |sin φ|)`` (reference `OceanConfigurations.jl:32`)."""
    return jnp.maximum(2e-6, 3e-5 * jnp.abs(jnp.sin(jnp.deg2rad(lat_deg))))


def step_kappa_simple(z):
    """Step-function κ for the `:simple` closure (`OceanConfigurations.jl:37-39`)."""
    return jnp.where(z >= -10.0, 5e-2, jnp.where(z >= -100.0, 1e-2, 1e-5))


def step_nu_simple(z):
    """Step-function ν for the `:simple` closure (`OceanConfigurations.jl:36`)."""
    return jnp.where(z >= -100.0, 1e-2, 1e-4)


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["nu", "kappa"])
@dataclass(frozen=True)
class VerticalScalarDiffusivity:
    """Constant or callable ν/κ evaluated on the grid; always treated
    implicitly (the reference wraps it in
    `VerticallyImplicitTimeDiscretization`)."""
    nu: object = 0.0        # float or callable(lat, z) -> value
    kappa: object = 0.0

    def _field(self, spec, grid):
        zf = grid.z_f[:, None, None]
        lat = grid.lat_cc[None, :, :]
        if callable(spec):
            try:
                val = spec(lat, zf)
            except TypeError:
                val = spec(zf)
            return jnp.broadcast_to(val, (grid.Nz + 1, grid.Nyp, grid.Nxp))
        return jnp.full((grid.Nz + 1, grid.Nyp, grid.Nxp), spec,
                        dtype=grid.z_f.dtype)

    def diffusivities(self, grid, fields, aux):
        return self._field(self.nu, grid), self._field(self.kappa, grid)


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["kappa_z", "nu_z"])
@dataclass(frozen=True)
class ConvectiveAdjustmentVerticalDiffusivity:
    """Large convective κ/ν wherever the column is statically unstable
    (N² < 0), mirroring `ConvectiveAdjustmentVerticalDiffusivity`
    (`OceanConfigurations.jl:51`, convective_κz = convective_νz = 1.0)."""
    kappa_z: float = 1.0
    nu_z: float = 1.0

    def diffusivities(self, grid, fields, aux):
        unstable = (aux.N2 < 0.0).astype(aux.N2.dtype)
        return self.nu_z * unstable, self.kappa_z * unstable


def laplacian_c(c, grid, kappa, dz):
    """Horizontal ∇·(κ∇c) for a center field, flux form, masked."""
    fx = kappa * grid.dy_fc * dz * dxf(c) / grid.dx_fc * grid.wet_u
    fy = kappa * grid.dx_cf * dz * dyf(c) / grid.dy_cf * grid.wet_v
    return (dxc(fx) + dyc(fy)) / (grid.az_cc * dz)


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["nu", "kappa"])
@dataclass(frozen=True)
class HorizontalScalarDiffusivity:
    """Explicit horizontal Laplacian mixing (`latitude_longitude.jl` ν=5e4)."""
    nu: float = 0.0
    kappa: float = 0.0

    def diffusivities(self, grid, fields, aux):
        return None

    def horizontal_tendencies(self, grid, fields, aux):
        dz = grid.dz_c[:, None, None]
        out = {}
        if self.nu:
            out["u"] = self.nu * laplacian_c(fields["u"], grid, 1.0, dz) * grid.wet_u
            out["v"] = self.nu * laplacian_c(fields["v"], grid, 1.0, dz) * grid.wet_v
        if self.kappa:
            for name in ("T", "S"):
                if name in fields:
                    out[name] = self.kappa * laplacian_c(fields[name], grid, 1.0, dz) * grid.wet_c
        return out


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["nu", "timescale", "on_tracers"])
@dataclass(frozen=True)
class HorizontalScalarBiharmonicDiffusivity:
    """Biharmonic −∇·(ν∇(∇²q)). ``nu`` may be a float or None with
    ``timescale`` λ set, in which case ν = Az²/λ per cell — the reference's
    discrete-form ``νhb`` (`OceanConfigurations.jl:26-27`)."""
    nu: float | None = None
    timescale: float | None = None
    on_tracers: bool = False

    def diffusivities(self, grid, fields, aux):
        return None

    def _nu(self, grid):
        if self.nu is not None:
            return self.nu
        return grid.az_cc ** 2 / self.timescale

    def horizontal_tendencies(self, grid, fields, aux):
        dz = grid.dz_c[:, None, None]
        nu = self._nu(grid)
        out = {}
        names = ["u", "v"] + (["T", "S"] if self.on_tracers else [])
        for name in names:
            if name not in fields:
                continue
            mask = {"u": grid.wet_u, "v": grid.wet_v}.get(name, grid.wet_c)
            lap = laplacian_c(fields[name] * mask, grid, 1.0, dz)
            out[name] = -laplacian_c(lap, grid, nu, dz) * mask
        return out
