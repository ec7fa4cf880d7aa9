"""GM/Redi mesoscale eddy parameterization.

TPU-native rebuild of Oceananigans' `IsopycnalSkewSymmetricDiffusivity`
(reference call site: `one_degree_tripolar.jl` closure with κ_skew = 500,
κ_symmetric = 200 m²/s; selector `omip_simulation.jl:481-485`).

Small-slope Griffies (1998) combined tensor: with isoneutral slope
S = −∇_h b / ∂_z b (flux-tapered at |S| > S_max),

    Fx = −κ_R ∂x c − (κ_R − κ_GM) Sx ∂z c
    Fz = −(κ_R + κ_GM)(Sx ∂x c + Sy ∂y c) − κ_R |S|² ∂z c

The diagonal vertical piece κ_R |S|² rides the shared implicit tridiagonal
solve (via `diffusivities`); horizontal and cross terms are explicit.
Applied to T and S (the buoyancy-active tracers), not momentum.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core.stencil import (Z, dxc, dxf, dyc, dyf, mxc, mxf, myc, myf,
                            shift_clamp)


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["kappa_skew", "kappa_symmetric", "slope_max", "N2_min"])
@dataclass(frozen=True)
class IsopycnalSkewSymmetricDiffusivity:
    kappa_skew: float = 500.0          # κ_GM (bolus/skew)
    kappa_symmetric: float = 200.0     # κ_R (Redi isoneutral)
    slope_max: float = 1e-2            # flux-tapering slope limit
    N2_min: float = 1e-9               # ∂z b floor for slope computation

    def initial_prognostics(self, grid):
        return {}

    def _slopes(self, grid, aux):
        """Isoneutral slopes at x-faces (f,c,c) and y-faces (c,f,c), plus
        the taper factor; all at cell-center vertical levels."""
        b = aux.b
        # ∂z b at centers (mean of face N²), floored
        N2_c = 0.5 * (aux.N2[:-1] + aux.N2[1:])
        bz = jnp.maximum(N2_c, self.N2_min)

        bx = dxf(b) / grid.dx_fc                     # at (f,c,c)
        by = dyf(b) / grid.dy_cf                     # at (c,f,c)
        Sx = -bx / mxf(bz)
        Sy = -by / myf(bz)

        # flux tapering: scale κ by (S_max/|S|)² where |S| > S_max
        def taper(S):
            mag = jnp.abs(S)
            fac = jnp.where(mag > self.slope_max,
                            (self.slope_max / jnp.maximum(mag, 1e-30)) ** 2,
                            1.0)
            return jnp.clip(S, -10 * self.slope_max, 10 * self.slope_max), fac

        Sx, tx = taper(Sx)
        Sy, ty = taper(Sy)
        return Sx, Sy, tx, ty

    def diffusivities(self, grid, fields, aux):
        """Diagonal vertical Redi piece κ_R |S|², implicit."""
        Sx, Sy, tx, ty = self._slopes(grid, aux)
        # |S|² at w-faces: interp face-located slopes to centers then faces
        # (wall-face slopes are spurious — see horizontal_tendencies)
        Sx_c = mxc(Sx * tx * grid.wet_u)
        Sy_c = myc(Sy * ty * grid.wet_v)
        S2_c = Sx_c ** 2 + Sy_c ** 2
        S2_w = jnp.concatenate([S2_c[:1], 0.5 * (S2_c[:-1] + S2_c[1:]),
                                S2_c[-1:]], axis=0)
        kap_w = self.kappa_symmetric * jnp.minimum(S2_w, self.slope_max ** 2 * 100)
        zeros = jnp.zeros_like(kap_w)
        return zeros, kap_w * grid.wet_w

    def horizontal_tendencies(self, grid, fields, aux):
        Sx, Sy, tx, ty = self._slopes(grid, aux)
        kR = self.kappa_symmetric
        kGM = self.kappa_skew
        dz = grid.dz_c[:, None, None]
        out = {}
        for name in ("T", "S"):
            if name not in fields:
                continue
            c = fields[name]
            dcdz_c = _dz_centered(c, grid)            # ∂z c at centers

            # x-flux at (f,c,c): −κ_R ∂x c − (κ_R−κ_GM) Sx ∂z c  (tapered)
            Fx = (-kR * tx * dxf(c) / grid.dx_fc
                  - (kR - kGM) * tx * Sx * mxf(dcdz_c)) * grid.wet_u
            Fy = (-kR * ty * dyf(c) / grid.dy_cf
                  - (kR - kGM) * ty * Sy * myf(dcdz_c)) * grid.wet_v

            # explicit vertical cross-flux at w-faces:
            # −(κ_R+κ_GM)(Sx ∂x c + Sy ∂y c), interpolated to (c,c,f).
            # The face gradients MUST be wet-masked like Fx/Fy: at an
            # immersed wall dxf(c) differences a land cell's masked value
            # (≈0) against the ocean, a huge spurious gradient that drives
            # an anti-diffusive vertical flux — measured at 1° as runaway
            # subsurface cooling (T→−16 °C) along freshly-dried coastlines.
            cross_c = (mxc(tx * Sx * dxf(c) / grid.dx_fc * grid.wet_u)
                       + myc(ty * Sy * dyf(c) / grid.dy_cf * grid.wet_v))
            cross_w = jnp.concatenate(
                [jnp.zeros_like(cross_c[:1]),
                 0.5 * (cross_c[:-1] + cross_c[1:]),
                 jnp.zeros_like(cross_c[:1])], axis=0)
            Fz = -(kR + kGM) * cross_w * grid.wet_w

            div = (dxc(grid.dy_fc * dz * Fx) + dyc(grid.dx_cf * dz * Fy)) \
                / (grid.az_cc * dz) + (Fz[1:] - Fz[:-1]) / dz
            out[name] = -div * grid.wet_c
        return out


def _dz_centered(c, grid):
    """∂z c at centers via clamped differences."""
    dz_f = grid.dz_f[:, None, None]
    d_lo = (c - shift_clamp(c, Z, -1)) / dz_f[:-1]     # at faces 0..Nz-1
    d_hi = jnp.concatenate([d_lo[1:], jnp.zeros_like(d_lo[:1])], axis=0)
    return 0.5 * (d_lo + d_hi)
