"""Initial-condition tracer smoothing.

TPU-native rebuild of the reference's `diffuse_tracers`
(`src/InitialConditions/diffuse_tracers.jl:5-13,49-77`): smooth initial
tracers by integrating pure horizontal + vertical diffusion for a fixed
number of steps, restoring a masked region to the original values after
every step (the reference runs a `HydrostaticFreeSurfaceModel` with
`PrescribedVelocityFields()` and a GPU `_apply_tracer_mask!` kernel; here
the whole smoothing loop is ONE `lax.scan` compiled to a single fused TPU
kernel — no model object needed for a linear diffusion solve).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.halo import fill_halos
from ..core.stencil import Z, dxc, dxf, dyc, dyf, shift_clamp


def diffuse_tracers(grid, tracers, steps=10, alpha_h=0.2, alpha_z=0.2,
                    mask=None):
    """Return smoothed copies of ``tracers`` (dict name -> (Nz,Nyp,Nxp)).

    Each step applies κ_h ∇²_h + κ_z ∂zz with κΔt chosen as ``alpha`` times
    the explicit stability limit of the smallest resolved cell (α ≤ 0.25
    stable; the step count, not a diffusivity, sets the smoothing scale —
    the reference's `scale_to_diffusivity` plays the same role). ``mask``:
    interior-shaped (or padded) boolean where the ORIGINAL values are
    restored after every step (reference `_apply_tracer_mask!`).
    """
    dz3 = grid.dz_c[:, None, None]
    dzf3 = grid.dz_f[:, None, None]
    # κ_h Δt = α · min cell area / 4 (2-D explicit limit Δx²/4 on the
    # smallest cell keeps every cell stable)
    wet_any = grid.az_cc * (jnp.sum(grid.wet_c, 0) > 0)
    kh = alpha_h * float(jnp.min(jnp.where(wet_any > 0, grid.az_cc,
                                           jnp.inf))) / 4.0
    kz = alpha_z * float(jnp.min(grid.dz_c)) ** 2 / 2.0

    def smooth_once(c):
        cf = fill_halos(c, grid) * grid.wet_c
        qx = grid.dy_fc * dz3 * dxf(cf) / grid.dx_fc * grid.wet_u
        qy = grid.dx_cf * dz3 * dyf(cf) / grid.dy_cf * grid.wet_v
        lap = (dxc(qx) + dyc(qy)) / (grid.az_cc * dz3)     # [c / m²]
        # vertical: flux at face k (below cell k), zero top flux
        dlo = (cf - shift_clamp(cf, Z, -1)) / dzf3[:-1] * grid.wet_w[:-1]
        F = jnp.concatenate([dlo, jnp.zeros_like(dlo[:1])], axis=0)
        vert = (F[1:] - F[:-1]) / dz3                      # [c / m²]
        return (cf + kh * lap + kz * vert) * grid.wet_c

    names = list(tracers)
    stack0 = jnp.stack([tracers[n] for n in names])
    mask3 = None
    if mask is not None:
        mask3 = jnp.asarray(mask)
        if mask3.shape != stack0.shape[1:]:
            raise ValueError("mask must be padded (Nz, Nyp, Nxp)")

    def body(c, _):
        c = jax.vmap(smooth_once)(c)
        if mask3 is not None:
            c = jnp.where(mask3[None], stack0, c)
        return c, None

    out, _ = jax.lax.scan(body, stack0, None, length=steps)
    return {n: out[i] for i, n in enumerate(names)}
