"""Finite-volume tracer advection.

TPU-native replacement for Oceananigans' tracer advection with
`WENO(order)` (reference: `latitude_longitude.jl:18` tracer_advection =
WENO(order=7); `omip_simulation.jl:600`).

Flux-form divergence on the C-grid:

    G_c = -(1/V) [ δx_c(q_x) + δy_c(q_y) + δz_c(q_z) ]

    q_x[i] = Δy_fc Δz u c̃ˣ     (x-face transport)
    q_y[j] = Δx_cf Δz v c̃ʸ
    q_z[k] = Az_cc  w c̃ᶻ

with c̃ the WENO-upwind (or centered) face reconstruction. Fluxes are masked
by the face wet masks, which enforces no-flux through bathymetry and domain
walls without branches.

Vertical reconstruction degrades to centered 2nd order within a half-stencil
of the top/bottom via the same dry-substencil penalty (wet_c is passed as the
mask; cells outside the column are dry).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ..core.stencil import X, Y, Z, dxc, dyc
from .weno import weno_upwind, centered_face

# Fused Pallas path (parity-tested in tests/test_pallas_kernel.py).
# Default: on for TPU backends, off elsewhere (interpret mode is slow on
# CPU). CLIMAOCEAN_PALLAS_WENO=1/0 forces it either way — re-read per call
# so tests/users can toggle it mid-process; only the backend probe is
# cached (it never changes within a process, and resolving it lazily keeps
# module import from initializing a jax backend).
_PALLAS_DEFAULT = None


def _use_pallas():
    env = os.environ.get("CLIMAOCEAN_PALLAS_WENO")
    if env is not None:
        return env not in ("", "0")
    global _PALLAS_DEFAULT
    if _PALLAS_DEFAULT is None:
        import jax
        _PALLAS_DEFAULT = jax.default_backend() not in ("cpu",)
    return _PALLAS_DEFAULT


def tracer_flux_divergence(c, u, v, w, grid, order=5, vertical_order=5,
                           dzc3=None, dzw3=None, weights="zweno"):
    """Advective tendency of tracer ``c`` (located at centers).

    u, v: (Nz, Nyp, Nxp); w: (Nz+1, Nyp, Nxp). Returns (Nz, Nyp, Nxp).
    ``dzc3``/``dzw3`` optionally override cell thicknesses (z★ moving grid);
    default is the static 1-D spacing broadcast.

    On TPU backends (or with ``CLIMAOCEAN_PALLAS_WENO=1``; ``=0``
    disables) the batched order-5/7 reconstruction routes through the
    fused Pallas kernel (`advection/pallas_weno.py`) — VMEM-resident
    stencil windows instead of the roll-chain's many HBM passes. With a
    WENO vertical scheme the whole tendency (horizontal + vertical flux
    divergence + volume divide) is ONE kernel; results match the XLA path
    to f32 roundoff (shared reconstruction tables, parity-tested).
    """
    wet_c = grid.wet_c
    dz = grid.dz_c[:, None, None] if dzc3 is None else dzc3

    # --- horizontal fluxes ---------------------------------------------------
    # Fused-path gates: (a) the grid halo must cover the stencil (the kernel
    # only writes faces at x in [K, nxp-K] and assumes halo-filled inputs —
    # a too-small halo would silently compute garbage near tile edges);
    # (b) the double-buffered scratch must fit VMEM (`choose_block` shrinks
    # the y-slab, then gives up → XLA path; without the gate, sixth/tenth-
    # degree single-device shapes fail to compile).
    by = None
    if (_use_pallas() and order in (5, 7) and c.ndim == 4
            and c.shape[-1] >= order + 5 and grid.H >= (order + 1) // 2):
        from .pallas_weno import choose_block
        by = choose_block(c.shape[0], c.shape[1], c.shape[-1],
                          fused_z=vertical_order > 1)
    if by is not None:
        from .pallas_weno import (weno_horizontal_divergence,
                                  weno_tracer_divergence)
        U = grid.dy_fc * dz * u * grid.wet_u
        V = grid.dx_cf * dz * v * grid.wet_v
        if vertical_order > 1:
            W = grid.az_cc * w * grid.wet_w
            inv_vol = wet_c / (grid.az_cc * dz)
            return weno_tracer_divergence(c, U, V, W, wet_c, inv_vol, order,
                                          min(vertical_order, order), weights,
                                          by=by)
        hdiv = weno_horizontal_divergence(c, U, V, wet_c, order, weights,
                                          by=by)
    else:
        cx = weno_upwind(c, u, X, order, wet_c, weights=weights)
        cy = weno_upwind(c, v, Y, order, wet_c, weights=weights)
        qx = grid.dy_fc * dz * u * grid.wet_u * cx
        qy = grid.dx_cf * dz * v * grid.wet_v * cy
        hdiv = dxc(qx) + dyc(qy)

    # --- vertical flux -------------------------------------------------------
    # w faces: (Nz+1). Reconstruct c at interior faces 1..Nz-1; the top face
    # (free surface) uses the top cell value, the bottom flux is masked off.
    # All slicing is on the Z axis so a leading tracer-batch axis broadcasts.
    if vertical_order > 1:
        cz_body = weno_upwind(c, w[..., :-1, :, :], Z,
                              min(vertical_order, order), wet_c,
                              boundary="clamp", weights=weights)
    else:
        cz_body = centered_face(c, Z)
    cz = jnp.concatenate([cz_body, c[..., -1:, :, :]], axis=Z)   # (Nz+1, ...)
    qz = grid.az_cc * w * grid.wet_w * cz

    div = hdiv + (qz[..., 1:, :, :] - qz[..., :-1, :, :])
    vol = grid.az_cc * dz
    return -(div / vol) * wet_c
