"""Pallas-fused WENO horizontal tracer-flux divergence.

The hot op of the model (SURVEY.md §3.2: 3-D advection stencils are the
hottest kernels). The XLA path (`advection/tracer.py`) builds each WENO
reconstruction from ~20 shifted full-field views per axis; XLA fuses the
arithmetic but still materializes enough intermediates that the pass is
~10 ms/stage at 1/4° — far off the ~0.5 ms HBM roofline. This kernel
computes the horizontal flux divergence for a batch of tracers in one
`pallas_call`: each y-slab's stencil window is DMA'd from HBM into VMEM
once (x stays unblocked, so there is no lane-dimension halo waste), the
whole order-5/7 WENO-Z reconstruction for both directions happens
on-chip, and one output slab is written back.

Design notes (v2 — the v1 kernel was measured at ~parity with XLA):
  * x is NOT blocked: a y-slab spans the full padded row, so the only DMA
    overlap is the 8-row aligned y margin (v1 used 128-wide x margins for
    a 4-cell stencil — 9x read amplification).
  * inputs are just (c, wet_c, U, V) with U = Δy_fc Δz u wet_u and
    V = Δx_cf Δz v wet_v premultiplied by one fused XLA pass outside —
    halving v1's DMA descriptor count and skipping the metric windows.
  * the vertical flux stays in XLA (it is cheap — short z axis — and
    keeping it outside makes the fused path bit-compatible with the
    reference scheme including near-surface behavior).
  * DMAs are double-buffered across sequential grid steps (TPU grid
    iterations run in order and scratch persists), so slab j+1 streams in
    while slab j computes.
  * the reconstruction shares `weno._LEFT` / `weno._beta` with the XLA
    path, so the two paths use the same coefficients by construction
    (orders 5 and 7, Z-weights or NormalDivision).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .weno import _EPS, _LEFT, _PENALTY, _beta

_MARGIN = 8          # aligned sublane margin (stencil needs K <= 4)


def _biased_pair(cell, wet, order, weights):
    """Left/right-biased WENO face values from slice accessors.

    ``cell(o)`` / ``wet(o)`` return the cell/wet value at offset ``o``
    from the face (offset 0 = the cell just above the face) — the same
    convention as `weno.weno_biased`, with slices standing in for rolls.
    """
    tbl = _LEFT[order]
    K = (order + 1) // 2
    ideal = tbl["ideal"]
    out = []
    for mirror in (False, True):                # left, right
        at = (lambda o: -1 - o) if mirror else (lambda o: o)
        recon, betas = [], []
        for m in range(K):
            offs, coeffs = tbl[m]
            vals = [cell(at(o)) for o in offs]
            recon.append(sum(c * v for c, v in zip(coeffs, vals)))
            b = _beta(order, m, vals)
            pen = sum(1.0 - wet(at(o)) for o in offs)
            betas.append(b + _PENALTY * pen)
        if weights == "normal_division":
            alphas = [d / (b + _EPS) ** 2 for d, b in zip(ideal, betas)]
        else:
            tau = jnp.abs(betas[0] - betas[-1])
            alphas = [d * (1.0 + (tau / (b + _EPS)) ** 2)
                      for d, b in zip(ideal, betas)]
        total = sum(alphas)
        out.append(sum(a * r for a, r in zip(alphas, recon)) / total)
    return out


def _kernel(c_hbm, wet_hbm, u_hbm, v_hbm, out_ref,
            c_s, wet_s, u_s, v_s, sems,
            *, order, nt, nz, by, nxp, n_tiles, weights):
    j = pl.program_id(0)
    K = (order + 1) // 2
    wy = by + 2 * _MARGIN
    M = _MARGIN
    nxf = nxp - 2 * K + 1        # x-face positions K .. nxp-K inclusive
    nxv = nxp - 2 * K            # output columns K .. nxp-K

    def dma(jj, s):
        y0 = jj * by
        return [
            pltpu.make_async_copy(
                c_hbm.at[:, :, pl.ds(y0, wy), :], c_s.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(
                wet_hbm.at[:, pl.ds(y0, wy), :], wet_s.at[s], sems.at[s, 1]),
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(y0 + M, by + M), :], u_s.at[s],
                sems.at[s, 2]),
            pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(y0 + M, by + M), :], v_s.at[s],
                sems.at[s, 3]),
        ]

    @pl.when(j == 0)
    def _():
        for cp in dma(0, 0):
            cp.start()

    @pl.when(j + 1 < n_tiles)
    def _():
        for cp in dma(j + 1, (j + 1) % 2):
            cp.start()

    slot = j % 2
    for cp in dma(j, slot):
        cp.wait()

    c = c_s[slot]
    wet = wet_s[slot]
    U = u_s[slot]
    V = v_s[slot]

    # ---- x-direction: faces at absolute x = K .. nxp-K, output rows only
    def cx_cell(o):
        return c[:, :, M:M + by, K + o:K + o + nxf]

    def cx_wet(o):
        # 3-D (nz, by, nxf): broadcasts against the 4-D tracer batch —
        # Mosaic cannot lower [None] expansion combined with slices
        return wet[:, M:M + by, K + o:K + o + nxf]

    left, right = _biased_pair(cx_cell, cx_wet, order, weights)
    Uf = U[:, :by, K:K + nxf]
    qx = Uf * jnp.where(Uf >= 0.0, left, right)
    div = qx[..., 1:] - qx[..., :-1]                      # (nt,nz,by,nxv)

    # ---- y-direction: faces at window rows M .. M+by, output columns only
    def cy_cell(o):
        return c[:, :, M + o:M + o + by + 1, K:K + nxv]

    def cy_wet(o):
        return wet[:, M + o:M + o + by + 1, K:K + nxv]

    left, right = _biased_pair(cy_cell, cy_wet, order, weights)
    Vf = V[:, :by + 1, K:K + nxv]
    qy = Vf * jnp.where(Vf >= 0.0, left, right)
    div = div + (qy[:, :, 1:, :] - qy[:, :, :-1, :])

    out_ref[:, :, :, K:K + nxv] = div
    out_ref[:, :, :, 0:K] = jnp.zeros((nt, nz, by, K), div.dtype)
    out_ref[:, :, :, nxp - K:nxp] = jnp.zeros((nt, nz, by, K), div.dtype)


def weno_horizontal_divergence(c_batched, U, V, wet_c, order=5,
                               weights="zweno", by=8):
    """Fused horizontal WENO flux divergence for batched tracers.

    c_batched: (Nt, Nz, Nyp, Nxp) padded tracers (halos filled, H >= K).
    U, V: premultiplied face transports Δy_fc·Δz·u·wet_u / Δx_cf·Δz·v·wet_v
    (so the kernel needs no metric or mask windows and z★ thicknesses ride
    in for free). Returns δx(qx)+δy(qy) at centers, with the outer K
    columns zeroed (they are halo columns, rewritten by the next halo
    fill). Matches the XLA path's reconstruction exactly (shared tables).
    """
    nt, nz, nyp, nxp = c_batched.shape
    K = (order + 1) // 2
    ny_t = -(-nyp // by) * by
    n_tiles = ny_t // by
    wy = by + 2 * _MARGIN
    # Mosaic requires HBM DMA slices to be 128-aligned along the lane
    # (last) dim, so the whole-row window must itself be a multiple of 128.
    nx_t = -(-nxp // 128) * 128

    def pad(a):
        pads = [(0, 0)] * a.ndim
        pads[-2] = (_MARGIN, ny_t - nyp + _MARGIN)
        pads[-1] = (0, nx_t - nxp)
        return jnp.pad(a, pads)

    cp = pad(c_batched)
    wetp = pad(wet_c)
    up = pad(U)
    vp = pad(V)
    ft = c_batched.dtype

    out = pl.pallas_call(
        partial(_kernel, order=order, nt=nt, nz=nz, by=by, nxp=nx_t,
                n_tiles=n_tiles, weights=weights),
        out_shape=jax.ShapeDtypeStruct((nt, nz, ny_t, nx_t), ft),
        grid=(n_tiles,),
        interpret=jax.default_backend() == "cpu",
        # the WENO dependency chain needs a deep scoped-VMEM stack; the
        # default 16 MB limit is far below the 128 MB physically available
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec((nt, nz, by, nx_t), lambda j: (0, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, nt, nz, wy, nx_t), ft),
            pltpu.VMEM((2, nz, wy, nx_t), ft),
            pltpu.VMEM((2, nz, by + _MARGIN, nx_t), ft),
            pltpu.VMEM((2, nz, by + _MARGIN, nx_t), ft),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )(cp, wetp, up, vp)
    return out[:, :, :nyp, :nxp]
