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

from .weno import _weno_core

_MARGIN = 8          # aligned sublane margin (stencil needs K <= 4)
_VMEM_LIMIT = 110 * 1024 * 1024   # scoped-VMEM request (< 128 MB physical)


def scratch_vmem_bytes(nt, nz, nxp, by, fused_z, itemsize=4):
    """Static VMEM scratch footprint of `_divergence_call` (double-buffered
    input slabs + the output block). Compute temporaries of the WENO chain
    live on top of this, so callers should gate against a budget well
    below `_VMEM_LIMIT` (see `choose_block`)."""
    wy = by + 2 * _MARGIN
    nx_t = -(-nxp // 128) * 128
    n = 2 * (nt * nz * wy            # c
             + nz * wy               # wet
             + 2 * nz * (by + _MARGIN))   # U, V
    if fused_z:
        n += 2 * ((nz + 1) * by + nz * by)  # W, inv_vol
    n += nt * nz * by                # output block
    return n * nx_t * itemsize


def choose_block(nt, nz, nxp, fused_z, budget=None):
    """Largest y-slab height whose scratch fits the VMEM budget, or None
    when even the smallest slab overflows (→ caller falls back to the XLA
    path). Budget default leaves ~35% of the scoped-VMEM request for the
    reconstruction's live temporaries (measured headroom at the 1/4°
    operating point: by=8 scratch ≈ 34 MB under the 110 MB limit)."""
    if budget is None:
        budget = int(0.65 * _VMEM_LIMIT)
    for by in (8, 4, 2):
        if scratch_vmem_bytes(nt, nz, nxp, by, fused_z) <= budget:
            return by
    return None


def _upwind_value(cell, wet, up, order, weights):
    """Upwind-selected WENO face value from slice accessors.

    ``cell(o)`` / ``wet(o)`` return the cell/wet value at offset ``o``
    from the face (offset 0 = the cell just above the face) — the same
    convention as `weno.weno_biased`, with slices standing in for rolls.
    ``up`` is the per-face upwind mask (velocity >= 0). As in
    `weno.weno_upwind`, the inputs are side-selected and ONE
    reconstruction runs — mathematically identical to computing both
    biased values and selecting (roundoff-level FMA-contraction
    differences only), at ~half the VPU work (the kernel is
    compute-bound).
    """
    val_cache, wet_cache = {}, {}

    def get_val(o):
        if o not in val_cache:
            val_cache[o] = jnp.where(up, cell(o), cell(-1 - o))
        return val_cache[o]

    def get_wet(o):
        if o not in wet_cache:
            wet_cache[o] = jnp.where(up, wet(o), wet(-1 - o))
        return wet_cache[o]

    return _weno_core(get_val, get_wet, order, weights)


def _zshift(arr, o, axis):
    """Clamped z-shift on a VMEM-resident array: result[k] = arr[clamp(k+o)]
    along ``axis`` — `stencil.shift_clamp` semantics, written as
    slice+concat so Mosaic lowers it (z is an untiled leading axis, so the
    concat is just VMEM offset arithmetic)."""
    if o == 0:
        return arr
    L = arr.shape[axis]

    def sl(lo, hi):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(lo, hi)
        return arr[tuple(idx)]

    if o > 0:
        parts = [sl(o, L)] + [sl(L - 1, L)] * o
    else:
        parts = [sl(0, 1)] * (-o) + [sl(0, L + o)]
    return jnp.concatenate(parts, axis=axis)


def _kernel(*refs, order, vorder, nt, nz, by, nxp, n_tiles, weights):
    fused_z = vorder is not None
    if fused_z:
        (c_hbm, wet_hbm, u_hbm, v_hbm, w_hbm, iv_hbm, out_ref,
         c_s, wet_s, u_s, v_s, w_s, iv_s, sems) = refs
    else:
        (c_hbm, wet_hbm, u_hbm, v_hbm, out_ref,
         c_s, wet_s, u_s, v_s, sems) = refs
        w_s = iv_s = None
    j = pl.program_id(0)
    K = (order + 1) // 2
    wy = by + 2 * _MARGIN
    M = _MARGIN
    nxf = nxp - 2 * K + 1        # x-face positions K .. nxp-K inclusive
    nxv = nxp - 2 * K            # output columns K .. nxp-K

    def dma(jj, s):
        y0 = jj * by
        cps = [
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
        if fused_z:
            cps += [
                pltpu.make_async_copy(
                    w_hbm.at[:, pl.ds(y0 + M, by), :], w_s.at[s],
                    sems.at[s, 4]),
                pltpu.make_async_copy(
                    iv_hbm.at[:, pl.ds(y0 + M, by), :], iv_s.at[s],
                    sems.at[s, 5]),
            ]
        return cps

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

    Uf = U[:, :by, K:K + nxf]
    qx = Uf * _upwind_value(cx_cell, cx_wet, Uf >= 0.0, order, weights)
    div = qx[..., 1:] - qx[..., :-1]                      # (nt,nz,by,nxv)

    # ---- y-direction: faces at window rows M .. M+by, output columns only
    def cy_cell(o):
        return c[:, :, M + o:M + o + by + 1, K:K + nxv]

    def cy_wet(o):
        return wet[:, M + o:M + o + by + 1, K:K + nxv]

    Vf = V[:, :by + 1, K:K + nxv]
    qy = Vf * _upwind_value(cy_cell, cy_wet, Vf >= 0.0, order, weights)
    div = div + (qy[:, :, 1:, :] - qy[:, :, :-1, :])

    if fused_z:
        # ---- z-direction: the whole column is VMEM-resident, so the
        # vertical WENO flux fuses in for free (the XLA vertical pass was
        # memory-bound on its materialized intermediates). Faces 0..nz-1
        # reconstruct with clamp boundaries; the top face (free surface)
        # carries the top-cell value (`tracer.tracer_flux_divergence`).
        ccz = c[:, :, M:M + by, K:K + nxv]                # (nt,nz,by,nxv)
        wetz = wet[:, M:M + by, K:K + nxv]                # (nz,by,nxv)
        Wf = w_s[slot][:, :, K:K + nxv]                   # (nz+1,by,nxv)

        def cz_cell(o):
            return _zshift(ccz, o, 1)

        def cz_wet(o):
            return _zshift(wetz, o, 0)

        # upwind mask from the premultiplied transport: sign differs from
        # raw w only where wet_w == 0, where the flux is zero anyway
        up_z = Wf[:nz] >= 0.0
        cz_body = _upwind_value(cz_cell, cz_wet, up_z, vorder, weights)
        qz_body = Wf[:nz] * cz_body
        qz_top = Wf[nz:] * ccz[:, nz - 1:nz]
        div = div + jnp.concatenate(
            [qz_body[:, 1:] - qz_body[:, :-1],
             qz_top - qz_body[:, nz - 1:nz]], axis=1)
        div = -div * iv_s[slot][:, :, K:K + nxv]

    out_ref[:, :, :, K:K + nxv] = div
    out_ref[:, :, :, 0:K] = jnp.zeros((nt, nz, by, K), div.dtype)
    out_ref[:, :, :, nxp - K:nxp] = jnp.zeros((nt, nz, by, K), div.dtype)


def _divergence_call(c_batched, U, V, wet_c, W, IV, order, vorder,
                     weights, by):
    nt, nz, nyp, nxp = c_batched.shape
    fused_z = W is not None
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

    ft = c_batched.dtype
    ins = [pad(c_batched), pad(wet_c), pad(U), pad(V)]
    scratch = [
        pltpu.VMEM((2, nt, nz, wy, nx_t), ft),
        pltpu.VMEM((2, nz, wy, nx_t), ft),
        pltpu.VMEM((2, nz, by + _MARGIN, nx_t), ft),
        pltpu.VMEM((2, nz, by + _MARGIN, nx_t), ft),
    ]
    if fused_z:
        ins += [pad(W), pad(IV)]
        scratch += [
            pltpu.VMEM((2, nz + 1, by, nx_t), ft),
            pltpu.VMEM((2, nz, by, nx_t), ft),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((2, 6 if fused_z else 4)))

    out = pl.pallas_call(
        partial(_kernel, order=order, vorder=vorder, nt=nt, nz=nz, by=by,
                nxp=nx_t, n_tiles=n_tiles, weights=weights),
        out_shape=jax.ShapeDtypeStruct((nt, nz, ny_t, nx_t), ft),
        grid=(n_tiles,),
        interpret=jax.default_backend() == "cpu",
        # the WENO dependency chain needs a deep scoped-VMEM stack; the
        # default 16 MB limit is far below the 128 MB physically available
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(ins),
        out_specs=pl.BlockSpec((nt, nz, by, nx_t), lambda j: (0, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )(*ins)
    return out[:, :, :nyp, :nxp]


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
    return _divergence_call(c_batched, U, V, wet_c, None, None, order,
                            None, weights, by)


def weno_tracer_divergence(c_batched, U, V, W, wet_c, inv_vol, order=5,
                           vertical_order=5, weights="zweno", by=8):
    """Fully-fused advective tendency: horizontal + vertical WENO flux
    divergence and the final ``-(div/vol)·wet`` in ONE kernel.

    Additional inputs over `weno_horizontal_divergence`:
    W: premultiplied vertical transport Az·w·wet_w at (Nz+1) faces.
    inv_vol: wet_c / (Az·Δz) — the reciprocal cell volume (3-D under z★).
    Returns the tendency `-(δx qx + δy qy + δz qz) / vol` on wet cells,
    matching `tracer.tracer_flux_divergence`'s XLA path to f32 roundoff.
    """
    return _divergence_call(c_batched, U, V, wet_c, W, inv_vol, order,
                            vertical_order, weights, by)
