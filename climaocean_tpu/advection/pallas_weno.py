"""Pallas-fused WENO tracer advection kernel.

The hot op of the model (SURVEY.md §3.2: 3-D advection stencils are the
hottest kernels). The XLA path (`advection/tracer.py`) builds the WENO
reconstruction from ~30 `jnp.roll` views per axis; the measured cost
(~40 ms/stage at 1/4°) shows those chains don't fuse into single passes.
This kernel computes the full flux divergence for a batch of tracers in one
`pallas_call`: each (y, x) tile's stencil window is DMA'd from HBM into
VMEM once, the whole WENO-5 reconstruction + flux divergence happens
on-chip, and one output tile is written back — HBM traffic drops to ~1
read + 1 write per field.

BlockSpec windows cannot overlap, so inputs stay in `ANY` (HBM) and the
kernel DMAs the halo-enlarged window per tile with `pl.ds` (async copy +
semaphore), the standard Pallas halo pattern.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8
_PENALTY = 1e8
H_STENCIL = 3            # WENO-5: flux at face i needs cells i-3 .. i+2


def _weno5_face(vals, wets, sign):
    """WENO-5-Z upwind value at the face between cells vals[2] and vals[3]
    (`vals` = cell values at offsets -3..+2 from the face, ascending)."""
    vm3, vm2, vm1, v0, v1, v2 = vals
    wm3, wm2, wm1, w0, w1, w2 = wets

    def biased(a2, a1, a0, b0, b1, w_a2, w_a1, w_a0, w_b0, w_b1):
        r0 = (1.0 / 3.0) * a0 + (5.0 / 6.0) * b0 - (1.0 / 6.0) * b1
        r1 = (-1.0 / 6.0) * a1 + (5.0 / 6.0) * a0 + (1.0 / 3.0) * b0
        r2 = (1.0 / 3.0) * a2 - (7.0 / 6.0) * a1 + (11.0 / 6.0) * a0
        c13 = 13.0 / 12.0
        b0_ = c13 * (a0 - 2 * b0 + b1) ** 2 + 0.25 * (3 * a0 - 4 * b0 + b1) ** 2
        b1_ = c13 * (a1 - 2 * a0 + b0) ** 2 + 0.25 * (a1 - b0) ** 2
        b2_ = c13 * (a2 - 2 * a1 + a0) ** 2 + 0.25 * (a2 - 4 * a1 + 3 * a0) ** 2
        b0_ = b0_ + _PENALTY * (3.0 - w_a0 - w_b0 - w_b1)
        b1_ = b1_ + _PENALTY * (3.0 - w_a1 - w_a0 - w_b0)
        b2_ = b2_ + _PENALTY * (3.0 - w_a2 - w_a1 - w_a0)
        tau = jnp.abs(b0_ - b2_)
        a0w = 0.3 * (1.0 + (tau / (b0_ + _EPS)) ** 2)
        a1w = 0.6 * (1.0 + (tau / (b1_ + _EPS)) ** 2)
        a2w = 0.1 * (1.0 + (tau / (b2_ + _EPS)) ** 2)
        return (a0w * r0 + a1w * r1 + a2w * r2) / (a0w + a1w + a2w)

    left = biased(vm3, vm2, vm1, v0, v1, wm3, wm2, wm1, w0, w1)
    right = biased(v2, v1, v0, vm1, vm2, w2, w1, w0, wm1, wm2)
    return jnp.where(sign >= 0.0, left, right)


def _kernel(c_hbm, u_hbm, v_hbm, w_hbm, wet_hbm, dyfc_hbm, dxcf_hbm, az_hbm,
            out_ref,
            c_s, u_s, v_s, w_s, wet_s, dyfc_s, dxcf_s, az_s, sems,
            *, nt, nz, by, bx, hy, hx):
    j = pl.program_id(0)
    i = pl.program_id(1)
    y0 = j * by
    x0 = i * bx
    wy = by + 2 * hy
    wx = bx + 2 * hx

    copies = [
        pltpu.make_async_copy(
            c_hbm.at[:, :, pl.ds(y0, wy), pl.ds(x0, wx)], c_s, sems.at[0]),
        pltpu.make_async_copy(
            u_hbm.at[:, pl.ds(y0, wy), pl.ds(x0, wx)], u_s, sems.at[1]),
        pltpu.make_async_copy(
            v_hbm.at[:, pl.ds(y0, wy), pl.ds(x0, wx)], v_s, sems.at[2]),
        pltpu.make_async_copy(
            w_hbm.at[:, pl.ds(y0, wy), pl.ds(x0, wx)], w_s, sems.at[3]),
        pltpu.make_async_copy(
            wet_hbm.at[:, pl.ds(y0, wy), pl.ds(x0, wx)], wet_s, sems.at[4]),
        pltpu.make_async_copy(
            dyfc_hbm.at[pl.ds(y0, wy), pl.ds(x0, wx)], dyfc_s, sems.at[5]),
        pltpu.make_async_copy(
            dxcf_hbm.at[pl.ds(y0, wy), pl.ds(x0, wx)], dxcf_s, sems.at[6]),
        pltpu.make_async_copy(
            az_hbm.at[pl.ds(y0, wy), pl.ds(x0, wx)], az_s, sems.at[7]),
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    c = c_s[...]
    u = u_s[...]
    v = v_s[...]
    w = w_s[...]
    wet = wet_s[...]
    dyfc = dyfc_s[...]
    dxcf = dxcf_s[...]
    az = az_s[...]
    # u, v arrive pre-multiplied by dz (Mosaic cannot broadcast a (nz,1,1)
    # factor across sublanes+lanes); the 1/dz scale is applied outside.

    ys = slice(hy, hy + by)
    xs = slice(hx, hx + bx)

    def sx(a, o):
        return a[..., hx + o: hx + o + bx]

    def sy(a, o):
        return a[..., hy + o: hy + o + by, :]

    def xflux(fo):
        uo = sy(sx(u, fo), 0)[None]
        vals = [sy(sx(c, fo + o), 0) for o in (-3, -2, -1, 0, 1, 2)]
        wets = [sy(sx(wet, fo + o), 0)[None] for o in (-3, -2, -1, 0, 1, 2)]
        cf = _weno5_face(vals, wets, uo)
        wu = sy(sx(wet, fo - 1), 0) * sy(sx(wet, fo), 0)
        return sy(sx(dyfc, fo), 0)[None, None] * uo * wu[None] * cf

    def yflux(fo):
        vo = sx(sy(v, fo), 0)[None]
        vals = [sx(sy(c, fo + o), 0) for o in (-3, -2, -1, 0, 1, 2)]
        wets = [sx(sy(wet, fo + o), 0)[None] for o in (-3, -2, -1, 0, 1, 2)]
        cf = _weno5_face(vals, wets, vo)
        wv = sx(sy(wet, fo - 1), 0) * sx(sy(wet, fo), 0)
        return sx(sy(dxcf, fo), 0)[None, None] * vo * wv[None] * cf

    qx0 = xflux(0)
    qx1 = xflux(1)
    qy0 = yflux(0)
    qy1 = yflux(1)

    # z flux: centered/upwind blend at interior faces (matches the XLA
    # path's clamped behavior to leading order; z columns are short)
    cc = c[..., ys, xs]
    wc = wet[..., ys, xs]
    wz = w[..., ys, xs]
    azc = az[ys, xs][None, None]

    c_lo = jnp.concatenate([cc[:, :1], cc[:, :-1]], axis=1)
    w_lo = jnp.concatenate([wc[:1], wc[:-1]], axis=0)
    wface = wz[1:nz][None]
    up = jnp.where(wface >= 0, c_lo[:, 1:], cc[:, 1:])
    ce = 0.5 * (c_lo[:, 1:] + cc[:, 1:])
    cz = 0.5 * (up + ce)
    wetw = (wc[1:] * w_lo[1:])[None]
    qz_int = azc * wface * wetw * cz
    # keep-dims slicing only: integer indexing lowers to dynamic_slice,
    # which Mosaic does not implement
    qz_top = azc[:, 0:1] * wz[nz:nz + 1][None] * wc[-1:][None] * cc[:, -1:]
    qz = jnp.concatenate([jnp.zeros_like(qz_int[:, :1]), qz_int, qz_top],
                         axis=1)

    div = (qx1 - qx0) + (qy1 - qy0) + (qz[:, 1:] - qz[:, :-1])
    out_ref[...] = -(div / azc) * wc[None]


def weno5_tracer_divergence(c_batched, u, v, w, grid, by=8, bx=128):
    """Fused Pallas WENO-5 flux divergence for batched tracers
    ``c_batched`` of shape (Nt, Nz, Nyp, Nxp); drop-in for the XLA path at
    order 5.

    Mosaic HBM slicing must be tile-aligned (lane dim: multiples of 128,
    sublane: 8), so the DMA window starts at the tile origin with padded
    left margins of (8, 128) and the stencil interior sits at that inner
    offset."""
    nt, nz, nyp, nxp = c_batched.shape
    hy, hx = 8, 128                  # aligned left margins (stencil needs 4)

    ny_t = -(-nyp // by) * by
    nx_t = -(-nxp // bx) * bx

    def pad(a, yax, xax):
        pads = [(0, 0)] * a.ndim
        pads[yax] = (hy, ny_t - nyp + hy)
        pads[xax] = (hx, nx_t - nxp + hx)
        return jnp.pad(a, pads)

    dzc = grid.dz_c[:, None, None]
    cp = pad(c_batched, 2, 3)
    up_ = pad(u * dzc, 1, 2)
    vp = pad(v * dzc, 1, 2)
    wp = pad(w, 1, 2)
    wetp = pad(grid.wet_c, 1, 2)
    dyp = pad(grid.dy_fc, 0, 1)
    dxp = pad(grid.dx_cf, 0, 1)
    azp = pad(jnp.maximum(grid.az_cc, 1.0), 0, 1)

    wy = by + 2 * hy
    wx = bx + 2 * hx
    ft = c_batched.dtype

    out = pl.pallas_call(
        partial(_kernel, nt=nt, nz=nz, by=by, bx=bx, hy=hy, hx=hx),
        out_shape=jax.ShapeDtypeStruct((nt, nz, ny_t, nx_t), ft),
        grid=(ny_t // by, nx_t // bx),
        interpret=jax.default_backend() == "cpu",
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 8,
        out_specs=pl.BlockSpec((nt, nz, by, bx), lambda j, i: (0, 0, j, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nt, nz, wy, wx), ft),
            pltpu.VMEM((nz, wy, wx), ft),
            pltpu.VMEM((nz, wy, wx), ft),
            pltpu.VMEM((nz + 1, wy, wx), ft),
            pltpu.VMEM((nz, wy, wx), ft),
            pltpu.VMEM((wy, wx), ft),
            pltpu.VMEM((wy, wx), ft),
            pltpu.VMEM((wy, wx), ft),
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )(cp, up_, vp, wp, wetp, dyp, dxp, azp)
    return out[:, :, :nyp, :nxp] / dzc
