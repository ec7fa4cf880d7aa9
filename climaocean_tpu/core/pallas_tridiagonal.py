"""Pallas VMEM-resident batched tridiagonal (Thomas) solver.

The XLA unrolled solver (`core/tridiagonal.py`) processes full (Ny, Nx)
planes per level, so the forward/backward sweeps materialize ~4·Nz
intermediate planes in HBM; at 1/4° the three implicit solves (T/S
batch, u, v) cost ~4.4 ms per RK3 stage. Here the whole column block
lives in VMEM: one y-slab of (a, b, c, d) streams in (standard Pallas
block pipelining — no stencil margins, so no manual DMA is needed), both
sweeps run on-chip, and one x slab streams out. Algorithm and operation
order match `tridiagonal.solve_tridiagonal` exactly (same eps clamp), so
results agree to FMA-contraction roundoff.

System convention (z-leading, k = 0 bottom), as in `core/tridiagonal.py`:

    a[k] x[k-1] + b[k] x[k] + c[k] x[k+1] = d[k]

Shapes: a, b, c: (Nz, Ny, Nx) shared across the field batch; d: (Nf, Nz,
Ny, Nx) (or (Nz, Ny, Nx) for a single field).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, c_ref, d_ref, x_ref, *, nz, nf):
    a = a_ref[...]
    b = b_ref[...]
    c = c_ref[...]
    d = d_ref[...]
    eps = jnp.asarray(1e-30, dtype=b.dtype)

    # Forward sweep (shared c' across the batch; per-field d')
    cp, dp = [], []
    cp_k = jnp.zeros_like(b[0])
    dp_k = jnp.zeros_like(d[:, 0])
    for k in range(nz):
        denom = b[k] - a[k] * cp_k
        denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
        cp_k = c[k] / denom
        dp_k = (d[:, k] - a[k] * dp_k) / denom
        cp.append(cp_k)
        dp.append(dp_k)

    # Back substitution
    x = dp[nz - 1]
    xs = [x]
    for k in range(nz - 2, -1, -1):
        x = dp[k] - cp[k] * x
        xs.append(x)
    x_ref[...] = jnp.stack(xs[::-1], axis=1)


_VMEM_LIMIT = 110 * 1024 * 1024


def block_vmem_bytes(nf, nz, nx, by, itemsize=4):
    """Live-VMEM estimate for one grid step: double-buffered in/out blocks
    (Pallas pipelining) + the forward sweep's retained cp/dp levels."""
    nx_t = -(-nx // 128) * 128
    pipelined = 2 * (3 * nz + 2 * nf * nz)       # a,b,c,d in + x out, ×2
    sweeps = nz * (1 + nf)                       # cp[k] and dp[k] kept live
    return (pipelined + sweeps) * by * nx_t * itemsize


def choose_block(nf, nz, nx, budget=None):
    """Largest y-slab whose live VMEM fits, or None (→ XLA fallback)."""
    if budget is None:
        budget = int(0.7 * _VMEM_LIMIT)
    for by in (16, 8, 4, 2):
        if block_vmem_bytes(nf, nz, nx, by) <= budget:
            return by
    return None


def _impl_kernel(inv_dzc_ref, inv_dzf_ref, dt_ref,
                 nu_ref, kap_ref, u_ref, v_ref, T_ref, S_ref,
                 wc_ref, wu_ref, wv_ref, ww_ref, isg2_ref, out_ref, *, nz):
    """Matrix build + Thomas for (u | ν-matrix, wet_u), (v | ν, wet_v),
    (T, S | κ-matrix, wet_c) — everything VMEM-resident per y-slab.
    Semantics = `tridiagonal.implicit_vertical_diffusion_matrix` +
    `solve_tridiagonal` exactly (same eps clamp and operation order)."""
    dt = dt_ref[0]
    nu = nu_ref[...]
    kap = kap_ref[...]
    wc = wc_ref[...]
    wu = wu_ref[...]
    wv = wv_ref[...]
    ww = ww_ref[...]
    isg2 = isg2_ref[...]
    eps = jnp.asarray(1e-30, dtype=nu.dtype)

    def lams(kw, k):
        """(lam_lo, lam_hi) at level k for face diffusivity kw (premasked
        by wet_w)."""
        lo = dt * kw[k] * (inv_dzc_ref[k] * inv_dzf_ref[k]) * isg2
        if k == nz - 1:
            hi = jnp.zeros_like(lo)      # no implicit flux through the top
        else:
            hi = dt * kw[k + 1] * (inv_dzc_ref[k] * inv_dzf_ref[k + 1]) * isg2
        return lo, hi

    def sweep(kw, wet, ds):
        """Forward-eliminate + back-substitute for fields ``ds`` sharing
        the (kw, wet) matrix; build a/b/c rows on the fly."""
        cp, dps = [], [[] for _ in ds]
        cp_k = jnp.zeros_like(wet[0])
        dp_k = [jnp.zeros_like(wet[0]) for _ in ds]
        for k in range(nz):
            lo, hi = lams(kw, k)
            ak = -lo * wet[k]
            ck = -hi * wet[k]
            bk = jnp.where(wet[k] > 0, 1.0 + lo + hi, 1.0)
            denom = bk - ak * cp_k
            denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
            cp_k = ck / denom
            cp.append(cp_k)
            for i, d in enumerate(ds):
                dp_k[i] = (d[k] * wet[k] - ak * dp_k[i]) / denom
                dps[i].append(dp_k[i])
        outs = []
        for dp in dps:
            x = dp[nz - 1]
            xs = [x]
            for k in range(nz - 2, -1, -1):
                x = dp[k] - cp[k] * x
                xs.append(x)
            outs.append(jnp.stack(xs[::-1]))
        return outs

    kwn = nu * ww
    kwk = kap * ww
    u_out, = sweep(kwn, wu, [u_ref[...]])
    v_out, = sweep(kwn, wv, [v_ref[...]])
    T_out, S_out = sweep(kwk, wc, [T_ref[...], S_ref[...]])
    out_ref[...] = jnp.stack([u_out, v_out, T_out, S_out])


def impl_block_vmem_bytes(nz, nx, by, itemsize=4):
    nx_t = -(-nx // 128) * 128
    pipelined = 2 * (10 * nz + 4 + 2 + 4 * nz)   # ins (+2 nz+1 extras) + out
    sweeps = 3 * nz + 4 * nz                     # cp chains + dp chains
    return (pipelined + sweeps) * by * nx_t * itemsize


def impl_choose_block(nz, nx, budget=None):
    if budget is None:
        budget = int(0.7 * _VMEM_LIMIT)
    for by in (16, 8, 4, 2):
        if impl_block_vmem_bytes(nz, nx, by) <= budget:
            return by
    return None


def implicit_vertical_solve_pallas(nu_w, kap_w, u, v, T, S, grid, dt,
                                   inv_sig2=None, by=8):
    """Fused implicit vertical diffusion of u, v, T, S: coefficient build
    and all four Thomas solves in ONE kernel (the XLA path materializes
    ~9 full coefficient fields in HBM — measured 4.3 ms/stage at 1/4° vs
    a ~0.6 ms roofline).

    nu_w, kap_w: (Nz+1, Ny, Nx) face diffusivities (NOT premasked; the
    kernel applies wet_w). inv_sig2: 2-D 1/σ² for z★ thickness scaling
    (None -> ones). Returns (u, v, T, S)."""
    nz, ny, nx = u.shape
    ny_t = -(-ny // by) * by
    nx_t = -(-nx // 128) * 128
    ft = u.dtype
    if inv_sig2 is None:
        inv_sig2 = jnp.ones((ny, nx), ft)

    def pad(arr):
        pads = [(0, 0)] * arr.ndim
        pads[-2] = (0, ny_t - ny)
        pads[-1] = (0, nx_t - nx)
        return jnp.pad(arr, pads)

    inv_dzc = jnp.where(grid.dz_c != 0, 1.0 / grid.dz_c, 0.0).astype(ft)
    inv_dzf = jnp.where(grid.dz_f != 0, 1.0 / grid.dz_f, 0.0).astype(ft)
    dt_arr = jnp.asarray([dt], ft)

    bs3 = lambda z: pl.BlockSpec((z, by, nx_t), lambda j: (0, j, 0))
    bs2 = pl.BlockSpec((by, nx_t), lambda j: (j, 0))
    n_tiles = ny_t // by
    x = pl.pallas_call(
        partial(_impl_kernel, nz=nz),
        out_shape=jax.ShapeDtypeStruct((4, nz, ny_t, nx_t), ft),
        grid=(n_tiles,),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [bs3(nz + 1), bs3(nz + 1), bs3(nz), bs3(nz), bs3(nz), bs3(nz),
           bs3(nz), bs3(nz), bs3(nz), bs3(nz + 1), bs2],
        out_specs=pl.BlockSpec((4, nz, by, nx_t), lambda j: (0, 0, j, 0)),
    )(inv_dzc, inv_dzf, dt_arr, pad(nu_w), pad(kap_w), pad(u), pad(v),
      pad(T), pad(S), pad(grid.wet_c), pad(grid.wet_u), pad(grid.wet_v),
      pad(grid.wet_w), pad(inv_sig2))
    x = x[:, :, :ny, :nx]
    return x[0], x[1], x[2], x[3]


def solve_tridiagonal_pallas(a, b, c, d, by=16):
    """Solve the batch of column systems with a fused Pallas kernel.

    a, b, c: (Nz, Ny, Nx); d: (Nf, Nz, Ny, Nx) or (Nz, Ny, Nx).
    Returns x with d's shape.
    """
    single = d.ndim == 3
    if single:
        d = d[None]
    nf, nz, ny, nx = d.shape
    ny_t = -(-ny // by) * by
    nx_t = -(-nx // 128) * 128

    def pad(arr):
        pads = [(0, 0)] * arr.ndim
        pads[-2] = (0, ny_t - ny)
        pads[-1] = (0, nx_t - nx)
        return jnp.pad(arr, pads)

    ft = d.dtype
    n_tiles = ny_t // by
    x = pl.pallas_call(
        partial(_kernel, nz=nz, nf=nf),
        out_shape=jax.ShapeDtypeStruct((nf, nz, ny_t, nx_t), ft),
        grid=(n_tiles,),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[
            pl.BlockSpec((nz, by, nx_t), lambda j: (0, j, 0)),
            pl.BlockSpec((nz, by, nx_t), lambda j: (0, j, 0)),
            pl.BlockSpec((nz, by, nx_t), lambda j: (0, j, 0)),
            pl.BlockSpec((nf, nz, by, nx_t), lambda j: (0, 0, j, 0)),
        ],
        out_specs=pl.BlockSpec((nf, nz, by, nx_t), lambda j: (0, 0, j, 0)),
    )(pad(a), pad(b), pad(c), pad(d))
    x = x[:, :, :ny, :nx]
    return x[0] if single else x
