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
