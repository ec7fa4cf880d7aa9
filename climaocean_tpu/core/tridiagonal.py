"""Batched tridiagonal (Thomas) solver over vertical columns.

TPU-native replacement for Oceananigans' implicit-vertical-diffusion solver
and the in-kernel Thomas solve of the vendored NEMO-TKE closure (reference:
`nemo_tke_compute_closure_fields.jl:101-168`, SURVEY.md §2c).

The sweeps are UNROLLED over the (small, static) z axis with full
``(Ny, Nx)`` planes processed per level. A `lax.scan` formulation was
measured 2-4 us/level/plane slower on the v5e target: scan stacks its
per-level outputs through `dynamic-update-slice` kernels and pays a fixed
per-iteration launch cost, while the unrolled straight-line form fuses
level-to-level elementwise chains and emits ONE stack at the end. Columns
stay embarrassingly parallel on the VPU, matching the reference's
per-column parallelism (SURVEY.md §2d item 5). Set
CLIMAOCEAN_SCAN_TRIDIAGONAL=1 to fall back to the scan form (smaller HLO,
e.g. if a remote-compile size cap bites at Nz=100).

System convention (z-leading layout, k = 0 bottom):

    a[k] x[k-1] + b[k] x[k] + c[k] x[k+1] = d[k]

with ``a[0]`` and ``c[Nz-1]`` ignored. Degenerate rows (dry cells) should be
passed as (a=0, b=1, c=0, d=value).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _use_pallas():
    from ..advection.tracer import _use_pallas as up
    return up()


def solve_tridiagonal(a, b, c, d):
    """Solve a batch of tridiagonal systems along axis 0.

    a, b, c are broadcast-compatible arrays of shape (Nz, ...); ``d`` may
    additionally carry a LEADING field-batch axis (Nf, Nz, ...) sharing
    one matrix — the implicit T/S (and u/v) solves use this. Returns x
    with the same shape as d.

    On TPU backends, 3-D-plane problems route through the VMEM-resident
    Pallas kernel (`core/pallas_tridiagonal.py`); the unrolled XLA form
    below is the portable path (same algorithm, roundoff-equal).
    """
    batched = d.ndim == 4
    if (_use_pallas() and not os.environ.get("CLIMAOCEAN_SCAN_TRIDIAGONAL")
            and d.ndim in (3, 4) and d.shape[-1] >= 128):
        from .pallas_tridiagonal import choose_block, solve_tridiagonal_pallas
        nf = d.shape[0] if batched else 1
        by = choose_block(nf, d.shape[-3], d.shape[-1])
        if by is not None:     # else fall through: VMEM overflow (large Nz)
            target = d.shape[1:] if batched else d.shape
            ab, bb, cb = (jnp.broadcast_to(m, target) for m in (a, b, c))
            return solve_tridiagonal_pallas(ab, bb, cb, d, by=by)
    if batched:
        x = [solve_tridiagonal(a, b, c, d[i]) for i in range(d.shape[0])]
        return jnp.stack(x)
    if os.environ.get("CLIMAOCEAN_SCAN_TRIDIAGONAL"):
        return _solve_tridiagonal_scan(a, b, c, d)
    a, b, c, d = jnp.broadcast_arrays(a, b, c, d)
    nz = a.shape[0]
    eps = jnp.asarray(1e-30, dtype=b.dtype)

    # Forward sweep: c'[k] = c/(b - a c'[k-1]),  d'[k] = (d - a d'[k-1]) / (...)
    cp, dp = [], []
    cp_k = jnp.zeros_like(b[0])
    dp_k = jnp.zeros_like(b[0])
    for k in range(nz):
        denom = b[k] - a[k] * cp_k
        denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
        cp_k = c[k] / denom
        dp_k = (d[k] - a[k] * dp_k) / denom
        cp.append(cp_k)
        dp.append(dp_k)

    # Back substitution: x[k] = d'[k] - c'[k] x[k+1]
    x = dp[nz - 1]
    xs = [x]
    for k in range(nz - 2, -1, -1):
        x = dp[k] - cp[k] * x
        xs.append(x)
    return jnp.stack(xs[::-1])


def _solve_tridiagonal_scan(a, b, c, d):
    a, b, c, d = jnp.broadcast_arrays(a, b, c, d)
    eps = jnp.asarray(1e-30, dtype=b.dtype)

    def fwd(carry, abcd):
        cp_km1, dp_km1 = carry
        ak, bk, ck, dk = abcd
        denom = bk - ak * cp_km1
        denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
        cp = ck / denom
        dp = (dk - ak * dp_km1) / denom
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(b[0])
    (_, _), (cp, dp) = jax.lax.scan(fwd, (zeros, zeros), (a, b, c, d))

    def bwd(x_kp1, cpdp):
        cpk, dpk = cpdp
        x = dpk - cpk * x_kp1
        return x, x

    _, x_rev = jax.lax.scan(bwd, zeros, (cp, dp), reverse=True)
    return x_rev


def implicit_vertical_diffusion_matrix(kappa_w, dz_c, dz_f, dt, wet_c, wet_w):
    """Build Thomas coefficients for (I − Δt ∂z κ ∂z) x = rhs per column.

    Finite-volume discretization on the staggered column:

        (x[k] − rhs[k]) / Δt = [F[k+1] − F[k]] / Δz_c[k],
        F[k] = κ_w[k] (x[k] − x[k-1]) / Δz_f[k]   (flux at face k)

    Parameters
    ----------
    kappa_w : (Nz+1, Ny, Nx) diffusivity at w-faces (face 0 and Nz unused —
        no-flux boundaries are enforced via ``wet_w``).
    dz_c : (Nz,) cell thickness (or 3-D for moving z★ coordinates);
    dz_f : (Nz+1,) face spacing (or 3-D).
    wet_c, wet_w : wet masks; dry rows become identity.
    """
    dzc = dz_c[:, None, None] if dz_c.ndim == 1 else dz_c
    dzf = dz_f[:, None, None] if dz_f.ndim == 1 else dz_f
    kw = kappa_w * wet_w                       # zero flux through dry faces
    lam_lo = dt * kw[:-1] / (dzc * dzf[:-1])   # couples x[k-1]
    lam_hi = dt * kw[1:] / (dzc * dzf[1:])     # couples x[k+1]
    # Surface face (k = Nz) carries no diffusive flux of the implicit solve
    # (surface fluxes enter the explicit RHS), so zero the top coupling:
    lam_hi = lam_hi.at[-1].set(0.0)

    a = -lam_lo
    c = -lam_hi
    b = 1.0 + lam_lo + lam_hi
    # Dry cells: identity rows
    a = a * wet_c
    c = c * wet_c
    b = jnp.where(wet_c > 0, b, 1.0)
    return a, b, c
