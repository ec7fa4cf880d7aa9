"""Pallas-fused split-explicit barotropic substep window.

DESIGN.md lever 3 / SURVEY.md §7 hard part (a): the barotropic window is
70–300 forward-backward substeps of ~12 tiny 2-D VPU ops each. The XLA
scan issues every substep as HBM-bound kernels plus halo-strip
`dynamic-update-slice`s (~7 ms per RK3 stage at 1/4°); here the ENTIRE
window runs in ONE kernel with the full 2-D state VMEM-resident — at 1/4°
(560×1440) the ~20 live arrays are ~3.2 MB each, far under the 110 MB
scoped-VMEM budget, and every substep is pure VMEM traffic.

Semantics = `free_surface._substep_barotropic_unpadded` exactly (the
interior-only formulation): `jnp.roll` IS the periodic-x exchange, and
bounded-direction wrap-around reads land on zero-masked wall faces, so no
halo fills are needed at all — per-substep masking keeps wall transports
exactly zero. Folded (tripolar) grids and shard_map runs keep the XLA
path (the fold / ppermute exchange can't live inside one kernel).

Coefficients are folded outside the kernel into five constant fields so
the substep body is 4 shifts + ~10 fused multiply-adds:

    eta ← eta − R ⊙ [δx(CU ⊙ U) + δy(CV ⊙ V)]     R  = Δτ·wet_c/Az
    U   ← U + AU ⊙ δxf(eta) + BU                   AU = −Δτ·g·H_u/Δx_fc·wet_u
    V   ← V + AV ⊙ δyf(eta) + BV                   BU = Δτ·G_U·wet_u
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 110 * 1024 * 1024


def fits_vmem(ny, nx, n_arrays=24, itemsize=4, budget=None):
    """Whole-domain residency check: inputs (10) + outputs (8) + live loop
    temporaries (~6)."""
    if budget is None:
        budget = int(0.85 * _VMEM_LIMIT)
    nx_t = -(-nx // 128) * 128
    ny_t = -(-ny // 8) * 8
    return n_arrays * ny_t * nx_t * itemsize <= budget


def _xp1(a, n):
    """a[i+1] with wrap at the REAL width ``n`` (the lanes beyond n are
    dead padding)."""
    return jnp.concatenate([a[:, 1:n], a[:, 0:1], a[:, n:]], axis=1)


def _xm1(a, n):
    return jnp.concatenate([a[:, n - 1:n], a[:, 0:n - 1], a[:, n:]], axis=1)


def _yp1(a, m):
    return jnp.concatenate([a[1:m], a[0:1], a[m:]], axis=0)


def _ym1(a, m):
    return jnp.concatenate([a[m - 1:m], a[0:m - 1], a[m:]], axis=0)


def _kernel(eta_ref, U_ref, V_ref, AU_ref, BU_ref, AV_ref, BV_ref,
            CU_ref, CV_ref, R_ref,
            eta_f, U_f, V_f, eta_a, U_a, V_a, U_e, V_e,
            *, M, ny, nx):
    ft = eta_ref.dtype
    AU = AU_ref[...]
    BU = BU_ref[...]
    AV = AV_ref[...]
    BV = BV_ref[...]
    CU = CU_ref[...]
    CV = CV_ref[...]
    R = R_ref[...]
    w = jnp.asarray(1.0 / M, ft)
    Mf = jnp.asarray(float(M), ft)

    z = jnp.zeros_like(eta_ref[...])
    init = (eta_ref[...], U_ref[...], V_ref[...], z, z, z, z, z)

    def body(j, carry):
        eta, U, V, ea, Ua, Va, Ue, Ve = carry
        we = 2.0 * (Mf - j.astype(ft)) / (Mf * Mf)
        Ue = Ue + we * U
        Ve = Ve + we * V
        qx = CU * U
        qy = CV * V
        eta = eta - R * ((_xp1(qx, nx) - qx) + (_yp1(qy, ny) - qy))
        U = U + AU * (eta - _xm1(eta, nx)) + BU
        V = V + AV * (eta - _ym1(eta, ny)) + BV
        return (eta, U, V, ea + w * eta, Ua + w * U, Va + w * V, Ue, Ve)

    eta, U, V, ea, Ua, Va, Ue, Ve = jax.lax.fori_loop(0, M, body, init)
    eta_f[...] = eta
    U_f[...] = U
    V_f[...] = V
    eta_a[...] = ea
    U_a[...] = Ua
    V_a[...] = Va
    U_e[...] = Ue
    V_e[...] = Ve


def barotropic_window_pallas(eta0, U0, V0, AU, BU, AV, BV, CU, CV, R, M):
    """Run the M-substep forward-backward window on interior (Ny, Nx)
    arrays; returns (eta, U, V, eta_avg, U_avg, V_avg, U_eff, V_eff).

    All inputs must already be wall-masked (see module docstring for the
    coefficient definitions); outputs carry the same masking invariants as
    `free_surface._substep_barotropic_unpadded`.
    """
    ny, nx = eta0.shape
    ny_t = -(-ny // 8) * 8
    nx_t = -(-nx // 128) * 128

    def pad(a):
        return jnp.pad(a, ((0, ny_t - ny), (0, nx_t - nx)))

    ins = [pad(a) for a in (eta0, U0, V0, AU, BU, AV, BV, CU, CV, R)]
    ft = eta0.dtype
    sd = jax.ShapeDtypeStruct((ny_t, nx_t), ft)
    outs = pl.pallas_call(
        partial(_kernel, M=M, ny=ny, nx=nx),
        out_shape=[sd] * 8,
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
    )(*ins)
    return tuple(o[:ny, :nx] for o in outs)
