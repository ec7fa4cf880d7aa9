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

_VMEM_LIMIT = 123 * 1024 * 1024      # 128 MB physical minus headroom


def n_live_arrays(with_eff, with_final):
    """Live VMEM arrays in the kernel, validated against Mosaic's actual
    accounting (full variant = 38 arrays = 131 MB at 1/4°, measured):
    10 inputs + 2×(6 or 8) ping-ponged loop carries + outputs + ~4 loop
    temporaries."""
    carries = 6 + 2 * with_eff
    outs = 3 + 2 * with_eff + 3 * with_final
    return 10 + 2 * carries + outs + 4


def fits_vmem(ny, nx, with_eff=True, with_final=False, itemsize=4,
              budget=None):
    if budget is None:
        budget = _VMEM_LIMIT
    nx_t = -(-nx // 128) * 128
    ny_t = -(-ny // 8) * 8
    return (n_live_arrays(with_eff, with_final) * ny_t * nx_t * itemsize
            <= budget)


def _cat(parts, axis):
    """Concat skipping statically-empty parts (Mosaic rejects 0-size
    vector slices, which arise when the real extent equals the padded
    one)."""
    parts = [p for p in parts if p.shape[axis] > 0]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def _xp1(a, n):
    """a[i+1] with wrap at the REAL width ``n`` (the lanes beyond n are
    dead padding)."""
    return _cat([a[:, 1:n], a[:, 0:1], a[:, n:]], 1)


def _xm1(a, n):
    return _cat([a[:, n - 1:n], a[:, 0:n - 1], a[:, n:]], 1)


def _yp1(a, m):
    return _cat([a[1:m], a[0:1], a[m:]], 0)


def _ym1(a, m):
    return _cat([a[m - 1:m], a[0:m - 1], a[m:]], 0)


def _kernel(eta_ref, U_ref, V_ref, AU_ref, BU_ref, AV_ref, BV_ref,
            CU_ref, CV_ref, R_ref, *out_refs,
            M, ny, nx, with_eff, with_final):
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
    init = (eta_ref[...], U_ref[...], V_ref[...], z, z, z) \
        + ((z, z) if with_eff else ())

    def body(j, carry):
        eta, U, V, ea, Ua, Va, *eff = carry
        if with_eff:
            we = 2.0 * (Mf - j.astype(ft)) / (Mf * Mf)
            eff = (eff[0] + we * U, eff[1] + we * V)
        qx = CU * U
        qy = CV * V
        eta = eta - R * ((_xp1(qx, nx) - qx) + (_yp1(qy, ny) - qy))
        U = U + AU * (eta - _xm1(eta, nx)) + BU
        V = V + AV * (eta - _ym1(eta, ny)) + BV
        return (eta, U, V, ea + w * eta, Ua + w * U, Va + w * V) + tuple(eff)

    res = jax.lax.fori_loop(0, M, body, init)
    eta, U, V, ea, Ua, Va = res[:6]
    outs = [ea, Ua, Va]
    if with_eff:
        outs += [res[6], res[7]]
    if with_final:
        outs += [eta, U, V]
    for ref, val in zip(out_refs, outs):
        ref[...] = val


def barotropic_window_pallas(eta0, U0, V0, AU, BU, AV, BV, CU, CV, R, M,
                             with_eff=True, with_final=True):
    """Run the M-substep forward-backward window on interior (Ny, Nx)
    arrays; returns (eta_avg, U_avg, V_avg[, U_eff, V_eff][, eta, U, V]).

    All inputs must already be wall-masked (see module docstring for the
    coefficient definitions); outputs carry the same masking invariants as
    `free_surface._substep_barotropic_unpadded`. ``with_eff`` /
    ``with_final`` gate the mass-consistent effective transports (only
    needed under ROMS ordering) and the final instantaneous state (the RK3
    stages discard it) — each skipped output saves whole-domain VMEM
    arrays, the binding constraint at 1/4°.
    """
    ny, nx = eta0.shape
    ny_t = -(-ny // 8) * 8
    nx_t = -(-nx // 128) * 128

    def pad(a):
        return jnp.pad(a, ((0, ny_t - ny), (0, nx_t - nx)))

    ins = [pad(a) for a in (eta0, U0, V0, AU, BU, AV, BV, CU, CV, R)]
    ft = eta0.dtype
    sd = jax.ShapeDtypeStruct((ny_t, nx_t), ft)
    n_out = 3 + 2 * with_eff + 3 * with_final
    outs = pl.pallas_call(
        partial(_kernel, M=M, ny=ny, nx=nx, with_eff=with_eff,
                with_final=with_final),
        out_shape=[sd] * n_out,
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
    )(*ins)
    return tuple(o[:ny, :nx] for o in outs)
