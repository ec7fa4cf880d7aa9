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
exactly zero. Where this whole-window kernel can't run — shard_map tiles
(the ppermute exchange can't live inside one kernel) and VMEM-oversize
grids — the BLOCK kernel at the bottom of this module fuses
k = (H−1)//2 substeps per kernel between halo fills instead.

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
              budget=None, fold=False):
    if budget is None:
        budget = _VMEM_LIMIT
    nx_t = -(-nx // 128) * 128
    ny_t = -(-ny // 8) * 8
    extra = 0
    if fold:
        # mirror permutation matrix + packed seam rows / matmul temporaries
        extra = nx_t * nx_t * itemsize + 4 * 8 * nx_t * itemsize
    return (n_live_arrays(with_eff, with_final) * ny_t * nx_t * itemsize
            + extra <= budget)


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
            CU_ref, CV_ref, R_ref, *refs,
            M, ny, nx, with_eff, with_final, fold):
    """``fold=True`` adds the tripolar northern seam: the seam V face row
    is carried prognostically inside the kernel (refs gain the mirror
    permutation matrix P and a packed seam-constant block; outputs gain a
    packed seam-row block). The fold's x-mirror is an EXACT permutation
    matmul — ``jnp.dot(row, P, precision="float32")`` (bf16x3 is exact for
    a 0/1 matrix; `lax.rev` has no Mosaic lowering) — so the seam is
    refreshed every substep, matching the padded path's interior exactly
    where its deferred fills are exact."""
    if fold:
        P_ref, seam_ref = refs[0], refs[1]
        out_refs = refs[2:-1]
        seam_out = refs[-1]
    else:
        out_refs = refs
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
    if fold:
        P = P_ref[...]
        AVs = seam_ref[0:1]
        BVs = seam_ref[1:2]
        CVs = seam_ref[2:3]
        Vs0 = seam_ref[3:4]
        wet_s = seam_ref[4:5]
        zs = jnp.zeros_like(Vs0)
        init = init + (Vs0, zs) + ((zs,) if with_eff else ())

    def mirror(row):
        return jnp.dot(row, P, precision="float32",
                       preferred_element_type=ft)

    def body(j, carry):
        if fold:
            if with_eff:
                *carry, Vs, Vs_a, Vs_e = carry
            else:
                *carry, Vs, Vs_a = carry
        eta, U, V, ea, Ua, Va, *eff = carry
        if with_eff:
            we = 2.0 * (Mf - j.astype(ft)) / (Mf * Mf)
            eff = (eff[0] + we * U, eff[1] + we * V)
            if fold:
                Vs_e = Vs_e + we * Vs
        qx = CU * U
        qy = CV * V
        dy = _yp1(qy, ny) - qy
        if fold:
            top = CVs * Vs - qy[ny - 1:ny]
            dy = _cat([dy[:ny - 1], top, dy[ny:]], 0)
        eta = eta - R * ((_xp1(qx, nx) - qx) + dy)
        U = U + AU * (eta - _xm1(eta, nx)) + BU
        V = V + AV * (eta - _ym1(eta, ny)) + BV
        out = (eta, U, V, ea + w * eta, Ua + w * U, Va + w * V) + tuple(eff)
        if fold:
            # seam V: dyf(eta) across the fold = mirror(eta_top) − eta_top;
            # re-antisymmetrize every substep (the update preserves
            # antisymmetry analytically; this pins it to roundoff)
            eta_top = eta[ny - 1:ny]
            Vs = Vs + AVs * (mirror(eta_top) - eta_top) + BVs
            Vs = 0.5 * (Vs - mirror(Vs)) * wet_s
            out = out + (Vs, Vs_a + w * Vs) + ((Vs_e,) if with_eff else ())
        return out

    res = jax.lax.fori_loop(0, M, body, init)
    if fold:
        n_seam = 2 + with_eff
        seam_res = res[-n_seam:]
        res = res[:-n_seam]
    eta, U, V, ea, Ua, Va = res[:6]
    outs = [ea, Ua, Va]
    if with_eff:
        outs += [res[6], res[7]]
    if with_final:
        outs += [eta, U, V]
    for ref, val in zip(out_refs, outs):
        ref[...] = val
    if fold:
        Vs, Vs_a = seam_res[0], seam_res[1]
        Vs_e = seam_res[2] if with_eff else jnp.zeros_like(Vs)
        # rows: 0 = window-average, 1 = effective, 2 = final
        seam_out[...] = _cat([Vs_a, Vs_e, Vs,
                              jnp.zeros((5, Vs.shape[1]), ft)], 0)


def barotropic_window_pallas(eta0, U0, V0, AU, BU, AV, BV, CU, CV, R, M,
                             with_eff=True, with_final=True, seam=None):
    """Run the M-substep forward-backward window on interior (Ny, Nx)
    arrays; returns (eta_avg, U_avg, V_avg[, U_eff, V_eff][, eta, U, V]).

    All inputs must already be wall-masked (see module docstring for the
    coefficient definitions); outputs carry the same masking invariants as
    `free_surface._substep_barotropic_unpadded`. ``with_eff`` /
    ``with_final`` gate the mass-consistent effective transports (only
    needed under ROMS ordering) and the final instantaneous state (the RK3
    stages discard it) — each skipped output saves whole-domain VMEM
    arrays, the binding constraint at 1/4°.

    ``seam`` (tripolar fold): a dict with ``p`` (the pole face-column of
    the INTERIOR x indexing) and the seam-face rows ``AVs``, ``BVs``,
    ``CVs``, ``Vs0`` (each (Nx,), pre-masked); the return tuple then ends
    with (Vs_avg, Vs_eff, Vs_final) seam rows.
    """
    ny, nx = eta0.shape
    ny_t = -(-ny // 8) * 8
    nx_t = -(-nx // 128) * 128

    def pad(a):
        return jnp.pad(a, ((0, ny_t - ny), (0, nx_t - nx)))

    ins = [pad(a) for a in (eta0, U0, V0, AU, BU, AV, BV, CU, CV, R)]
    ft = eta0.dtype
    fold = seam is not None
    if fold:
        # mirror permutation as an on-device 0/1 matrix (no host constant
        # rides the serialized HLO): mirrored[i] = row[(2p−1−i) mod nx]
        p = seam["p"]
        i = jnp.arange(nx_t)
        mcol = (2 * p - 1 - i) % nx
        P = ((i[:, None] == mcol[None, :]) & (i[:, None] < nx)
             & (i[None, :] < nx)).astype(ft)
        seam_in = jnp.stack([
            jnp.pad(seam["AVs"], (0, nx_t - nx)),
            jnp.pad(seam["BVs"], (0, nx_t - nx)),
            jnp.pad(seam["CVs"], (0, nx_t - nx)),
            jnp.pad(seam["Vs0"], (0, nx_t - nx)),
            jnp.pad(seam["wet"], (0, nx_t - nx)),
        ]).astype(ft)
        ins += [P, jnp.pad(seam_in, ((0, 3), (0, 0)))]
    sd = jax.ShapeDtypeStruct((ny_t, nx_t), ft)
    n_out = 3 + 2 * with_eff + 3 * with_final
    out_shape = [sd] * n_out
    if fold:
        out_shape += [jax.ShapeDtypeStruct((8, nx_t), ft)]
    outs = pl.pallas_call(
        partial(_kernel, M=M, ny=ny, nx=nx, with_eff=with_eff,
                with_final=with_final, fold=fold),
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
    )(*ins)
    main = tuple(o[:ny, :nx] for o in outs[:n_out])
    if fold:
        s = outs[n_out]
        return main + (s[0, :nx], s[1, :nx], s[2, :nx])
    return main


# --------------------------------------------------------------------------
# block-substep kernel (distributed tiles + VMEM-oversize single-device)
# --------------------------------------------------------------------------
#
# The whole-window kernel above needs the full 2-D state VMEM-resident for
# all M substeps — impossible under shard_map (the per-substep ppermute
# exchange can't live inside one kernel) and for ≥1/4° tripolar
# single-device state (VERDICT r3 items 1+2). The block kernel runs
# k = (H−1)//2 substeps — exactly the deferred-fill cadence the padded XLA
# path already proved exact (`free_surface._substep_barotropic_padded`) —
# on the PADDED tile between halo fills: under shard_map the fill is the
# ppermute exchange, single-device it is `fill_halos` (incl. the tripolar
# fold). Semantics are the padded path's inner loop verbatim (roll-wrap at
# the padded extents IS what `jnp.roll` does there; masks folded into the
# coefficients), so per-tile compute collapses from ~12 HBM-bound XLA ops
# per substep to one VMEM-resident kernel per block. Oversize tiles split
# into y-slabs with 2k ghost rows (one substep consumes 2 rings).


def _block_kernel(eta_ref, U_ref, V_ref, ea_ref, Ua_ref, Va_ref,
                  Ue_ref, Ve_ref,
                  AU_ref, BU_ref, AV_ref, BV_ref, CU_ref, CV_ref, R_ref,
                  we_ref, *out_refs, k, m, n, M, with_eff):
    """k substeps on a padded tile; ``m``/``n`` are the REAL (wrap)
    extents — lanes/sublanes beyond are dead padding. ``we_ref``: (8,)
    SMEM effective-transport weights for the k substeps of this block."""
    ft = eta_ref.dtype
    AU = AU_ref[...]
    BU = BU_ref[...]
    AV = AV_ref[...]
    BV = BV_ref[...]
    CU = CU_ref[...]
    CV = CV_ref[...]
    R = R_ref[...]
    w = jnp.asarray(1.0 / M, ft)

    eta, U, V = eta_ref[...], U_ref[...], V_ref[...]
    ea, Ua, Va = ea_ref[...], Ua_ref[...], Va_ref[...]
    if with_eff:
        Ue, Ve = Ue_ref[...], Ve_ref[...]
    for j in range(k):
        if with_eff:
            we = we_ref[j]
            Ue = Ue + we * U
            Ve = Ve + we * V
        qx = CU * U
        qy = CV * V
        eta = eta - R * ((_xp1(qx, n) - qx) + (_yp1(qy, m) - qy))
        U = U + AU * (eta - _xm1(eta, n)) + BU
        V = V + AV * (eta - _ym1(eta, m)) + BV
        ea, Ua, Va = ea + w * eta, Ua + w * U, Va + w * V
    outs = (eta, U, V, ea, Ua, Va) + ((Ue, Ve) if with_eff else ())
    for ref, val in zip(out_refs, outs):
        ref[...] = val


def _block_call(arrs, coeffs, we_block, k, m, n, M, with_eff):
    """One pallas call on (already slab-cut or whole) padded arrays."""
    mp, np_ = arrs[0].shape
    m_t = -(-mp // 8) * 8
    n_t = -(-np_ // 128) * 128

    def pad(a):
        return jnp.pad(a, ((0, m_t - mp), (0, n_t - np_)))

    n_state = len(arrs)
    ins = [pad(a) for a in arrs] + [pad(a) for a in coeffs] \
        + [jnp.pad(we_block.astype(arrs[0].dtype), (0, 8 - k))]
    sd = jax.ShapeDtypeStruct((m_t, n_t), arrs[0].dtype)
    outs = pl.pallas_call(
        partial(_block_kernel, k=k, m=m, n=n, M=M, with_eff=with_eff),
        out_shape=[sd] * n_state,
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrs)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(coeffs)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_state,
        input_output_aliases={i: i for i in range(n_state)},
    )(*ins)
    return tuple(o[:mp, :np_] for o in outs)


def block_slabs(nyp, nxp, n_state=8, n_coeff=7, itemsize=4, budget=None,
                k=3):
    """Number of y-slabs needed for the block kernel to fit VMEM (live ≈
    state in+out (aliased, counted twice to be safe vs Mosaic accounting)
    + coefficients + ~6 loop temporaries).  ``k`` is the substeps-per-block
    count: the y-slab path adds 2k ghost rows PER SIDE (4k total), so the
    estimate must use the actual ghost overhead — a flat constant
    undercounts and can pick too few slabs, turning a finer split into a
    Mosaic VMEM-limit failure (ADVICE r4, low)."""
    if budget is None:
        budget = _VMEM_LIMIT
    n_live = 2 * n_state + n_coeff + 6
    nx_t = -(-nxp // 128) * 128
    slabs = 1
    while slabs < 32:
        ghost = 4 * k if slabs > 1 else 0
        ny_t = -(-(-(-nyp // slabs) + ghost) // 8) * 8
        if n_live * ny_t * nx_t * itemsize <= budget:
            return slabs
        slabs *= 2
    return 0


def barotropic_block_pallas(state, coeffs, we_block, k, M, with_eff=True,
                            n_slabs=1):
    """Advance one deferred-fill block (k substeps) of the padded-path
    barotropic loop in Pallas. ``state`` = (eta, U, V, eta_a, U_a, V_a
    [, U_eff, V_eff]) padded tiles; ``coeffs`` = (AU, BU, AV, BV, CU, CV,
    R) with wet masks folded; ``we_block``: (k,) entering-transport
    weights. Wrap semantics = `jnp.roll` on the padded arrays (the XLA
    path's); callers fill halos between blocks. ``n_slabs`` > 1 splits the
    tile into y-slabs with 2k ghost rows each (stitched interiors are
    exact; ghost rows are recomputed garbage discarded at stitch)."""
    nyp, nxp = state[0].shape
    if n_slabs <= 1:
        return _block_call(state, coeffs, we_block, k, nyp, nxp, M, with_eff)
    G = 2 * k
    hs = -(-nyp // n_slabs)
    out_parts = [[] for _ in state]
    for s in range(n_slabs):
        y0, y1 = s * hs, min((s + 1) * hs, nyp)
        take = jnp.mod(jnp.arange(y0 - G, y1 + G), nyp)
        cut_in = [jnp.take(a, take, axis=0) for a in state]
        cut_co = [jnp.take(a, take, axis=0) for a in coeffs]
        res = _block_call(cut_in, cut_co, we_block, k,
                          (y1 - y0) + 2 * G, nxp, M, with_eff)
        for lst, r in zip(out_parts, res):
            lst.append(r[G:G + (y1 - y0)])
    return tuple(jnp.concatenate(p, axis=0) for p in out_parts)
