"""Pallas-fused momentum tendency: vorticity + KE + vertical advection +
Coriolis + baroclinic pressure gradient + bottom drag in ONE kernel.

DESIGN.md lever 4. The XLA path (`vector_invariant.momentum_tendencies` +
the pressure/drag blocks of `hydrostatic.tendencies`) materializes ~30
shifted full-field intermediates per stage — measured 3.9 + 1.0 + drag
≈ 5 ms/stage at 1/4° vs a ~0.5 ms HBM roofline (reads u, v, w, b·dz and
masks; writes G_u, G_v). Here each y-slab's stencil window is DMA'd into
VMEM once (x unblocked, double-buffered across sequential grid steps, the
`pallas_weno` pattern) and the whole chain — relative vorticity with
free-slip corner masking, centered (Sadourny enstrophy-conserving) or
WENO-upwinded vorticity flux, KE gradient, −w∂z advection, the z-cumsum
hydrostatic integral ∫b dz, and the quadratic bottom drag — runs on-chip.

Semantics match the XLA path term by term (shared `weno._LEFT` tables for
the WENO-vector-invariant option); additions are reassociated, so parity
is f32-roundoff, not bitwise. The surface-stress plane add, the z★
pressure correction, and horizontal closure tendencies stay outside (all
cheap, and they keep this kernel coordinate-agnostic: z★ enters only
through the premultiplied ``b_dz`` = b·σΔz·wet and ``inv_sigma``).

Reference behavior contract: `omip_simulation.jl:588`
(EnstrophyConserving), `one_degree_tripolar.jl` WENOVectorInvariant(5);
vertical advective form and drag per Oceananigans' hydrostatic kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .weno import _LEFT, _weno_core  # noqa: F401  (shared tables)

_MARGIN = 8          # aligned sublane margin (stencil reach <= _MARGIN)
_VMEM_LIMIT = 110 * 1024 * 1024

# 2-D metric plane order in the stacked input
_MET = ("f_ff", "dy_cf", "dx_fc", "inv_az_ff", "dx_cf", "dy_fc",
        "inv_dx_fc", "inv_dy_cf", "inv_sigma")
_NMET = len(_MET)


def reach(order):
    """x/y stencil reach R: output cells [R, nxp-R) are computed. The
    grid halo must satisfy H >= R (interior cells adjacent to the halo
    otherwise get garbage)."""
    if order is None:
        return 2                      # centered q/K/Bint stencils
    return (order + 1) // 2 + 1       # WENO on q reaches K-1 past the +-1


def scratch_vmem_bytes(nz, nxp, by, itemsize=4):
    """Static double-buffered scratch footprint (input slabs + outputs)."""
    wy = by + 2 * _MARGIN
    nx_t = -(-nxp // 128) * 128
    n = 2 * (3 * nz * wy              # u, v, wet_c (full window)
             + (nz + 1) * wy          # w
             + nz * wy                # b_dz
             + 2 * nz * by            # wet_u, wet_v
             + _NMET * wy)            # metric planes
    n += 2 * nz * by                  # G_u, G_v output blocks
    return n * nx_t * itemsize


def choose_block(nz, nxp, budget=None):
    """Largest y-slab whose scratch fits (None -> caller uses XLA path).
    The WENO-q chain's live temporaries ride on top, so gate well below
    the scoped-VMEM request."""
    if budget is None:
        budget = int(0.6 * _VMEM_LIMIT)
    for by in (32, 16, 8, 4):
        if scratch_vmem_bytes(nz, nxp, by) <= budget:
            return by
    return None


def _upwind_q(cell, up, order, weights):
    """Upwind WENO reconstruction without wet-mask penalties (the XLA path
    reconstructs the corner vorticity with wet=None — free-slip corners
    are already zeroed in q itself)."""
    cache = {}

    def get_val(o):
        if o not in cache:
            cache[o] = jnp.where(up, cell(o), cell(-1 - o))
        return cache[o]

    return _weno_core(get_val, None, order, weights)


def _kernel(inv_dzf_ref, inv_dzc_ref,
            u_hbm, v_hbm, w_hbm, bdz_hbm, wetc_hbm, wetu_hbm, wetv_hbm,
            met_hbm, gu_ref, gv_ref,
            u_s, v_s, w_s, bdz_s, wetc_s, wetu_s, wetv_s, met_s, sems,
            *, order, weights, nz, by, n_tiles, nxp, R, Cd):
    j = pl.program_id(0)
    M = _MARGIN
    wy = by + 2 * M
    nxv = nxp - 2 * R

    def dma(jj, s):
        y0 = jj * by
        full = pl.ds(y0, wy)
        blk = pl.ds(y0 + M, by)
        return [
            pltpu.make_async_copy(u_hbm.at[:, full, :], u_s.at[s],
                                  sems.at[s, 0]),
            pltpu.make_async_copy(v_hbm.at[:, full, :], v_s.at[s],
                                  sems.at[s, 1]),
            pltpu.make_async_copy(w_hbm.at[:, full, :], w_s.at[s],
                                  sems.at[s, 2]),
            pltpu.make_async_copy(bdz_hbm.at[:, full, :], bdz_s.at[s],
                                  sems.at[s, 3]),
            pltpu.make_async_copy(wetc_hbm.at[:, full, :], wetc_s.at[s],
                                  sems.at[s, 4]),
            pltpu.make_async_copy(wetu_hbm.at[:, blk, :], wetu_s.at[s],
                                  sems.at[s, 5]),
            pltpu.make_async_copy(wetv_hbm.at[:, blk, :], wetv_s.at[s],
                                  sems.at[s, 6]),
            pltpu.make_async_copy(met_hbm.at[:, full, :], met_s.at[s],
                                  sems.at[s, 7]),
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

    u = u_s[slot]                 # (nz, wy, nxt) — premasked by wet_u
    v = v_s[slot]                 # premasked by wet_v
    w = w_s[slot]                 # (nz+1, wy, nxt) — premasked by wet_w
    bdz = bdz_s[slot]             # b · Δz(σ) · wet_c
    wetc = wetc_s[slot]
    wetu = wetu_s[slot]           # (nz, by, nxt)
    wetv = wetv_s[slot]
    met = met_s[slot]
    f_ff, dy_cf, dx_fc, inv_az_ff, dx_cf, dy_fc, inv_dx_fc, inv_dy_cf, \
        inv_sig = (met[i] for i in range(_NMET))
    ft = u.dtype
    nxt = u.shape[-1]

    def blk2(a, ro=0, co=0, h=by, wd=nxv):
        """2-D window slice at output-relative (row, col) offsets."""
        return a[M + ro:M + ro + h, R + co:R + co + wd]

    def blk(a, ro=0, co=0, h=by, wd=nxv):
        """3-D window slice (z full)."""
        return a[:, M + ro:M + ro + h, R + co:R + co + wd]

    # ---- absolute vorticity q = ζ·corner_wet + f at corners (f,f) --------
    # Computed on the full window minus its first row/column (one-sided
    # left stencil); the dead row/col-0 entries are zero-padded and are
    # never reached by the accessors below (offsets stay >= 1 because
    # R >= K+1 and M >= K).
    dyv = dy_cf * v
    dxu = dx_fc * u
    circ = (dyv[:, 1:, 1:] - dyv[:, 1:, :-1]
            - dxu[:, 1:, 1:] + dxu[:, :-1, 1:])
    cw = (wetc[:, 1:, 1:] * wetc[:, 1:, :-1]
          * wetc[:, :-1, 1:] * wetc[:, :-1, :-1])
    # q is kept as the (nz, wy-1, nxt-1) CORE — q at window (r, c) is
    # q_core[r-1, c-1] — because Mosaic cannot concat zero-pad rows/cols
    # onto offset-layout slices ("offset mismatch on non-concat
    # dimension"). All accessors below shift indices by -1; they stay in
    # bounds because R >= K+1 and M >= K.
    q = circ * inv_az_ff[1:, 1:] * cw + f_ff[1:, 1:]

    def qc(ro, co):
        """q at output-relative (row, col) offsets (core indexing)."""
        return q[:, M - 1 + ro:M - 1 + ro + by, R - 1 + co:R - 1 + co + nxv]

    # ---- transports interpolated to the opposite velocity point ----------
    Vm = dx_cf * v
    V_fc = 0.25 * (blk(Vm) + blk(Vm, ro=1) + blk(Vm, co=-1)
                   + blk(Vm, ro=1, co=-1))
    Um = dy_fc * u
    U_cf = 0.25 * (blk(Um) + blk(Um, ro=-1) + blk(Um, co=1)
                   + blk(Um, ro=-1, co=1))

    # ---- vorticity flux: centered (Sadourny) or WENO-upwind --------------
    if order is None:
        q_u = 0.5 * (qc(0, 0) + qc(1, 0))
        q_v = 0.5 * (qc(0, 0) + qc(0, 1))
    else:
        q_u = _upwind_q(lambda o: qc(1 + o, 0), V_fc >= 0.0,
                        order, weights)
        q_v = _upwind_q(lambda o: qc(0, 1 + o), U_cf >= 0.0,
                        order, weights)

    # ---- kinetic energy on an extended (by+1, nxv+1) block ---------------
    uu = u * u
    vv = v * v
    Ke = 0.5 * (0.5 * (blk(uu, ro=-1, co=-1, h=by + 1, wd=nxv + 1)
                       + blk(uu, ro=-1, co=0, h=by + 1, wd=nxv + 1))
                + 0.5 * (blk(vv, ro=-1, co=-1, h=by + 1, wd=nxv + 1)
                         + blk(vv, ro=0, co=-1, h=by + 1, wd=nxv + 1)))

    idx = inv_dx_fc[M:M + by, R:R + nxv]
    idy = inv_dy_cf[M:M + by, R:R + nxv]
    tend_u = (q_u * V_fc - (Ke[:, 1:, 1:] - Ke[:, 1:, :-1])) * idx
    tend_v = (-q_v * U_cf - (Ke[:, 1:, 1:] - Ke[:, :-1, 1:])) * idy

    # ---- vertical advection −w ∂z (advective form, face-averaged) --------
    ub = blk(u)
    vb = blk(v)
    wb = blk(w)                                       # (nz+1, by, nxv)
    w_u = 0.5 * (wb + blk(w, co=-1))
    w_v = 0.5 * (wb + blk(w, ro=-1))
    adv_u = []
    adv_v = []
    for k in range(nz):
        dudz_k = (ub[k] - ub[k - 1]) * inv_dzf_ref[k] if k > 0 \
            else jnp.zeros_like(ub[0])
        dudz_k1 = (ub[k + 1] - ub[k]) * inv_dzf_ref[k + 1] if k + 1 < nz \
            else jnp.zeros_like(ub[0])
        adv_u.append(0.5 * (w_u[k] * dudz_k + w_u[k + 1] * dudz_k1))
        dvdz_k = (vb[k] - vb[k - 1]) * inv_dzf_ref[k] if k > 0 \
            else jnp.zeros_like(vb[0])
        dvdz_k1 = (vb[k + 1] - vb[k]) * inv_dzf_ref[k + 1] if k + 1 < nz \
            else jnp.zeros_like(vb[0])
        adv_v.append(0.5 * (w_v[k] * dvdz_k + w_v[k + 1] * dvdz_k1))
    adv_u = jnp.stack(adv_u)
    adv_v = jnp.stack(adv_v)

    G_u = tend_u * wetu[:, :, R:R + nxv] - adv_u * wetu[:, :, R:R + nxv]
    G_v = tend_v * wetv[:, :, R:R + nxv] - adv_v * wetv[:, :, R:R + nxv]

    # ---- baroclinic pressure gradient ∂x/∂y ∫_z^0 b dz --------------------
    bext = blk(bdz, ro=-1, co=-1, h=by + 1, wd=nxv + 1)
    Bint = [None] * nz
    S = None
    for k in range(nz - 1, -1, -1):
        S = bext[k] if S is None else S + bext[k]
        Bint[k] = S - 0.5 * bext[k]
    Bint = jnp.stack(Bint)                            # (nz, by+1, nxv+1)
    G_u = G_u + (Bint[:, 1:, 1:] - Bint[:, 1:, :-1]) * idx \
        * wetu[:, :, R:R + nxv]
    G_v = G_v + (Bint[:, 1:, 1:] - Bint[:, :-1, 1:]) * idy \
        * wetv[:, :, R:R + nxv]

    # ---- quadratic bottom drag (deepest wet cell per column) -------------
    if Cd:
        isg = inv_sig[M:M + by, R:R + nxv]
        v_at_u = 0.25 * (blk(v) + blk(v, ro=1) + blk(v, co=-1)
                         + blk(v, ro=1, co=-1))
        u_at_v = 0.25 * (blk(u) + blk(u, ro=-1) + blk(u, co=1)
                         + blk(u, ro=-1, co=1))
        sp_u = jnp.sqrt(ub * ub + v_at_u * v_at_u)
        sp_v = jnp.sqrt(vb * vb + u_at_v * u_at_v)
        wu_blk = wetu[:, :, R:R + nxv]
        wv_blk = wetv[:, :, R:R + nxv]
        dr_u = []
        dr_v = []
        for k in range(nz):
            bot_u = wu_blk[k] * (1.0 - wu_blk[k - 1]) if k > 0 else wu_blk[0]
            bot_v = wv_blk[k] * (1.0 - wv_blk[k - 1]) if k > 0 else wv_blk[0]
            dr_u.append(Cd * sp_u[k] * ub[k]
                        * (inv_dzc_ref[k] * isg) * bot_u)
            dr_v.append(Cd * sp_v[k] * vb[k]
                        * (inv_dzc_ref[k] * isg) * bot_v)
        G_u = G_u - jnp.stack(dr_u)
        G_v = G_v - jnp.stack(dr_v)

    for ref, val in ((gu_ref, G_u), (gv_ref, G_v)):
        ref[:, :, R:R + nxv] = val
        ref[:, :, 0:R] = jnp.zeros((nz, by, R), ft)
        ref[:, :, nxt - R:nxt] = jnp.zeros((nz, by, R), ft)


def momentum_pressure_drag(u, v, w, b_dz, grid, f_ff, *, order=None,
                           weights="zweno", Cd=0.0, inv_sigma=None, by=8):
    """Fused (G_u, G_v): vorticity/Coriolis flux + KE gradient + vertical
    advection + hydrostatic pressure gradient + quadratic bottom drag.

    u, v, w: padded, halo-filled and wet-premasked (the caller's state).
    b_dz: buoyancy·Δz·wet_c (σΔz under z★ — the only z★-dependence inside).
    f_ff: planetary vorticity at corners. order=None -> centered
    (enstrophy-conserving); 5/7 -> WENO-upwinded vorticity flux.
    inv_sigma: 2-D 1/σ for the drag's cell thickness (None -> ones).
    Matches the XLA path to f32 roundoff (parity-tested)."""
    nz, nyp, nxp = u.shape
    R = reach(order)
    ny_t = -(-nyp // by) * by
    n_tiles = ny_t // by
    nx_t = -(-nxp // 128) * 128
    ft = u.dtype

    def pad3(a):
        return jnp.pad(a, ((0, 0), (_MARGIN, ny_t - nyp + _MARGIN),
                           (0, nx_t - nxp)))

    if inv_sigma is None:
        inv_sigma = jnp.ones((nyp, nxp), ft)
    met = jnp.stack([f_ff, grid.dy_cf, grid.dx_fc,
                     jnp.where(grid.az_ff > 0, 1.0 / grid.az_ff, 0.0),
                     grid.dx_cf, grid.dy_fc,
                     jnp.where(grid.dx_fc > 0, 1.0 / grid.dx_fc, 0.0),
                     jnp.where(grid.dy_cf > 0, 1.0 / grid.dy_cf, 0.0),
                     inv_sigma])
    met = jnp.pad(met, ((0, 0), (_MARGIN, ny_t - nyp + _MARGIN),
                        (0, nx_t - nxp)))

    inv_dzf = jnp.where(grid.dz_f != 0, 1.0 / grid.dz_f, 0.0).astype(ft)
    inv_dzc = jnp.where(grid.dz_c != 0, 1.0 / grid.dz_c, 0.0).astype(ft)
    ins = [inv_dzf, inv_dzc,
           pad3(u), pad3(v), pad3(w), pad3(b_dz), pad3(grid.wet_c),
           pad3(grid.wet_u), pad3(grid.wet_v), met]
    wy = by + 2 * _MARGIN
    scratch = [
        pltpu.VMEM((2, nz, wy, nx_t), ft),            # u
        pltpu.VMEM((2, nz, wy, nx_t), ft),            # v
        pltpu.VMEM((2, nz + 1, wy, nx_t), ft),        # w
        pltpu.VMEM((2, nz, wy, nx_t), ft),            # b_dz
        pltpu.VMEM((2, nz, wy, nx_t), ft),            # wet_c
        pltpu.VMEM((2, nz, by, nx_t), ft),            # wet_u
        pltpu.VMEM((2, nz, by, nx_t), ft),            # wet_v
        pltpu.VMEM((2, _NMET, wy, nx_t), ft),         # metric planes
        pltpu.SemaphoreType.DMA((2, 8)),
    ]
    sd = jax.ShapeDtypeStruct((nz, ny_t, nx_t), ft)
    outs = pl.pallas_call(
        partial(_kernel, order=order, weights=weights, nz=nz, by=by,
                n_tiles=n_tiles, nxp=nx_t, R=R, Cd=float(Cd)),
        out_shape=[sd, sd],
        grid=(n_tiles,),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * (len(ins) - 2),
        out_specs=[pl.BlockSpec((nz, by, nx_t), lambda j: (0, j, 0),
                                memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=scratch,
    )(*ins)
    return tuple(o[:, :nyp, :nxp] for o in outs)
