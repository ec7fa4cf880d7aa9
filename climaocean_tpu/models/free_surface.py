"""Split-explicit barotropic free surface.

TPU-native replacement for Oceananigans' `SplitExplicitFreeSurface(grid;
substeps)` (reference: `one_degree_tripolar.jl:61` substeps=70,
`half_degree_tripolar.jl` 150, `sixth_degree_tripolar.jl` 300; SURVEY.md
§2d item 4 — the fast 2-D mode is decoupled and substepped).

The 2-D system for free surface η and barotropic transports (U, V):

    ∂U/∂t = −g H_u ∂x η + Gᵁ        ∂η/∂t = −∇·(U, V)
    ∂V/∂t = −g H_v ∂y η + Gⱽ

is integrated forward–backward (η first, then transports against the new η)
over an extended window of length 2·Δt_stage with flat averaging weights —
the averaged (η̄, Ū, V̄) filter the barotropic noise exactly like the
reference's averaging kernel. The whole substep loop is a single
`lax.scan`, so XLA compiles one fused 2-D kernel body — per-substep work is
a handful of 2-D VPU ops with *no host round-trips* (and under `shard_map`,
one halo exchange per substep rides ICI; SURVEY.md §7 hard part (a)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.stencil import dxc, dxf, dyc, dyf
from ..physics.eos import G_EARTH


class BarotropicState(NamedTuple):
    eta: jnp.ndarray   # (Nyp, Nxp)
    U: jnp.ndarray     # x transport at u-points (m²/s)
    V: jnp.ndarray


class AveragedBarotropic(NamedTuple):
    """Window-averaged barotropic solution.

    ``U``/``V`` are the flat window averages (the noise filter, used to
    reconcile the prognostic momentum). ``U_eff``/``V_eff`` are the
    *mass-consistent* effective transports, accumulated with weights
    2(M−j)/M² over the forward-backward chain so that

        eta_avg = eta_0 − Δt ∇·(U_eff, V_eff)

    holds EXACTLY (telescoping of the substep η updates). Advecting tracers
    with velocities corrected to U_eff (ROMS ordering) makes a constant
    tracer exactly constant under z★ free-surface motion."""
    eta: jnp.ndarray
    U: jnp.ndarray
    V: jnp.ndarray
    U_eff: jnp.ndarray
    V_eff: jnp.ndarray


def column_depths(grid):
    """Static water depths at c, u, v points (2-D)."""
    dz = grid.dz_c[:, None, None]
    H_c = jnp.sum(grid.wet_c * dz, axis=0)
    H_u = jnp.sum(grid.wet_u * dz, axis=0)
    H_v = jnp.sum(grid.wet_v * dz, axis=0)
    return H_c, H_u, H_v


def barotropic_divergence(U, V, grid):
    return (dxc(grid.dy_fc * U) + dyc(grid.dx_cf * V)) / grid.az_cc


def substep_barotropic(bt: BarotropicState, grid, GU, GV, dt_stage,
                       substeps, fill_halos_2d, g=G_EARTH,
                       fill_U=None, fill_V=None, need_eff=True,
                       need_final=True):
    """Integrate the barotropic system over an extended window 2·dt_stage
    with ``substeps`` forward-backward steps; return the window-averaged
    state (and the final instantaneous state for the next stage).

    On TPU, non-folded single-device grids route through the Pallas fused
    window (`pallas_barotropic` — the ENTIRE substep loop in one kernel
    with the 2-D state VMEM-resident; DESIGN.md lever 3) when it fits
    VMEM; CLIMAOCEAN_PALLAS_BAROTROPIC=0/1 forces it off/on. Tripolar
    grids and shard_map runs (halo override active — the per-substep
    ppermute exchange can't live inside one kernel) use the padded XLA
    path. An unpadded XLA path also exists (same interior-only semantics
    as the kernel) — opt-in via CLIMAOCEAN_UNPADDED_BAROTROPIC=1, and the
    kernel's parity reference in tests.
    """
    import os
    from ..core.halo import _halo_override
    env = os.environ.get("CLIMAOCEAN_PALLAS_BAROTROPIC")
    from ..advection.tracer import _use_pallas
    use = _use_pallas() if env is None else env not in ("", "0")
    # fold-aware: "tripolar:<p>" grids run the seam INSIDE the kernel (the
    # x-mirror is an exact permutation matmul); other folded kinds (no
    # static pole column) keep the padded path
    fold = grid.kind.startswith("tripolar:")
    simple = not grid.kind.startswith("tripolar")
    if use and _halo_override.get() is None and (simple or fold):
        from .pallas_barotropic import fits_vmem
        if fits_vmem(grid.Ny, grid.Nx, with_eff=need_eff,
                     with_final=need_final, fold=fold):
            return _substep_barotropic_pallas(
                bt, grid, GU, GV, dt_stage, substeps, g,
                need_eff=need_eff, need_final=need_final, fold=fold)
    if simple and os.environ.get("CLIMAOCEAN_UNPADDED_BAROTROPIC"):
        return _substep_barotropic_unpadded(bt, grid, GU, GV, dt_stage,
                                            substeps, g)
    return _substep_barotropic_padded(bt, grid, GU, GV, dt_stage, substeps,
                                      fill_halos_2d, g, fill_U, fill_V)


def _substep_barotropic_pallas(bt, grid, GU, GV, dt_stage, substeps, g,
                               need_eff=True, need_final=True, fold=False):
    """Coefficient folding + interior cut for the Pallas fused window
    (`pallas_barotropic.barotropic_window_pallas`); embeds the results
    back into the padded layout exactly like the unpadded path. Skipped
    outputs (``need_eff``/``need_final``) come back as zeros — the VMEM
    saved is what lets the kernel fit whole-domain at 1/4°.

    ``fold``: tripolar northern seam — the seam V face row (padded row
    H+Ny, the fold line shared with the mirrored half) is handed to the
    kernel as extra state and embedded back, so downstream consumers
    (`barotropic_correct`, the v-location fold fill that antisymmetrizes
    the STORED seam row) see the evolved seam exactly like the padded
    path's."""
    from .pallas_barotropic import barotropic_window_pallas

    H = grid.H

    def cut(a):
        return a[..., H:H + grid.Ny, H:H + grid.Nx]

    H_c, H_u, H_v = column_depths(grid)
    wet2_u = cut((H_u > 0).astype(bt.U.dtype))
    wet2_v = cut((H_v > 0).astype(bt.V.dtype))
    wet2_c = cut((H_c > 0).astype(bt.eta.dtype))

    M = substeps
    dtau = 2.0 * dt_stage / M
    AU = -dtau * g * cut(H_u) / cut(grid.dx_fc) * wet2_u
    BU = dtau * cut(GU) * wet2_u
    AV = -dtau * g * cut(H_v) / cut(grid.dy_cf) * wet2_v
    BV = dtau * cut(GV) * wet2_v
    CU = cut(grid.dy_fc)
    CV = cut(grid.dx_cf)
    R = dtau * wet2_c / cut(grid.az_cc)

    seam = None
    if fold:
        jseam = H + grid.Ny

        def srow(a):
            return a[..., jseam, H:H + grid.Nx]

        wet_s = srow((H_v > 0).astype(bt.V.dtype))
        p_int = int(grid.kind.split(":")[1])
        # entry state matches the padded path's init fill: antisymmetrize
        # the stored seam, then mask
        mmap = (2 * p_int - 1 - jnp.arange(grid.Nx)) % grid.Nx
        s0 = srow(bt.V)
        s0 = 0.5 * (s0 - jnp.take(s0, mmap, axis=-1)) * wet_s
        seam = {
            "p": p_int,          # pole face-column in INTERIOR x indexing
            "AVs": -dtau * g * srow(H_v) / srow(grid.dy_cf) * wet_s,
            "BVs": dtau * srow(GV) * wet_s,
            "CVs": srow(grid.dx_cf),
            "Vs0": s0,
            "wet": wet_s,
        }

    outs = barotropic_window_pallas(
        cut(bt.eta) * wet2_c, cut(bt.U) * wet2_u, cut(bt.V) * wet2_v,
        AU, BU, AV, BV, CU, CV, R, M,
        with_eff=need_eff, with_final=need_final, seam=seam)
    if fold:
        Vs_a, Vs_e, Vs_f = outs[-3:]
        outs = outs[:-3]
    eta_a, U_a, V_a = outs[:3]
    U_e, V_e = outs[3:5] if need_eff else (None, None)
    fin = outs[3 + 2 * need_eff:] if need_final else None

    def embed(a, like, seam_row=None):
        if a is None:
            return jnp.zeros_like(like)
        out = jnp.zeros_like(like).at[..., H:H + grid.Ny,
                                      H:H + grid.Nx].set(a)
        if fold and seam_row is not None:
            out = out.at[..., H + grid.Ny, H:H + grid.Nx].set(seam_row)
        return out

    averaged = AveragedBarotropic(embed(eta_a, bt.eta), embed(U_a, bt.U),
                                  embed(V_a, bt.V, Vs_a if fold else None),
                                  embed(U_e, bt.U),
                                  embed(V_e, bt.V, Vs_e if fold else None))
    final = BarotropicState(embed(fin[0] if fin else None, bt.eta),
                            embed(fin[1] if fin else None, bt.U),
                            embed(fin[2] if fin else None, bt.V,
                                  Vs_f if fold and fin else None))
    return averaged, final


def _use_block_kernel():
    """Gate for the Pallas BLOCK kernel inside the padded path (VERDICT r3
    items 1+2): replaces each deferred-fill block's ~12·k XLA ops with one
    VMEM-resident kernel, composing with ANY halo fill between blocks —
    the shard_map ppermute exchange and the single-device fills (incl. the
    tripolar fold) alike. CLIMAOCEAN_PALLAS_BAROTROPIC_BLOCK=0/1 forces."""
    import os
    env = os.environ.get("CLIMAOCEAN_PALLAS_BAROTROPIC_BLOCK")
    if env is not None:
        return env not in ("", "0")
    from ..advection.tracer import _use_pallas
    return _use_pallas()


def _substep_barotropic_padded(bt, grid, GU, GV, dt_stage, substeps,
                               fill_halos_2d, g, fill_U=None, fill_V=None):
    H_c, H_u, H_v = column_depths(grid)
    wet2_u = (H_u > 0).astype(bt.U.dtype)
    wet2_v = (H_v > 0).astype(bt.V.dtype)
    wet2_c = (H_c > 0).astype(bt.eta.dtype)

    M = substeps
    dtau = 2.0 * dt_stage / M
    w = 1.0 / M
    fill_U = fill_U or fill_halos_2d
    fill_V = fill_V or fill_halos_2d

    # Deferred halo fills (wide-halo exchange-every-N; SURVEY.md §7 hard
    # part (a)): one substep consumes 2 halo rings — the η update reads U
    # one ring out, the transport update reads the new η one ring further —
    # so with halo width H the fills are exact every k = (H−1)//2 substeps.
    # The halo-strip `.at[].set` copies are the substep loop's dominant
    # kernel count on TPU (~12 small dynamic-update-slices per substep), so
    # halving/quartering them is a direct step-time win; the masks (wrap-
    # consistent in periodic x, dry in bounded halos) still apply every
    # substep, keeping wall transports exactly zero. Between fills the η/U/V
    # *halos* hold stale values — interior physics are exact (conservation
    # is interior-measured), and every downstream consumer refills first.
    # CLIMAOCEAN_BAROTROPIC_FILL_EVERY overrides the cadence for debugging.
    import os
    k_defer = int(os.environ.get("CLIMAOCEAN_BAROTROPIC_FILL_EVERY", 0)) \
        or max(1, (grid.H - 1) // 2)
    while M % k_defer:
        k_defer -= 1
    n_blocks = M // k_defer

    # mass-consistency weights: the U entering substep j (j = 0..M−1) drives
    # η updates for all remaining M−j substeps, so its weight in the
    # effective transport is (M−j)/M per dtau → 2(M−j)/M² per dt_stage.
    w_eff = (2.0 * (M - jnp.arange(M, dtype=bt.eta.dtype)) / (M * M)
             ).reshape(n_blocks, k_defer)

    # the deferred cadence assumes H >= 2 (one substep consumes two halo
    # rings: the η update reads U one ring out, the transport update reads
    # the NEW η one ring further); with H == 1 the η halo must be refreshed
    # mid-substep or interior transports at the subdomain edge read stale η
    mid_fill = grid.H < 2

    # Pallas block kernel: the k_defer inner substeps in ONE VMEM-resident
    # kernel per block (semantics = this loop verbatim: roll-wrap on the
    # padded tile, masks folded into the coefficients — exact because U/η
    # enter masked). Works under shard_map (the fills below are the
    # ppermute exchange) and on any single-device grid (y-slab split when
    # the tile outgrows VMEM) — VERDICT r3 items 1+2.
    use_block = not mid_fill and _use_block_kernel()
    if use_block:
        from .pallas_barotropic import barotropic_block_pallas, block_slabs
        n_slabs = block_slabs(bt.eta.shape[-2], bt.eta.shape[-1], k=k_defer)
        if n_slabs == 0:
            use_block = False
        else:
            AU2 = -dtau * g * H_u / grid.dx_fc * wet2_u
            BU2 = dtau * GU * wet2_u
            AV2 = -dtau * g * H_v / grid.dy_cf * wet2_v
            BV2 = dtau * GV * wet2_v
            R2 = dtau * wet2_c / grid.az_cc
            blk_coeffs = (AU2, BU2, AV2, BV2, grid.dy_fc, grid.dx_cf, R2)

    # on non-folded grids the fill is location/sign-independent, so the
    # three per-block fills collapse into ONE over a stacked (3, ...) array
    # (a third of the halo-strip slice ops — the block path's dominant
    # XLA cost between kernels)
    stack_fill = not grid.kind.startswith("tripolar")
    wet3 = jnp.stack([wet2_c, wet2_u, wet2_v]) if stack_fill else None

    def fill_state(eta, U, V):
        if stack_fill:
            s3 = fill_halos_2d(jnp.stack([eta, U, V])) * wet3
            return s3[0], s3[1], s3[2]
        return (fill_halos_2d(eta) * wet2_c, fill_U(U) * wet2_u,
                fill_V(V) * wet2_v)

    def body(carry, we_block):
        eta, U, V, eta_a, U_a, V_a, U_e, V_e = carry
        if use_block:
            (eta, U, V, eta_a, U_a, V_a, U_e, V_e) = barotropic_block_pallas(
                (eta, U, V, eta_a, U_a, V_a, U_e, V_e), blk_coeffs,
                we_block, k_defer, M, with_eff=True, n_slabs=n_slabs)
        else:
            for j in range(k_defer):
                we = we_block[j]
                U_e = U_e + we * U   # entering U: the one the η update uses
                V_e = V_e + we * V
                eta = (eta - dtau * barotropic_divergence(U, V, grid)) \
                    * wet2_c
                if mid_fill:
                    eta = fill_halos_2d(eta) * wet2_c
                U = (U + dtau * (-g * H_u * dxf(eta) / grid.dx_fc + GU)) \
                    * wet2_u
                V = (V + dtau * (-g * H_v * dyf(eta) / grid.dy_cf + GV)) \
                    * wet2_v
                eta_a, U_a, V_a = eta_a + w * eta, U_a + w * U, V_a + w * V
        # halo-fill BEFORE masking: masks are defined on the padded arrays
        # (dry in bounded-direction halos), so masking last keeps wall
        # transports exactly zero — replicated halo values must never
        # survive on dry faces or they inject spurious divergence.
        eta, U, V = fill_state(eta, U, V)
        return (eta, U, V, eta_a, U_a, V_a, U_e, V_e), None

    z = jnp.zeros_like(bt.eta)
    zU, zV = jnp.zeros_like(bt.U), jnp.zeros_like(bt.V)
    init = fill_state(bt.eta, bt.U, bt.V) + (z, zU, zV, zU, zV)
    (eta, U, V, eta_a, U_a, V_a, U_e, V_e), _ = jax.lax.scan(
        body, init, w_eff, length=n_blocks)

    # the accumulators sampled unfilled halo values between fills — refill
    # once so downstream consumers see consistent halos
    if stack_fill:
        s5 = fill_halos_2d(jnp.stack([eta_a, U_a, V_a, U_e, V_e])) \
            * jnp.stack([wet2_c, wet2_u, wet2_v, wet2_u, wet2_v])
        averaged = AveragedBarotropic(s5[0], s5[1], s5[2], s5[3], s5[4])
    else:
        averaged = AveragedBarotropic(fill_halos_2d(eta_a) * wet2_c,
                                      fill_U(U_a) * wet2_u,
                                      fill_V(V_a) * wet2_v,
                                      fill_U(U_e) * wet2_u,
                                      fill_V(V_e) * wet2_v)
    final = BarotropicState(eta, U, V)
    return averaged, final


def _substep_barotropic_unpadded(bt, grid, GU, GV, dt_stage, substeps, g):
    H = grid.H

    def cut(a):
        return a[..., H:H + grid.Ny, H:H + grid.Nx]

    H_c, H_u, H_v = column_depths(grid)
    wet2_u = cut((H_u > 0).astype(bt.U.dtype))
    wet2_v = cut((H_v > 0).astype(bt.V.dtype))
    wet2_c = cut((H_c > 0).astype(bt.eta.dtype))
    Hu = cut(H_u)
    Hv = cut(H_v)
    dyfc = cut(grid.dy_fc)
    dxcf = cut(grid.dx_cf)
    az = cut(grid.az_cc)
    dxfc = cut(grid.dx_fc)
    dycf = cut(grid.dy_cf)
    GU_i = cut(GU)
    GV_i = cut(GV)

    M = substeps
    dtau = 2.0 * dt_stage / M
    w = 1.0 / M

    w_eff = 2.0 * (M - jnp.arange(M, dtype=bt.eta.dtype)) / (M * M)

    def body(carry, we):
        eta, U, V, eta_a, U_a, V_a, U_e, V_e = carry
        U_e = U_e + we * U
        V_e = V_e + we * V
        div = (dxc(dyfc * U) + dyc(dxcf * V)) / az
        eta = (eta - dtau * div) * wet2_c
        U = (U + dtau * (-g * Hu * dxf(eta) / dxfc + GU_i)) * wet2_u
        V = (V + dtau * (-g * Hv * dyf(eta) / dycf + GV_i)) * wet2_v
        return (eta, U, V, eta_a + w * eta, U_a + w * U, V_a + w * V,
                U_e, V_e), None

    e0, U0, V0 = cut(bt.eta), cut(bt.U), cut(bt.V)
    z = jnp.zeros_like(e0)
    zU, zV = jnp.zeros_like(U0), jnp.zeros_like(V0)
    init = (e0, U0, V0, z, zU, zV, zU, zV)
    (eta, U, V, eta_a, U_a, V_a, U_e, V_e), _ = jax.lax.scan(
        body, init, w_eff, length=M)

    def embed(a, like):
        return jnp.zeros_like(like).at[..., H:H + grid.Ny, H:H + grid.Nx].set(a)

    averaged = AveragedBarotropic(embed(eta_a, bt.eta), embed(U_a, bt.U),
                                  embed(V_a, bt.V), embed(U_e, bt.U),
                                  embed(V_e, bt.V))
    final = BarotropicState(embed(eta, bt.eta), embed(U, bt.U),
                            embed(V, bt.V))
    return averaged, final


def barotropic_transport(u, v, grid):
    """Depth-integrated transports of the 3-D velocity."""
    dz = grid.dz_c[:, None, None]
    U = jnp.sum(u * grid.wet_u * dz, axis=0)
    V = jnp.sum(v * grid.wet_v * dz, axis=0)
    return U, V


def barotropic_correct(u, v, U_bar, V_bar, grid, sigma=None):
    """Replace the depth-mean of (u, v) with the averaged barotropic
    solution (the split-explicit reconciliation step).

    With ``sigma`` (the z★ column stretch, column-uniform 2-D field), the
    correction targets the *thickness-weighted* transport Σ u σ Δz = U_bar:
    du = (U_bar − σ U_p)/(σ H). The tracer flux thickness is σ Δz★ with the
    same one-sided σ indexing, so advecting with the corrected velocities
    preserves a constant tracer exactly (see AveragedBarotropic)."""
    H_c, H_u, H_v = column_depths(grid)
    U_p, V_p = barotropic_transport(u, v, grid)
    if sigma is None:
        du = (U_bar - U_p) / jnp.maximum(H_u, 1e-8)
        dv = (V_bar - V_p) / jnp.maximum(H_v, 1e-8)
    else:
        du = (U_bar - sigma * U_p) / jnp.maximum(sigma * H_u, 1e-8)
        dv = (V_bar - sigma * V_p) / jnp.maximum(sigma * H_v, 1e-8)
    u = (u + du[None, :, :]) * grid.wet_u
    v = (v + dv[None, :, :]) * grid.wet_v
    return u, v
