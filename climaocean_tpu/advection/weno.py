"""WENO-Z upwind reconstruction (orders 3, 5, 7) along any axis.

TPU-native replacement for Oceananigans' `WENO(order)` /
`WENOVectorInvariant` reconstruction stencils (reference call sites:
`latitude_longitude.jl:18`, `omip_simulation.jl:562-564,600`; SURVEY.md §2b).

Classic Jiang–Shu smoothness indicators with Borges et al. (2008) Z-weights.
Everything is branchless elementwise math on shifted copies of the field
(`jnp.roll` keeps shapes static), so XLA fuses the whole reconstruction into
one VPU loop — the TPU analogue of the reference's deliberately branchless
KernelAbstractions stencils (SURVEY.md §2c).

Immersed boundaries: substencils that touch dry cells get their smoothness
indicator inflated by a large penalty, so the nonlinear weights fall back to
wet substencils — the ENO mechanism doubles as the reference's near-boundary
reduced-order reconstruction (`minimum_buffer_upwind_order`).

Face convention: face ``i`` sits between centers ``i-1`` and ``i``. The
*left-biased* reconstruction (upwind for positive velocity) at face ``i``
uses cells ``i-1-r .. i+s``; the right-biased one is its exact mirror about
the face.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.stencil import shift_clamp, shift_n

_EPS = 1e-8      # float32-safe
_PENALTY = 1e8   # smoothness penalty per dry cell in a substencil

# Left-biased substencil tables: for substencil m, the ascending cell offsets
# relative to the face (offset 0 = cell i, -1 = cell i-1) and the matching
# point-value reconstruction coefficients at the face.
_LEFT = {
    3: {
        0: ((-1, 0), (0.5, 0.5)),
        1: ((-2, -1), (-0.5, 1.5)),
        "ideal": (2.0 / 3.0, 1.0 / 3.0),
    },
    5: {
        0: ((-1, 0, 1), (1.0 / 3.0, 5.0 / 6.0, -1.0 / 6.0)),
        1: ((-2, -1, 0), (-1.0 / 6.0, 5.0 / 6.0, 1.0 / 3.0)),
        2: ((-3, -2, -1), (1.0 / 3.0, -7.0 / 6.0, 11.0 / 6.0)),
        "ideal": (3.0 / 10.0, 6.0 / 10.0, 1.0 / 10.0),
    },
    7: {
        0: ((-1, 0, 1, 2), (0.25, 13.0 / 12.0, -5.0 / 12.0, 1.0 / 12.0)),
        1: ((-2, -1, 0, 1), (-1.0 / 12.0, 7.0 / 12.0, 7.0 / 12.0, -1.0 / 12.0)),
        2: ((-3, -2, -1, 0), (1.0 / 12.0, -5.0 / 12.0, 13.0 / 12.0, 0.25)),
        3: ((-4, -3, -2, -1), (-0.25, 13.0 / 12.0, -23.0 / 12.0, 25.0 / 12.0)),
        "ideal": (4.0 / 35.0, 18.0 / 35.0, 12.0 / 35.0, 1.0 / 35.0),
    },
}


def _beta(order, m, vals):
    """Jiang–Shu (order 3/5) / Balsara–Shu (order 7) smoothness indicator.

    ``vals`` are the substencil cell values in ascending x order (left-biased
    orientation). For the mirrored (right-biased) reconstruction the caller
    passes the mirrored value lists, which is equivalent by the reflection
    symmetry of beta combined with the reversed coefficient application.
    """
    if order == 3:
        return (vals[1] - vals[0]) ** 2
    if order == 5:
        c0, c1, c2 = vals
        curv = (13.0 / 12.0) * (c0 - 2 * c1 + c2) ** 2
        if m == 0:   # cells (i-1, i, i+1): face left of stencil center
            return curv + 0.25 * (3 * c0 - 4 * c1 + c2) ** 2
        if m == 1:   # centered
            return curv + 0.25 * (c0 - c2) ** 2
        return curv + 0.25 * (c0 - 4 * c1 + 3 * c2) ** 2
    if order == 7:
        # Balsara & Shu (2000) beta_0 written for the most-upwind substencil
        # (cells descending away from the face). Reflection symmetry: the
        # m-th substencil equals the (3-m)-th mirrored, so reverse for m<2.
        v = vals if m >= 2 else tuple(reversed(vals))
        v0, v1, v2, v3 = v
        return (v0 * (547.0 * v0 - 3882.0 * v1 + 4642.0 * v2 - 1854.0 * v3)
                + v1 * (7043.0 * v1 - 17246.0 * v2 + 7042.0 * v3)
                + v2 * (11003.0 * v2 - 9402.0 * v3)
                + 2107.0 * v3 * v3)
    raise ValueError(f"unsupported WENO order {order}")


def _weno_core(get_val, get_wet, order, weights):
    """One WENO reconstruction from offset accessors.

    ``get_val(o)`` / ``get_wet(o)`` return the (already side-selected)
    substencil value at left-biased offset ``o``. Shared by the XLA path
    below and the Pallas kernel (`pallas_weno.py`), so both use the same
    tables and operation order by construction.

    Near-boundary ORDER REDUCTION (the reference's
    ``minimum_buffer_upwind_order=3``, `omip_simulation.jl:600`): at faces
    whose full order-5/7 stencil touches ANY dry cell, the reconstruction
    drops to order 3 (whose compact substencils select cleanly around a
    single wall). High order across sharp anomalies pinned against
    coastlines net-amplifies them — measured in the round-4 year run as a
    1-cell shelf strip cooling 0.6 K/day under WENO(7) while WENO(3) at
    the same state RELAXES it (+1.25 K/day); open-ocean faces keep the
    full order."""
    res = _weno_fixed_order(get_val, get_wet, order, weights)
    if get_wet is not None and order > 3:
        K = (order + 1) // 2
        all_wet = 1.0
        for o in range(-K, K - 1):       # the full left-biased stencil span
            all_wet = all_wet * get_wet(o)
        low = _weno_fixed_order(get_val, get_wet, 3, weights)
        res = jnp.where(all_wet > 0, res, low)
    return res


def _weno_fixed_order(get_val, get_wet, order, weights):
    tbl = _LEFT[order]
    K = (order + 1) // 2
    if get_wet is not None:
        # DRY-VALUE SUBSTITUTION: a dry cell's masked value (≈0) must
        # never enter a reconstruction. The β penalty alone deprioritizes
        # contaminated substencils, but at faces where EVERY substencil
        # touches dry cells (within (order−1)/2 of a boundary) the
        # penalties cancel in the relative weights and the scheme blends
        # zeros with ~ideal weights — phantom-0 water in the flux, which
        # rectifies under oscillating velocity into a steady tracer pump
        # at column bottoms/coasts (the round-4 year validation's slow
        # leak, ~+0.2 PSU/day at 1° WENO(7) bottom cells). Substituting
        # the upwind-adjacent value (offset −1, in every substencil)
        # degrades those faces gracefully toward first-order upwind — the
        # reference's minimum_buffer_upwind_order near-boundary behavior.
        raw_val = get_val
        v_adj = raw_val(-1)
        _sub_cache = {}

        def get_val(o):
            if o not in _sub_cache:
                _sub_cache[o] = v_adj if o == -1 else \
                    jnp.where(get_wet(o) > 0, raw_val(o), v_adj)
            return _sub_cache[o]

    recon, betas = [], []
    for m in range(K):
        offs, coeffs = tbl[m]
        vals = [get_val(o) for o in offs]
        recon.append(sum(c * v for c, v in zip(coeffs, vals)))
        b = _beta(order, m, vals)
        if get_wet is not None:
            pen = sum(1.0 - get_wet(o) for o in offs)
            b = b + _PENALTY * pen
        betas.append(b)

    ideal = tbl["ideal"]
    if weights == "normal_division":
        alphas = [d / (b + _EPS) ** 2 for d, b in zip(ideal, betas)]
    else:
        tau = jnp.abs(betas[0] - betas[-1])
        alphas = [d * (1.0 + (tau / (b + _EPS)) ** 2)
                  for d, b in zip(ideal, betas)]
    total = sum(alphas)
    return sum(al * r for al, r in zip(alphas, recon)) / total


def weno_biased(a, axis, order=5, side="left", wet=None, boundary="wrap",
                weights="zweno"):
    """Biased WENO reconstruction of cell field ``a`` at faces.

    side="left": upwind for positive velocity; side="right" is the mirror.
    ``wet``: optional wet-cell mask (same shape); dry-contaminated
    substencils are penalized out of the nonlinear weights.
    ``boundary``: "wrap" (halo-carrying horizontal axes) or "clamp"
    (zero-gradient extrapolation — the halo-less vertical axis).
    ``weights``: nonlinear-weight computation — "zweno" (Borges et al.
    2008 Z-weights, the default) or "normal_division" (classic
    Jiang–Shu α = d/(β+ε)² — the reference's
    ``weight_computation=NormalDivision`` operating point for the
    orca/halfdegree/tenthdegree momentum and OMIP tracer schemes,
    `omip_simulation.jl:562-564,600`).
    """
    mirror = side == "right"
    shift = shift_n if boundary == "wrap" else shift_clamp

    def at(off):
        return (-1 - off) if mirror else off

    get_val = lambda o: shift(a, axis, at(o))
    get_wet = None if wet is None else (lambda o: shift(wet, axis, at(o)))
    return _weno_core(get_val, get_wet, order, weights)


def weno_upwind(a, velocity_sign, axis, order=5, wet=None, boundary="wrap",
                weights="zweno"):
    """Upwind WENO value at faces: left-biased where sign >= 0, else right.

    Implemented by upwind-selecting the stencil INPUTS (per-lane) and
    running ONE reconstruction — mathematically identical to reconstructing
    both sides and `where`-selecting the results (the reconstruction is a
    deterministic per-lane function of its inputs, applied with the same
    coefficient order on both sides; compiled values can differ by FMA
    contraction roundoff), at a bit more than half the flops.
    The WENO arithmetic dominates the advection pass on the VPU
    (measured compute-bound at 1/4°), so this is ~2x on the hot op.
    """
    up = velocity_sign >= 0
    shift = shift_n if boundary == "wrap" else shift_clamp

    val_cache, wet_cache = {}, {}

    def get_val(o):
        if o not in val_cache:
            val_cache[o] = jnp.where(up, shift(a, axis, o),
                                     shift(a, axis, -1 - o))
        return val_cache[o]

    def get_wet(o):
        if o not in wet_cache:
            wet_cache[o] = jnp.where(up, shift(wet, axis, o),
                                     shift(wet, axis, -1 - o))
        return wet_cache[o]

    return _weno_core(get_val, None if wet is None else get_wet,
                      order, weights)


def centered_face(a, axis):
    """2nd-order centered value at faces (face i between cells i-1, i)."""
    return 0.5 * (a + shift_n(a, axis, -1))


def required_halo(order: int) -> int:
    return (order + 1) // 2 + 1
