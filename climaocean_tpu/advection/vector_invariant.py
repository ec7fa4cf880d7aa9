"""Vector-invariant momentum advection + Coriolis on the curvilinear C-grid.

TPU-native replacement for Oceananigans' `VectorInvariant` /
`WENOVectorInvariant(order)` momentum advection and
`HydrostaticSphericalCoriolis(scheme=EnstrophyConserving())`
(reference call sites: `latitude_longitude.jl:18`,
`one_degree_tripolar.jl` WENOVectorInvariant(5), `omip_simulation.jl:588`).

Formulation (hydrostatic vector-invariant form):

    ∂u/∂t ⊇ + q̄ʸ · V̄ˣʸ / Δx_fc − δx_f(K)/Δx_fc − (w ∂z u)
    ∂v/∂t ⊇ − q̄ˣ · Ūˣʸ / Δy_cf − δy_f(K)/Δy_cf − (w ∂z v)

with absolute vorticity q = (ζ + f) at corners (f,f),
ζ = [δx_f(Δy_cf v) − δy_f(Δx_fc u)] / Az_ff, transports U = Δy_fc u,
V = Δx_cf v, and kinetic energy K = (ℑx_c u² + ℑy_c v²)/2.

Averaging q first and multiplying by the averaged transport is Sadourny's
(1975) enstrophy-conserving scheme — the reference default. The
`WENOVectorInvariant` option replaces the centered q̄ average with a WENO
upwind reconstruction of q in the direction transverse to each velocity,
upwinded on the sign of the advecting transport (Oceananigans' scheme).

All terms are masked branchlessly by the face wet masks.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.stencil import (X, Y, Z, dxf, dyf, mxc, mxf, myc, myf,
                            shift_clamp, xp1, yp1)
from .weno import weno_upwind

OMEGA_EARTH = 7.292115e-5  # rad/s


def coriolis_ff(grid, rotation_rate=OMEGA_EARTH):
    """Planetary vorticity f = 2Ω sin(φ) at corners (f,f)."""
    return 2.0 * rotation_rate * jnp.sin(jnp.deg2rad(grid.lat_ff))


def vorticity_ff(u, v, grid):
    """Relative vorticity ζ at (f,f,c)."""
    circ = dxf(grid.dy_cf * v) - dyf(grid.dx_fc * u)
    return circ / grid.az_ff


def kinetic_energy_cc(u, v):
    return 0.5 * (mxc(u * u) + myc(v * v))


def vertical_momentum_advection(u, v, w, grid, dzc3=None):
    """Advective-form −w ∂z(u), −w ∂z(v) at their native points.

    w is interpolated horizontally to the velocity point and vertically to
    centers; ∂z uses the face-located difference. Near top/bottom the
    clamped shift gives one-sided (zero-gradient) behavior; masks kill dry
    contributions.
    """
    dz_f = grid.dz_f[:, None, None]

    # u: w at (f,c,f) = ℑx_f(w); δz_f u at faces; average product to centers.
    w_u = mxf(w)                                  # (Nz+1, ...)
    dudz = (u - shift_clamp(u, Z, -1)) / dz_f[:-1]        # at faces 0..Nz-1
    dudz = jnp.concatenate([dudz, jnp.zeros_like(dudz[:1])], axis=0)
    adv_u = 0.5 * (w_u[:-1] * dudz[:-1] + w_u[1:] * dudz[1:])

    w_v = myf(w)
    dvdz = (v - shift_clamp(v, Z, -1)) / dz_f[:-1]
    dvdz = jnp.concatenate([dvdz, jnp.zeros_like(dvdz[:1])], axis=0)
    adv_v = 0.5 * (w_v[:-1] * dvdz[:-1] + w_v[1:] * dvdz[1:])

    return -adv_u * grid.wet_u, -adv_v * grid.wet_v


def momentum_tendencies(u, v, w, grid, f_ff=None, scheme="vector_invariant",
                        vorticity_order=5, dzc3=None, weights="zweno"):
    """Return (G_u, G_v) from vorticity + KE-gradient + vertical advection +
    Coriolis (folded into absolute vorticity).

    scheme: "vector_invariant" (centered enstrophy-conserving) or
    "weno_vector_invariant" (WENO-upwinded vorticity flux).
    """
    if f_ff is None:
        f_ff = coriolis_ff(grid)

    # Free-slip immersed corners: relative vorticity is zeroed at any corner
    # touching land — boundary corners otherwise divide a finite masked
    # circulation by a (possibly tiny, e.g. near tripolar poles) corner
    # area and seed a nonlinear instability. Planetary vorticity stays.
    zeta = vorticity_ff(u, v, grid) * _corner_wet(grid)
    q = zeta + f_ff

    V = grid.dx_cf * v * grid.wet_v            # y-transport at (c,f)
    U = grid.dy_fc * u * grid.wet_u            # x-transport at (f,c)
    V_fc = mxf(myc(V))                         # to (f,c)
    U_cf = myf(mxc(U))                         # to (c,f)

    if scheme == "weno_vector_invariant":
        # WENO-upwind the corner vorticity to the velocity point along the
        # transverse axis, upwinded on the advecting transport's sign
        # (Oceananigans' WENOVectorInvariant). q lives on y-faces w.r.t. the
        # u-point: shifting q by +1 turns "reconstruct at center j from face
        # data" into the standard "reconstruct at face j from cell data".
        q_u = weno_upwind(yp1(q), V_fc, Y, vorticity_order, weights=weights)
        q_v = weno_upwind(xp1(q), U_cf, X, vorticity_order, weights=weights)
    else:
        q_u = myc(q)                           # (f,f) -> (f,c)
        q_v = mxc(q)                           # (f,f) -> (c,f)

    tend_u = q_u * V_fc / grid.dx_fc
    tend_v = -q_v * U_cf / grid.dy_cf

    K = kinetic_energy_cc(u, v)
    tend_u = tend_u - dxf(K) / grid.dx_fc
    tend_v = tend_v - dyf(K) / grid.dy_cf

    adv_u, adv_v = vertical_momentum_advection(u, v, w, grid, dzc3)
    return (tend_u * grid.wet_u + adv_u,
            tend_v * grid.wet_v + adv_v)


def _corner_wet(grid):
    """Strict corner wet mask at (f,f): 1 only where all four surrounding
    center cells are wet (interior corners). Boundary corners carry zero
    relative vorticity — the free-slip immersed-boundary convention."""
    from ..core.stencil import xm1, ym1
    w = grid.wet_c
    return w * xm1(w) * ym1(w) * xm1(ym1(w))
