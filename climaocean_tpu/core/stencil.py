"""Staggered C-grid shift/difference/interpolation vocabulary.

TPU-native replacement for the Oceananigans finite-volume operator vocabulary
(reference: the `ℑx/ℑy/ℑz`, `δx/δy/δz` operators imported at
`/root/reference/src/OMIPConfigurations/KPP/KPP.jl:19-21` and used throughout).

Design
------
* Field layout is ``(..., z, y, x)`` — z leading so per-column physics is a
  `lax.scan` over axis -3 with full (y, x) planes vectorized on the VPU, and
  x innermost so the 128-lane dimension is the longest horizontal dimension.
* All fields at every staggering share one padded shape
  ``(Nz, Ny + 2H, Nx + 2H)``; horizontal halos of width ``H`` are refilled
  once per right-hand-side evaluation (`core.halo`). There is no vertical
  halo: vertical stencils handle the top/bottom boundary explicitly.
* Shifts are implemented with `jnp.roll`, which keeps shapes static (XLA
  requirement) and compiles to cheap lane/sublane rotations. Wrap-around
  garbage only ever lands in halo cells (stencil width <= H), which are
  rewritten by the next halo fill and masked by the immersed-boundary masks.

Index convention (Oceananigans': face ``i`` is on the *low* side of center
``i``):

* ``u[k, j, i]`` lives at ``x_face[i]``, between centers ``i-1`` and ``i``.
* ``v[k, j, i]`` lives at ``y_face[j]``.
* ``w[k, j, i]`` lives at ``z_face[k]`` — the *bottom* face of cell ``k``
  (k increases upward, k = Nz-1 is the surface cell).

Therefore:

* center→face difference  (∂ of a center field at faces):  ``δf(a)[i] = a[i] - a[i-1]``
* face→center difference  (divergence of a face flux):     ``δc(u)[i] = u[i+1] - u[i]``
* center→face interpolation: ``mf(a)[i] = (a[i] + a[i-1]) / 2``
* face→center interpolation: ``mc(u)[i] = (u[i] + u[i+1]) / 2``
"""

from __future__ import annotations

import jax.numpy as jnp

X, Y, Z = -1, -2, -3  # axis aliases for the (z, y, x) layout


def shift_p(a, axis):
    """``shift_p(a)[i] == a[i+1]`` (wraps; halo-safe by construction)."""
    return jnp.roll(a, -1, axis=axis)


def shift_m(a, axis):
    """``shift_m(a)[i] == a[i-1]``."""
    return jnp.roll(a, 1, axis=axis)


def shift_n(a, axis, n):
    """``shift_n(a)[i] == a[i+n]`` for integer n of either sign."""
    return jnp.roll(a, -n, axis=axis)


def shift_clamp(a, axis, n):
    """``a[i+n]`` with edge clamping (zero-gradient extrapolation) instead of
    wrap-around — used on the vertical axis, which carries no halo."""
    if n == 0:
        return a
    ax = axis % a.ndim
    L = a.shape[ax]
    idx = jnp.clip(jnp.arange(L) + n, 0, L - 1)
    return jnp.take(a, idx, axis=ax)


# -- x-direction -------------------------------------------------------------

def xp1(a, n=1):
    return jnp.roll(a, -n, axis=X)


def xm1(a, n=1):
    return jnp.roll(a, n, axis=X)


def dxf(a):
    """center→face x-difference: result[i] = a[i] - a[i-1]."""
    return a - xm1(a)


def dxc(a):
    """face→center x-difference: result[i] = a[i+1] - a[i]."""
    return xp1(a) - a


def mxf(a):
    """center→face x-interpolation (2-point mean)."""
    return 0.5 * (a + xm1(a))


def mxc(a):
    """face→center x-interpolation."""
    return 0.5 * (a + xp1(a))


# -- y-direction -------------------------------------------------------------

def yp1(a, n=1):
    return jnp.roll(a, -n, axis=Y)


def ym1(a, n=1):
    return jnp.roll(a, n, axis=Y)


def dyf(a):
    return a - ym1(a)


def dyc(a):
    return yp1(a) - a


def myf(a):
    return 0.5 * (a + ym1(a))


def myc(a):
    return 0.5 * (a + yp1(a))


# -- z-direction -------------------------------------------------------------
# No halo in z: rolled-in values at the top/bottom rows are garbage and MUST
# be corrected by the caller (boundary masks / one-sided forms). Helpers that
# need a boundary-safe default take `fill`.

def zp1(a, n=1):
    return jnp.roll(a, -n, axis=Z)


def zm1(a, n=1):
    return jnp.roll(a, n, axis=Z)


def dzf(a):
    """center→face z-difference: result[k] = a[k] - a[k-1] (face k below center k)."""
    return a - zm1(a)


def dzc(a):
    """face→center z-difference: result[k] = a[k+1] - a[k]."""
    return zp1(a) - a


def mzf(a):
    return 0.5 * (a + zm1(a))


def mzc(a):
    return 0.5 * (a + zp1(a))


# -- compound interpolations -------------------------------------------------

def mxyf(a):
    """(c,c)→(f,f) 4-point corner mean."""
    return 0.25 * (a + xm1(a) + ym1(a) + xm1(ym1(a)))


def mxyc(a):
    """(f,f)→(c,c) 4-point mean."""
    return 0.25 * (a + xp1(a) + yp1(a) + xp1(yp1(a)))


def mxf_yc(a):
    """(c,f)→(f,c): x center→face, y face→center."""
    return myc(mxf(a))


def mxc_yf(a):
    """(f,c)→(c,f): x face→center, y center→face."""
    return mxc(myf(a))
