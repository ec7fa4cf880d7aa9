"""Composable field operations: algebra + reductions over grid metrics.

TPU-native analogue of Oceananigans' `AbstractOperations` surface as used
by the reference (`omip_diagnostics.jl:121-123,197-207`, `common.jl:748-760`):
`Field` algebra (`tos*tos`, `u^2+v^2`), `Average(op; dims)`,
`Integral(op; condition)`, and `KernelFunctionOperation`. Instead of a
lazy operation tree over device `Field`s, an operation here is a pure
function ``(grid, state) -> array`` tagged with its staggered location —
composition happens in Python, evaluation is one fused XLA graph when the
caller jits `compute` (writers do). No kernels are hand-scheduled; XLA
fuses the algebra into the reduction.

Locations are strings over {c,f} per axis, x-y-z order ("ccc" = tracer
point, "fcc" = u, "cfc" = v, "ccf" = w) or 2-char for surface fields
("cc"). Reductions weight by the exact finite-volume metrics at that
location and mask by the matching wet mask, so `Average(T)` is the true
ocean-volume mean and `Integral(vvol, condition=basin)` is the basin
transport — the two uses the reference's diagnostics lean on.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp


@dataclass(frozen=True)
class FieldOperation:
    """A location-tagged ``(grid, state) -> array`` computation."""

    fn: Callable
    location: str = "ccc"

    # ---------------------------------------------------------------- algebra
    def _binary(self, other, op):
        if isinstance(other, FieldOperation):
            if (other.location != self.location
                    and len(other.location) == len(self.location)):
                raise ValueError(
                    f"location mismatch: {self.location} vs {other.location} "
                    "(interpolate explicitly, like the reference's ℑ operators)")
            return FieldOperation(
                lambda g, s: op(self.fn(g, s), other.fn(g, s)), self.location)
        return FieldOperation(lambda g, s: op(self.fn(g, s), other),
                              self.location)

    def __add__(self, other):
        return self._binary(other, jnp.add)

    __radd__ = __add__

    def __sub__(self, other):
        return self._binary(other, jnp.subtract)

    def __rsub__(self, other):
        return FieldOperation(lambda g, s: other - self.fn(g, s), self.location)

    def __mul__(self, other):
        return self._binary(other, jnp.multiply)

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self._binary(other, jnp.divide)

    def __pow__(self, p):
        return FieldOperation(lambda g, s: self.fn(g, s) ** p, self.location)

    def __neg__(self):
        return FieldOperation(lambda g, s: -self.fn(g, s), self.location)

    def apply(self, f):
        """Pointwise-map by an arbitrary function (e.g. `jnp.sqrt`)."""
        return FieldOperation(lambda g, s: f(self.fn(g, s)), self.location)

    def __call__(self, grid, state):
        return self.fn(grid, state)


def compute(op, grid, state):
    """Evaluate an operation (or a plain array, passed through)."""
    return op(grid, state) if isinstance(op, FieldOperation) else op


# ------------------------------------------------------------------ builders

def prognostic(name, location="ccc", component="ocean"):
    """Operation reading a prognostic/diagnostic array from the state
    pytree (coupled states nest the ocean under ``state['ocean']``)."""

    def fn(grid, state):
        holder = state.get(component, state) if isinstance(state, dict) else state
        return holder[name] if name in holder else state[name]

    return FieldOperation(fn, location)


def KernelFunctionOperation(fn, location="ccc"):
    """Arbitrary ``(grid, state) -> array`` as an operation (reference
    `KernelFunctionOperation` — fused diagnostics like `ke_at_ccc`,
    `omip_diagnostics.jl:10-25,163-167`)."""
    return FieldOperation(fn, location)


def at_surface(op):
    """Restrict a 3-D operation to the top model level (k = Nz)."""
    loc = op.location[:2]
    return FieldOperation(lambda g, s: op.fn(g, s)[-1], loc)


# ----------------------------------------------------------------- reductions

def _wet_mask(grid, location):
    if len(location) == 2:
        return grid.wet_c[-1]
    return {"fcc": grid.wet_u, "cfc": grid.wet_v,
            "ccf": grid.wet_w}.get(location, grid.wet_c)


def _area(grid, location):
    lx, ly = location[0], location[1]
    return {("c", "c"): grid.az_cc, ("f", "c"): grid.az_fc,
            ("c", "f"): grid.az_cf, ("f", "f"): grid.az_ff}[(lx, ly)]


def _dz(grid, location):
    dz = grid.dz_f if location[2:] == "f" else grid.dz_c
    return dz[:, None, None]


def _weights(grid, location):
    """Finite-volume weight (volume, or area for surface fields) at the
    operation's location, zeroed on dry cells and outside the interior
    (so halo cells never count — including the tripolar fold's duplicated
    top row, which lives in the halo by construction)."""
    w = _area(grid, location) * _wet_mask(grid, location)
    if len(location) == 3:
        w = w * _dz(grid, location)
    H = grid.H
    interior = jnp.zeros(w.shape[-2:], w.dtype).at[
        H:H + grid.Ny, H:H + grid.Nx].set(1.0)
    return w * interior


def _axes(location, dims):
    order = "zyx" if len(location) == 3 else "yx"
    ax = {"z": -3, "y": -2, "x": -1}
    return tuple(ax[d] for d in dims if d in order)


def Integral(op, dims=("x", "y", "z"), condition=None):
    """Metric-weighted sum over ``dims`` (reference `Integral(f; condition)`
    — e.g. ice extent/volume, basin transports). ``condition``: broadcastable
    mask array or an operation."""

    def fn(grid, state):
        a = op.fn(grid, state)
        w = _weights(grid, op.location)
        if condition is not None:
            w = w * compute(condition, grid, state)
        return jnp.sum(a * w, axis=_axes(op.location, dims))

    return FieldOperation(fn, op.location)


def Average(op, dims=("x", "y", "z"), condition=None):
    """Metric-weighted mean over ``dims`` (reference `Average(op; dims)` —
    e.g. `zosga`, horizontally-averaged profiles)."""

    def fn(grid, state):
        a = op.fn(grid, state)
        w = _weights(grid, op.location)
        if condition is not None:
            w = w * compute(condition, grid, state)
        w = jnp.broadcast_to(w, jnp.broadcast_shapes(a.shape, w.shape))
        axes = _axes(op.location, dims)
        return jnp.sum(a * w, axis=axes) / jnp.maximum(
            jnp.sum(w, axis=axes), 1e-30)

    return FieldOperation(fn, op.location)


# ------------------------------------------------------- common diagnostics

def velocities():
    """(u, v) prognostic operations at their native staggered locations."""
    return prognostic("u", "fcc"), prognostic("v", "cfc")


def kinetic_energy():
    """KE at tracer points: ½(ℑx(u²) + ℑy(v²)) — the reference's fused
    `ke_at_ccc` (`omip_diagnostics.jl:19-25`)."""

    def fn(grid, state):
        from .halo import fill_halos

        o = state.get("ocean", state)
        # the ℑ rolls read one halo cell: refill first (the state's halos
        # are scratch — stale after a step, zero after an unpartition)
        u = fill_halos(o["u"], grid, "u", vector=True) * grid.wet_u
        v = fill_halos(o["v"], grid, "v", vector=True) * grid.wet_v
        u2, v2 = u ** 2, v ** 2
        u2c = 0.5 * (u2 + jnp.roll(u2, -1, axis=-1))
        v2c = 0.5 * (v2 + jnp.roll(v2, -1, axis=-2))
        return 0.5 * (u2c + v2c) * grid.wet_c

    return FieldOperation(fn, "ccc")
