"""Horizontal halo filling (single-device path).

TPU-native replacement for Oceananigans' ``fill_halo_regions!``
(reference call sites: SURVEY.md §2b "Boundary conditions" row). Periodic
directions copy the opposite interior edge; bounded directions replicate
the edge value (zero-gradient); tripolar grids apply the northern fold
exchange (mirrored columns, sign-flipped velocities) — while no-normal-flow
walls stay enforced by the grid's wet masks.

Under `shard_map`/SPMD these same `.at[].set` copies lower to
collective-permutes over ICI; the numerics only ever call `fill_halos`.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp

from ..grids.grid import Grid

# Overridable halo implementation: the shard_map path installs a
# ppermute-based exchange here for the duration of its (synchronous) trace.
_halo_override = contextvars.ContextVar("halo_override", default=None)


@contextlib.contextmanager
def halo_override(fn):
    token = _halo_override.set(fn)
    try:
        yield
    finally:
        _halo_override.reset(token)


def fill_halos(a: jnp.ndarray, grid: Grid, location: str = "c",
               vector: bool = False) -> jnp.ndarray:
    """Fill horizontal halos of a padded field of any z extent (or 2-D).

    ``location``: "c" (centers), "u" (x-faces), "v" (y-faces) — matters
    only for folded (tripolar) grids. ``vector=True`` flips the sign across
    the fold.
    """
    override = _halo_override.get()
    if override is not None:
        return override(a, grid, location, vector)
    if grid.kind.startswith("tripolar"):
        from ..grids.tripolar import fill_halos_tripolar
        return fill_halos_tripolar(a, grid, location,
                                   -1.0 if vector else 1.0)

    H, Nx, Ny = grid.H, grid.Nx, grid.Ny
    if grid.periodic_x:
        a = a.at[..., :H].set(a[..., Nx:Nx + H])
        a = a.at[..., H + Nx:].set(a[..., H:2 * H])
    else:
        a = a.at[..., :H].set(a[..., H:H + 1])
        a = a.at[..., H + Nx:].set(a[..., H + Nx - 1:H + Nx])
    if grid.periodic_y:
        a = a.at[..., :H, :].set(a[..., Ny:Ny + H, :])
        a = a.at[..., H + Ny:, :].set(a[..., H:2 * H, :])
    else:
        a = a.at[..., :H, :].set(a[..., H:H + 1, :])
        a = a.at[..., H + Ny:, :].set(a[..., H + Ny - 1:H + Ny, :])
    return a


def fill_halos_tree(fields, grid: Grid):
    """Fill halos of every array leaf in a pytree of center fields."""
    import jax
    return jax.tree_util.tree_map(lambda a: fill_halos(a, grid), fields)


# Overridable global reduction: plain jnp.sum on one device; the shard_map
# path installs local-sum + psum over the mesh axes so in-step global
# means (e.g. salinity normalization) stay correct when distributed.
_sum_override = contextvars.ContextVar("sum_override", default=None)


@contextlib.contextmanager
def sum_override(fn):
    token = _sum_override.set(fn)
    try:
        yield
    finally:
        _sum_override.reset(token)


def global_sum(a):
    override = _sum_override.get()
    if override is not None:
        return override(a)
    return jnp.sum(a)
