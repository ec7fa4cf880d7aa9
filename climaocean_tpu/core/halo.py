"""Horizontal halo filling (single-device path).

TPU-native replacement for Oceananigans' ``fill_halo_regions!``
(reference call sites: SURVEY.md §2b "Boundary conditions" row). Periodic
directions copy the opposite interior edge; bounded directions replicate the
edge value (zero-gradient), while no-normal-flow / no-flux walls are enforced
by the grid's wet masks (dry halo cells), keeping every stencil branchless.

Under `shard_map` the same function is swapped for the `parallel.halo`
ppermute-based exchange; the numerics modules only ever call through the
model's configured ``fill_halos``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..grids.grid import Grid


def fill_halos(a: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """Fill horizontal halos of a padded field of any z extent (or 2-D)."""
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
    """Fill halos of every array leaf in a pytree (dict/NamedTuple of fields)."""
    import jax
    return jax.tree_util.tree_map(lambda a: fill_halos(a, grid), fields)
