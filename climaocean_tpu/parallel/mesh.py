"""2-D horizontal domain decomposition over a TPU device mesh.

TPU-native replacement for the reference's only distributed strategy —
`Distributed(GPU(), partition=Partition(Rx, Ry))` MPI domain decomposition
with halo exchange (reference: `sixth_degree_tripolar_ocean_sea_ice.jl:22`,
SURVEY.md §2d item 1).

Round-1 design ("annotate shardings, let XLA insert collectives"): every
field and 2-D metric array is sharded ``P(None, 'y', 'x')`` over a
``Mesh(devices, ('y', 'x'))``; the model step is `jit`-compiled over the
sharded arrays and the SPMD partitioner turns the stencil shifts
(`jnp.roll`) and halo copies into `collective-permute`s riding ICI. This is
the scaling-book recipe — a `shard_map` + explicit wide-halo exchange
variant is the planned optimization for the substep loop (SURVEY.md §7
hard part (a)).

Vertical (z) stays unsharded: columns are the unit of closure physics and
implicit solves.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def is_coordinator() -> bool:
    """True on the rank-0 host — the TPU analogue of the reference's
    `@root` SPMD discipline (jra55_data_staging.jl:2-5): filesystem
    mutations (checkpoints, diagnostics, staging) happen on exactly one
    process in a multi-host run."""
    return jax.process_index() == 0


def fetch_global(x):
    """Device→host fetch that is safe at pod scale.

    Single-host (including single-chip and faked CPU meshes): plain
    `np.asarray`. Multi-host (`jax.process_count() > 1`), where a sharded
    `jax.Array` is not fully addressable and `np.asarray` raises: gather
    the global value with an all-gather so every process (in practice the
    `is_coordinator()` one, which is the only one that writes) sees the
    full array. Writers and checkpointing route every device read through
    this, keeping the reference's rank-0 output discipline
    (`jra55_data_staging.jl:2-5`) correct on multi-host TPU slices."""
    if not hasattr(x, "ndim"):
        return x
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def make_mesh(shape=None, devices=None) -> Mesh:
    """Create a ('y', 'x') mesh. ``shape=(Ry, Rx)`` like the reference's
    `Partition(Rx, Ry)`; defaults to a near-square factorization of all
    devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        ry = int(np.floor(np.sqrt(n)))
        while n % ry:
            ry -= 1
        shape = (ry, n // ry)
    dev = np.asarray(devices).reshape(shape)
    return Mesh(dev, ("y", "x"))


def field_spec(ndim: int) -> P:
    """PartitionSpec for a field: last two dims are (y, x)."""
    if ndim == 2:
        return P("y", "x")
    return P(*([None] * (ndim - 2)), "y", "x")


def shard_tree(tree, mesh: Mesh):
    """Device_put every array leaf with its horizontal sharding (arrays with
    fewer than 2 dims are replicated)."""
    def put(a):
        if not hasattr(a, "ndim"):
            return a
        if a.ndim >= 2:
            spec = field_spec(a.ndim)
        else:
            spec = P()
        return jax.device_put(a, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def shard_grid(grid, mesh: Mesh):
    """Shard a Grid's metric/mask arrays over the mesh (1-D vertical arrays
    replicate)."""
    return shard_tree(grid, mesh)


def fetch_global_tree(tree):
    """One device→host gather for a whole pytree of outputs (VERDICT r3
    weak 7 / item 8: the writers must pay ONE transfer per fire boundary,
    not one per field). Single-host: a single `jax.device_get` batches all
    leaf transfers in one call. Multi-host with non-addressable shards: a
    single `process_allgather` over the tree."""
    leaves = jax.tree_util.tree_leaves(tree)
    if all(getattr(x, "is_fully_addressable", True) for x in leaves):
        got = jax.device_get(tree)
        return jax.tree_util.tree_map(np.asarray, got)
    from jax.experimental import multihost_utils
    return jax.tree_util.tree_map(
        np.asarray, multihost_utils.process_allgather(tree, tiled=True))
