"""Small compatibility shims across jax versions."""

from __future__ import annotations


def shard_map(f, mesh, in_specs, out_specs):
    """`shard_map` with replication checking off, across the jax.shard_map
    (check_vma) / jax.experimental.shard_map (check_rep) API split."""
    try:
        from jax import shard_map as _sm
        try:
            return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                       check_vma=False)
        except TypeError:
            return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)
