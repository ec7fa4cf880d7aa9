"""Checkpoint-restart determinism (the reference's STATE_HASH probe:
`omip_simulation.jl:674-683` — two pickup-from-same-checkpoint runs must
produce identical state; SURVEY.md §4 "Determinism testing")."""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np


def state_hash(state):
    leaves = jax.tree_util.tree_leaves(state)
    h = hashlib.sha256()
    for l in leaves:
        h.update(np.asarray(l).tobytes())
    return h.hexdigest()


def test_pickup_bitwise_equivalence(tmp_path):
    import climaocean_tpu as co
    from climaocean_tpu.simulation.checkpoint import (read_checkpoint,
                                                      write_checkpoint)

    model, state = co.latitude_longitude_ocean(resolution=15.0, Nz=5,
                                               depth=3000.0,
                                               free_surface_substeps=8)
    grid = model.grid
    step = co.make_step_fn(model)
    tau = 1e-4 * np.cos(np.deg2rad(np.asarray(grid.lat_cc))).astype(np.float32)
    fluxes = co.SurfaceFluxes.zeros(grid)._replace(tau_x=jnp.asarray(tau))

    # run 2 steps, checkpoint, run 2 more
    s = state
    for _ in range(2):
        s = step(s, fluxes, 1800.0)
    write_checkpoint(str(tmp_path), s, 2, 3600.0)
    s_a = s
    for _ in range(2):
        s_a = step(s_a, fluxes, 1800.0)
    hash_a = state_hash(s_a)

    # restart from the checkpoint and repeat — must match bitwise
    s_b, it, t = read_checkpoint(str(tmp_path) + "/checkpoint_iter2.npz")
    assert it == 2
    for _ in range(2):
        s_b = step(s_b, fluxes, 1800.0)
    hash_b = state_hash(s_b)
    assert hash_a == hash_b, "pickup run diverged from the uninterrupted run"
