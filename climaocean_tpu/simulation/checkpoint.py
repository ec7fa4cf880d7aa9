"""Checkpoint / resume.

TPU-native mirror of Oceananigans' `Checkpointer` + coupled-model
`prognostic_state`/`restore_prognostic_state!` (reference:
`omip_diagnostics.jl:221-225` — JLD2 snapshots every `checkpoint_interval`,
`cleanup=false`; `run!(sim; pickup=:latest)` newest-checkpoint discovery,
`launch.sh:152-153`; SURVEY.md §5 "Checkpoint/resume": full prognostic
state — ocean u,v,T,S,e,η; ice h,ℵ,u,v,Ts; clock — serialized and
resumable mid-run).

Format: one ``.npz`` per snapshot (``checkpoint_iter<N>.npz``) holding the
flattened state pytree + clock, written atomically (tmp + rename, the
reference's `atomic_replace!` discipline from `jra55_data_staging.jl:55-61`).
"""

from __future__ import annotations

import os
import re
import tempfile

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        from ..parallel.mesh import fetch_global
        out[prefix[:-1]] = fetch_global(tree)
    return out


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def write_checkpoint(dir, state, iteration, time, prefix="checkpoint"):
    from ..parallel.mesh import is_coordinator
    if not is_coordinator():        # reference `@root` discipline: one
        return None                 # writer per multi-host job
    os.makedirs(dir, exist_ok=True)
    flat = _flatten(state)
    flat["__clock__"] = np.array([iteration, time], dtype=np.float64)
    path = os.path.join(dir, f"{prefix}_iter{iteration}.npz")
    fd, tmp = tempfile.mkstemp(dir=dir, suffix=".tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **flat)
        os.replace(tmp, path)           # atomic rename(2)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def latest_checkpoint(dir, prefix="checkpoint"):
    """`pickup=:latest` file discovery."""
    if not os.path.isdir(dir):
        return None
    best, best_iter = None, -1
    pat = re.compile(rf"{re.escape(prefix)}_iter(\d+)\.npz$")
    for f in os.listdir(dir):
        m = pat.match(f)
        if m and int(m.group(1)) > best_iter:
            best_iter = int(m.group(1))
            best = os.path.join(dir, f)
    return best


def read_checkpoint(path, to_device=True):
    """Returns (state, iteration, time)."""
    import jax.numpy as jnp

    with np.load(path) as f:
        flat = {k: f[k] for k in f.files}
    clock = flat.pop("__clock__")
    state = _unflatten(flat)
    if to_device:
        import jax
        state = jax.tree_util.tree_map(jnp.asarray, state)
    return state, int(clock[0]), float(clock[1])


class Checkpointer:
    """Output-writer-style wrapper: write on schedule; `cleanup=True`
    removes older snapshots (reference default keeps all,
    `cleanup=false`)."""

    def __init__(self, dir, schedule, prefix="checkpoint", cleanup=False,
                 verbose=False):
        self.dir = dir
        self.schedule = schedule
        self.prefix = prefix
        self.cleanup = cleanup
        self.verbose = verbose

    def maybe_write(self, sim):
        if not self.schedule.fires(sim):
            return
        path = write_checkpoint(self.dir, sim.state, sim.iteration, sim.time,
                                self.prefix)
        if self.verbose:
            print(f"[checkpointer] wrote {path}", flush=True)
        if self.cleanup:
            keep = os.path.basename(path)
            pat = re.compile(rf"{re.escape(self.prefix)}_iter(\d+)\.npz$")
            for f in os.listdir(self.dir):
                if pat.match(f) and f != keep:
                    os.unlink(os.path.join(self.dir, f))


def pickup(sim, dir, prefix="checkpoint", which="latest"):
    """Restore a Simulation from the newest (or a specific) checkpoint;
    returns True if picked up (reference `run!(sim; pickup=...)`)."""
    path = latest_checkpoint(dir, prefix) if which == "latest" else which
    if not path or not os.path.exists(path):
        return False
    state, it, t = read_checkpoint(path)
    # distributed runs: checkpoints hold the GLOBAL state (written through
    # the `GlobalStateView`); re-partition into the tiled layout the step
    # functions exchange
    part = getattr(sim, "_partition_state", None)
    sim.state = part(state) if part is not None else state
    sim.iteration = it
    sim.time = t
    return True
