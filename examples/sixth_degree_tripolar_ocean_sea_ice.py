"""Distributed 1/6° tripolar coupled ocean + sea-ice simulation.

Python port of the reference example
`examples/sixth_degree_tripolar_ocean_sea_ice.jl`, whose point is the
distributed architecture: `Distributed(GPU(), partition=Partition(2, 2))`.
Here the 2-D domain decomposition is a ('y', 'x') `jax.sharding.Mesh` and
the FULL coupled step (atmosphere interp → bulk fluxes → EVP sea ice →
ocean) runs under `shard_map` with ppermute halo exchange — the tripolar
northern fold rides a ppermute among the top device row (SURVEY.md §2d).

Default short mode scales the grid down (SCALE=6 → 360×180) so the example
runs on a faked 4-device CPU mesh; SCALE=1 is the production 2160×1080
grid. Set CLIMAOCEAN_FULL_SIMULATION=1 for a full run.

Run:  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python examples/sixth_degree_tripolar_ocean_sea_ice.py
"""

import dataclasses
import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import numpy as np

from climaocean_tpu.configurations.tripolar import _build
from climaocean_tpu.models.coupled import OceanSeaIceModel
from climaocean_tpu.models.sea_ice import SeaIceModel
from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere
from climaocean_tpu.parallel.mesh import make_mesh
from climaocean_tpu.parallel.shard import make_sharded_coupled_step_fn
from climaocean_tpu.utils.units import days, minutes

full = bool(os.environ.get("CLIMAOCEAN_FULL_SIMULATION"))
scale = int(os.environ.get("SCALE", "1" if full else "6"))
Nx, Ny = 2160 // scale, 1080 // scale
Nz = int(os.environ.get("NZ", "60" if full else "10"))

# reference partition: Partition(2, 2) over 4 devices
n_dev = len(jax.devices())
mesh = make_mesh(shape=(2, 2) if n_dev >= 4 else None,
                 devices=jax.devices()[:min(4, n_dev)])

# 1/6° column of the reference table: substeps=300, passes=40, CATKE +
# Henyey only (no GM at eddy-permitting resolution)
ocean, ocean_state = _build(
    Nx, Ny, Nz, depth=6000.0, halo=5, substeps=300 // (2 if not full else 1),
    minimum_depth=20, passes=40, basins=1, momentum_order=5, tracer_order=7,
    biharmonic_timescale=None, fold_alignment_px=mesh.devices.shape[1])
grid = ocean.grid

ice = SeaIceModel(grid=grid, dynamics=True, substeps=100)
atmos = synthetic_prescribed_atmosphere(grid, 0.0, 5 * 86400.0)
model = OceanSeaIceModel(ocean=ocean, atmosphere=atmos, sea_ice=ice)

state = model.initial_state()
state["ocean"] = ocean_state
sst = np.asarray(ocean_state["T"][-1])
hi = np.where((sst < 0.5) & (np.asarray(grid.wet_c[-1]) > 0), 1.0, 0.0)
import jax.numpy as jnp
state["sea_ice"]["thickness"] = jnp.asarray(hi, dtype=jnp.float32)
state["sea_ice"]["concentration"] = jnp.asarray((hi > 0) * 0.9,
                                                dtype=jnp.float32)

step, partition, unpartition = make_sharded_coupled_step_fn(model, mesh,
                                                            donate=False)
s = partition(state)
dt = 5 * minutes if full else 10 * minutes
n_iter = int(os.environ.get("ITERATIONS", "8640" if full else "20"))
for i in range(n_iter):
    s = step(s, i * dt, dt)
    if (i + 1) % 10 == 0 or i == n_iter - 1:
        o = unpartition(s)["ocean"]
        print(f"iter {i + 1}: t = {(i + 1) * dt / days:.3f} days, "
              f"max|u| = {float(jnp.abs(o['u']).max()):.3f} m/s, "
              f"T in [{float(o['T'].min()):.2f}, {float(o['T'].max()):.2f}]",
              flush=True)

print(f"done: {n_iter} iterations on mesh {mesh.shape} "
      f"({Nx}x{Ny}x{Nz} tripolar)")
