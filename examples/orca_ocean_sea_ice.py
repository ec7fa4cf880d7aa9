"""ORCA-mesh coupled ocean + sea-ice simulation.

Python port of the reference's ORCA docs example (run by CI on an L40S,
`.buildkite/pipeline.yml:92-114`): the NEMO eORCA1 mesh via `ORCAGrid`
(file-backed `coordinates.nc`/`mesh_mask.nc` or `.npz` supergrid when
present in DATA_DIR, analytic tripolar stand-in otherwise) with the
`orca_ocean` configuration, plus EVP sea ice and the prescribed (JRA55
proxy) atmosphere. 100-iteration short mode by default, like the
reference CI examples (SURVEY.md §4); CLIMAOCEAN_FULL_SIMULATION=1 for a
full run.

Run:  env PYTHONPATH=/root/repo python examples/orca_ocean_sea_ice.py
(add JAX_PLATFORMS=cpu off-TPU; set NZ=10 for a quick smoke test)
"""

import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import numpy as np
import jax.numpy as jnp

from climaocean_tpu.configurations.orca import orca_ocean
from climaocean_tpu.models.coupled import OceanSeaIceModel, make_coupled_step_fn
from climaocean_tpu.models.sea_ice import SeaIceModel
from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere
from climaocean_tpu.simulation.simulation import Simulation
from climaocean_tpu.configurations.omip import omip_progress_callback
from climaocean_tpu.simulation.simulation import IterationInterval
from climaocean_tpu.utils.units import days, minutes

full = bool(os.environ.get("CLIMAOCEAN_FULL_SIMULATION"))
Nz = int(os.environ.get("NZ", "60" if full else "20"))
data_dir = os.environ.get("DATA_DIR", ".")

ocean, ocean_state = orca_ocean(Nz=Nz, dir=data_dir)
grid = ocean.grid

ice = SeaIceModel(grid=grid, dynamics=True, substeps=100)
atmos = synthetic_prescribed_atmosphere(grid, 0.0, 10 * 86400.0)
model = OceanSeaIceModel(ocean=ocean, atmosphere=atmos, sea_ice=ice)

state = model.initial_state()
state["ocean"] = ocean_state
sst = np.asarray(ocean_state["T"][-1])
hi = np.where((sst < 0.5) & (np.asarray(grid.wet_c[-1]) > 0), 1.0, 0.0)
state["sea_ice"]["thickness"] = jnp.asarray(hi, dtype=jnp.float32)
state["sea_ice"]["concentration"] = jnp.asarray((hi > 0) * 0.9,
                                                dtype=jnp.float32)

step = make_coupled_step_fn(model, donate=False)
sim = Simulation(lambda s, t, dt: step(s, t, dt), state, dt=20 * minutes,
                 stop_iteration=None if full else 100,
                 stop_time=360 * days if full else None)
sim.add_callback(omip_progress_callback(grid), IterationInterval(10),
                 name="progress")
sim.run()
print(f"done: {sim.iteration} iterations, t = {sim.time / days:.2f} days "
      f"on the {grid.Nx}x{grid.Ny} ORCA mesh")
