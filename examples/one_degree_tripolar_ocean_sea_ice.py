"""1° tripolar coupled ocean + sea-ice simulation (Arctic-capable).

Python port of the reference example
`examples/one_degree_tripolar_ocean_sea_ice.jl`: `one_degree_tripolar_ocean`
(WENOVectorInvariant(5), CATKE + biharmonic, substeps=70) + EVP sea ice,
Δt = 20 min, 100-iteration short mode by default.
"""

import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from climaocean_tpu.configurations.omip import omip_simulation
from climaocean_tpu.utils.units import days, minutes

full = bool(os.environ.get("CLIMAOCEAN_FULL_SIMULATION"))

sim = omip_simulation(
    "onedegree",
    dt=20 * minutes,
    stop_iteration=None if full else 100,
    stop_time=360 * days if full else None,
    vertical_closure="catke",
    with_sea_ice=True,
    output_dir="output/one_degree_tripolar",
    progress_interval=10,
)

sim.run()
print(f"done: {sim.iteration} iterations, t = {sim.time / days:.2f} days")
