"""Global 1° latitude-longitude coupled ocean + sea-ice simulation.

Python port of the reference example
`examples/latitude_longitude_ocean_sea_ice.jl`: build the
`latitude_longitude_ocean` configuration, attach sea ice, force with the
prescribed (JRA55-proxy) atmosphere and run. Like the reference CI examples
(SURVEY.md §4), this defaults to a 100-iteration short mode; set
CLIMAOCEAN_FULL_SIMULATION=1 for a full run.

Run:  env PYTHONPATH=/root/repo python examples/latitude_longitude_ocean_sea_ice.py
(add JAX_PLATFORMS=cpu off-TPU; lower `resolution` for a quick smoke test)
"""

import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from climaocean_tpu.configurations.omip import omip_simulation
from climaocean_tpu.utils.units import days, minutes

full = bool(os.environ.get("CLIMAOCEAN_FULL_SIMULATION"))
resolution = float(os.environ.get("RESOLUTION", "4.0"))

sim = omip_simulation(
    "latlon",
    resolution=resolution,
    Nz=30,
    dt=20 * minutes,
    stop_iteration=None if full else 100,
    stop_time=360 * days if full else None,
    vertical_closure="catke",
    with_sea_ice=True,
    output_dir="output/latlon_ocean_sea_ice",
    progress_interval=10,
)

sim.run()
print(f"done: {sim.iteration} iterations, t = {sim.time / days:.2f} days")
