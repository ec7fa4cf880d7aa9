"""OMIP-protocol coupled simulation (the reference's flagship experiment).

Python port of the reference example `examples/omip_simulation.jl` /
`experiments/OMIPSimulations`: half-degree tripolar ocean + sea ice with
JRA55-style forcing, the OMIP diagnostics suite, checkpointing, and
pickup-from-latest restart. Env-var knobs mirror the launcher's style
(`launch.sh:27-119`).
"""

import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from climaocean_tpu.configurations.omip import omip_simulation
from climaocean_tpu.simulation.checkpoint import pickup
from climaocean_tpu.utils.units import days, minutes

CONFIG = os.environ.get("CONFIG", "halfdegree")     # halfdegree|onedegree|...
CLOSURE = os.environ.get("VERTICAL_CLOSURE", "catke")  # catke|simple|rbvd|kpp|nemo_tke
FLUXES = os.environ.get("FLUX_CONFIGURATION", "default")  # default|corrected|ncar
DT = float(os.environ.get("DT_MINUTES", "30")) * minutes
STOP = float(os.environ.get("STOP_DAYS", "0"))
OUTPUT = os.environ.get("OUTPUT_DIR", f"output/omip_{CONFIG}")
PICKUP = os.environ.get("PICKUP", "")

sim = omip_simulation(
    CONFIG,
    dt=DT,
    stop_time=STOP * days if STOP else None,
    stop_iteration=None if STOP else 100,
    vertical_closure=CLOSURE,
    flux_configuration=FLUXES,
    with_sea_ice=True,
    output_dir=OUTPUT,
)

if PICKUP:
    if pickup(sim, OUTPUT, prefix="omip_checkpoint"):
        print(f"picked up from iteration {sim.iteration}")

sim.run()
print(f"done: {sim.iteration} iterations, t = {sim.time / days:.2f} days")
