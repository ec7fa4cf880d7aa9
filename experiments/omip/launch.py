#!/usr/bin/env python
"""OMIP production launcher.

TPU-native rebuild of the reference's ops layer
(`experiments/OMIPSimulations/scripts/launch.sh`, SURVEY.md §2a L6): env-var
physics knobs → simulation kwargs, an experiment name encoded from the knob
set (`launch.sh:196-218`), pickup-from-latest restart, a profiling mode that
disables output writers (writers add per-iteration overhead that
contaminates traces, `launch.sh:368-373`), and periodic checkpointing.

Knobs (defaults in brackets):
  CONFIG [halfdegree]            latlon|onedegree|halfdegree|sixthdegree|tenthdegree
  VERTICAL_CLOSURE [catke]       catke|simple|rbvd|nori|kpp|nemo_tke
  FLUX_CONFIGURATION [default]   default|corrected|ncar
  DT_MINUTES [30]   STOP_DAYS [360]   NZ []   WITH_SEA_ICE [1]
  NORMALIZE_SALINITY [1]   OUTPUT_BASE [output]   PICKUP [1]
  PROFILE [0]                    200-iteration jax.profiler window, writers off
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))

from climaocean_tpu.configurations.omip import omip_simulation
from climaocean_tpu.simulation.checkpoint import pickup
from climaocean_tpu.utils.units import days, minutes


def env(name, default):
    return os.environ.get(name, default)


CONFIG = env("CONFIG", "halfdegree")
CLOSURE = env("VERTICAL_CLOSURE", "catke")
FLUXES = env("FLUX_CONFIGURATION", "default")
DT = float(env("DT_MINUTES", "30")) * minutes
STOP = float(env("STOP_DAYS", "360"))
NZ = int(env("NZ", "0")) or None
SEA_ICE = env("WITH_SEA_ICE", "1") == "1"
NORM_S = env("NORMALIZE_SALINITY", "1") == "1"
PROFILE = env("PROFILE", "0") == "1"

# experiment name from the knob set (reference launch.sh:196-218)
name = f"omip_{CONFIG}_{CLOSURE}_{FLUXES}_dt{int(DT // 60)}"
if not SEA_ICE:
    name += "_noice"
outdir = os.path.join(env("OUTPUT_BASE", "output"), name)

sim = omip_simulation(
    CONFIG,
    dt=DT,
    stop_time=None if PROFILE else STOP * days,
    stop_iteration=200 if PROFILE else None,     # fixed profile window (:182)
    vertical_closure=CLOSURE,
    flux_configuration=FLUXES,
    with_sea_ice=SEA_ICE,
    normalize_salinity=NORM_S,
    diagnostics=not PROFILE,                     # writers off when profiling
    output_dir=outdir,
    **({"Nz": NZ} if NZ else {}),
)

if not PROFILE and env("PICKUP", "1") == "1":
    if pickup(sim, outdir, prefix="omip_checkpoint"):
        print(f"[launch] picked up at iteration {sim.iteration}", flush=True)

if PROFILE:
    with jax.profiler.trace(os.path.join(outdir, "profile")):
        sim.run()
else:
    sim.run()

print(f"[launch] done: {name} iter={sim.iteration} t={sim.time / days:.1f} d",
      flush=True)
