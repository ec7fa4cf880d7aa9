"""Half-degree tripolar coupled ocean + sea-ice simulation.

Python port of the reference example
`examples/half_degree_tripolar_ocean_sea_ice.jl`: a 0.5° `TripolarGrid`
(720×360) ocean with CATKE + GM + biharmonic viscosity (the
`half_degree_tripolar_ocean` defaults, substeps=150), z★ vertical
coordinate, EVP sea ice on the shared grid, initial T/S and ice h/ℵ from
`ECCO4Monthly` metadata (file-backed when cached, synthetic fallback
otherwise), JRA55(-proxy) atmospheric forcing, and 5-day surface/ice
output writers. Like the reference CI examples (SURVEY.md §4) this runs a
100-iteration short mode by default; CLIMAOCEAN_FULL_SIMULATION=1 runs two
years like the reference.

Run:  env PYTHONPATH=/root/repo python examples/half_degree_tripolar_ocean_sea_ice.py
(add JAX_PLATFORMS=cpu off-TPU; set STOP_ITERATION=4 NZ=10 for a smoke test)
"""

import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from climaocean_tpu.configurations.tripolar import half_degree_tripolar_ocean
from climaocean_tpu.configurations.sea_ice import half_degree_tripolar_sea_ice
from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere
from climaocean_tpu.data.download import download_metadatum
from climaocean_tpu.data.metadata import ECCO4Monthly, Metadatum, set_fields
from climaocean_tpu.models.coupled import OceanSeaIceModel, make_coupled_step_fn
from climaocean_tpu.configurations.omip import omip_progress_callback
from climaocean_tpu.simulation.diagnostics import FieldWriter, surface_diagnostics
from climaocean_tpu.simulation.simulation import (IterationInterval, Simulation,
                                                  TimeInterval)
from climaocean_tpu.utils.units import days, minutes

full = bool(os.environ.get("CLIMAOCEAN_FULL_SIMULATION"))
data_dir = os.environ.get("DATA_DIR", ".")
stop_iteration = int(os.environ.get("STOP_ITERATION", "100"))
Nz = int(os.environ.get("NZ", "60"))

# ## Build ocean and sea ice (reference `half_degree_tripolar_ocean(zstar=true)`)
ocean, state_o = half_degree_tripolar_ocean(Nz=Nz, zstar=True, dir=data_dir,
                                            initialize=False)
grid = ocean.grid
sea_ice = half_degree_tripolar_sea_ice(ocean)

# ## Initial conditions from ECCO (reference `Metadatum(:temperature; date,
# dataset=ECCO4Monthly())` + `download_with_fallback` + `set!`)
date = "1993-01-01"
T_meta = Metadatum("temperature", date=date, dataset=ECCO4Monthly(), dir=data_dir)
S_meta = Metadatum("salinity", date=date, dataset=ECCO4Monthly(), dir=data_dir)
h_meta = Metadatum("sea_ice_thickness", date=date, dataset=ECCO4Monthly(),
                   dir=data_dir)
a_meta = Metadatum("sea_ice_concentration", date=date, dataset=ECCO4Monthly(),
                   dir=data_dir)
for meta in (T_meta, S_meta, h_meta, a_meta):
    try:
        download_metadatum(meta)
    except Exception:
        pass                        # zero-egress: the synthetic fallback serves

state_o = set_fields(state_o, grid, T=T_meta, S=S_meta)

# ## Atmospheric forcing (JRA55 proxy; `time_indices_in_memory=41` ≈ 5 days)
atmosphere = synthetic_prescribed_atmosphere(grid, 0.0, 5 * 86400.0 + 10800.0)

# ## Coupled model + simulation
model = OceanSeaIceModel(ocean=ocean, sea_ice=sea_ice, atmosphere=atmosphere)
state = model.initial_state()
state["ocean"] = state_o
state["sea_ice"] = set_fields(state["sea_ice"], grid, h=h_meta, a=a_meta)

step = make_coupled_step_fn(model, donate=False)
sim = Simulation(lambda s, t, dt: step(s, t, dt), state, dt=10 * minutes,
                 stop_time=2 * 365 * days if full else None,
                 stop_iteration=None if full else stop_iteration)

# ## Progress messenger (reference `add_callback!(sim, Progress(), IterationInterval(100))`)
sim.add_callback(omip_progress_callback(grid), IterationInterval(100),
                 name="progress")

# ## Output writers: 5-day surface ocean fields + sea-ice h/ℵ
outdir = "output/half_degree_tripolar"


def _ice_outputs(grid, s):
    return {"h": s["sea_ice"]["thickness"], "a": s["sea_ice"]["concentration"]}


sim.add_output_writer(FieldWriter(
    surface_diagnostics, grid, outdir,
    "half_degree_coupled_ocean_surface", TimeInterval(5 * days)))
sim.add_output_writer(FieldWriter(
    _ice_outputs, grid, outdir, "half_degree_coupled_sea_ice",
    TimeInterval(5 * days)))

# ## Run!
sim.run()
print(f"done: {sim.iteration} iterations, t = {sim.time / days:.2f} days")
