"""`omip_simulation("orca")` constructs and steps — the reference's ORCA
OMIP operating point (`omip_simulation.jl:235,562-568`; Δt = 30 min default,
`launch.sh:157-162`). The CI docs example in the reference runs exactly
this: the ORCA config for 100 coupled iterations
(`.buildkite/pipeline.yml:110-114`)."""

import jax.numpy as jnp


def test_omip_orca_100_iterations(tmp_path):
    from climaocean_tpu.configurations.omip import omip_simulation
    from climaocean_tpu.utils.units import minutes

    sim = omip_simulation("orca", Nz=6, stop_iteration=100,
                          diagnostics=False, with_sea_ice=True,
                          progress_interval=1000)
    assert abs(sim.dt - 30 * minutes) < 1e-9          # reference default
    assert sim.model.ocean.grid.kind.startswith("tripolar")
    sim.run()
    assert sim.iteration == 100
    ocean = sim.state["ocean"]
    grid = sim.model.ocean.grid
    H, Ny, Nx = grid.H, grid.Ny, grid.Nx
    interior = (slice(None), slice(H, H + Ny), slice(H, H + Nx))
    assert bool(jnp.isfinite(ocean["T"][interior]).all())
    assert bool(jnp.isfinite(ocean["u"][interior]).all())
    # bounded spin-up; interior only — halos hold stale intermediate
    # values at step end and are refreshed before every stencil use
    assert float(jnp.max(jnp.abs(ocean["u"][interior]))) < 5.0
    ice = sim.state["sea_ice"]
    assert 0.0 <= float(jnp.max(ice["concentration"])) <= 1.0
