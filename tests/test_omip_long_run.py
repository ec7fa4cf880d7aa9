"""Long-run OMIP forcing: bounded device windows + background rotation.

VERDICT r1 #1: multi-year runs must not materialize the whole forcing
series on device. `omip_simulation` now serves 30-day windows through
`PrefetchingAtmosphere` whenever the run is long; the window rotates
mid-run and the run proceeds continuously across swaps."""

import numpy as np

import jax.numpy as jnp


def test_omip_long_run_rotates_windows():
    from climaocean_tpu.configurations.omip import omip_simulation
    from climaocean_tpu.utils.units import days

    sim = omip_simulation(
        "latlon", resolution=15.0, Nz=3, dt=2 * 3600.0,
        stop_time=100 * days, with_sea_ice=False, diagnostics=False,
        salinity_restoring=False, progress_interval=10 ** 9,
        free_surface_substeps=8)
    assert sim.prefetcher is not None, "long run did not get a prefetcher"
    n_window = sim.model.atmosphere.times.shape[0]
    sim.run()
    assert sim.iteration == 1200
    assert bool(jnp.isfinite(sim.state["ocean"]["T"]).all())
    # rotated several times; every window kept the same bounded size
    assert sim.prefetcher.swaps >= 2
    win, _ = sim.prefetcher.window_for(sim.time)
    assert win.times.shape[0] == n_window


def test_omip_short_run_has_no_prefetcher():
    from climaocean_tpu.configurations.omip import omip_simulation
    from climaocean_tpu.utils.units import days

    sim = omip_simulation(
        "latlon", resolution=15.0, Nz=3, dt=2 * 3600.0,
        stop_time=2 * days, with_sea_ice=False, diagnostics=False,
        salinity_restoring=False, progress_interval=10 ** 9,
        free_surface_substeps=8)
    assert sim.prefetcher is None
    sim.run()
    assert bool(jnp.isfinite(sim.state["ocean"]["T"]).all())
