"""Simulation dispatch batching, TimeInterval anchoring, in-step salinity
normalization (reference cost notes: `launch.sh:368-373`; NormalizeSalinity
`omip_simulation.jl:182-220`)."""

import jax.numpy as jnp
import numpy as np

from climaocean_tpu.simulation.simulation import (IterationInterval,
                                                  Simulation, TimeInterval)


def _linear_step(s, t, dt):
    return {"x": s["x"] + dt}


def _linear_multi(s, t, dt, n):
    return {"x": s["x"] + n * dt}


def test_batched_run_matches_unbatched_and_fires_on_schedule():
    fired = []

    sim = Simulation(_linear_step, {"x": jnp.zeros(())}, dt=1.0,
                     stop_iteration=100, multi_step_fn=_linear_multi,
                     batch_size=8)
    sim.add_callback(lambda s: fired.append(s.iteration), IterationInterval(10))
    sim.run()
    assert sim.iteration == 100
    assert float(sim.state["x"]) == 100.0
    # IterationInterval(10) must fire at exactly the multiples of 10 —
    # batching may not skip a boundary
    assert fired == [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]


def test_batching_respects_stop_time():
    sim = Simulation(_linear_step, {"x": jnp.zeros(())}, dt=1.0,
                     stop_time=13.0, multi_step_fn=_linear_multi,
                     batch_size=8)
    sim.run()
    assert sim.iteration == 13
    assert abs(sim.time - 13.0) < 1e-9


def test_time_interval_does_not_fire_first_call():
    fired = []
    sim = Simulation(_linear_step, {"x": jnp.zeros(())}, dt=1.0,
                     stop_iteration=25)
    sim.add_callback(lambda s: fired.append(round(s.time)), TimeInterval(10.0))
    sim.run()
    assert fired == [10, 20]          # no spurious fire at t=dt


def test_time_interval_batched():
    fired = []
    sim = Simulation(_linear_step, {"x": jnp.zeros(())}, dt=1.0,
                     stop_iteration=25, multi_step_fn=_linear_multi,
                     batch_size=8)
    sim.add_callback(lambda s: fired.append(round(s.time)), TimeInterval(10.0))
    sim.run()
    assert fired == [10, 20]


def test_in_step_salinity_normalization_zeroes_mean_flux():
    import dataclasses

    from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere
    from climaocean_tpu.data.synthetic import (synthetic_bathymetry,
                                               synthetic_salinity,
                                               synthetic_temperature)
    from climaocean_tpu.grids.grid import (latitude_longitude_grid,
                                           with_bottom_height)
    from climaocean_tpu.models.coupled import (OceanSeaIceModel, coupled_step)
    from climaocean_tpu.models.hydrostatic import HydrostaticModel

    grid = latitude_longitude_grid((24, 16, 4), latitude=(-70, 70),
                                   z=(-2000.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(
        grid, np.minimum(synthetic_bathymetry(lon, lat), -0.1),
        minimum_depth=10.0)
    ocean = HydrostaticModel(grid=grid, closures=(), substeps=6)
    atmos = synthetic_prescribed_atmosphere(grid, 0.0, 86400.0)
    model = OceanSeaIceModel(ocean=ocean, atmosphere=atmos,
                             normalize_salinity=True)
    state = model.initial_state()
    H = grid.H
    zc = np.asarray(grid.z_c)
    Tp = np.zeros(grid.padded_shape, np.float32)
    Sp = np.full(grid.padded_shape, 35.0, np.float32)
    Tp[:, H:H + 16, H:H + 24] = synthetic_temperature(
        lon[None], lat[None], zc[:, None, None])
    Sp[:, H:H + 16, H:H + 24] = synthetic_salinity(
        lon[None], lat[None], zc[:, None, None])
    state["ocean"]["T"] = jnp.asarray(Tp)
    state["ocean"]["S"] = jnp.asarray(Sp)

    out = coupled_step(model, state, 0.0, 600.0)
    # the invariant is the INTERIOR wet mean (the normalization masks out
    # wrap/fold halo cells so halo scratch can never poison the global mean
    # — models/coupled.py interior-masked reduction, round-4 day-302 fix)
    H2 = grid.H
    interior = np.zeros(np.asarray(grid.az_cc).shape, np.float32)
    interior[..., H2:H2 + grid.Ny, H2:H2 + grid.Nx] = 1.0
    wet2 = grid.wet_c[-1] * interior
    area = float(jnp.sum(grid.az_cc * wet2))
    mean = float(jnp.sum(out["net_fluxes"]["Q_S"] * grid.az_cc * wet2)) / area
    scale = float(jnp.max(jnp.abs(out["net_fluxes"]["Q_S"]))) + 1e-30
    assert abs(mean) < 1e-5 * scale

    # and the unnormalized model leaves a nonzero mean (the test has teeth)
    model0 = dataclasses.replace(model, normalize_salinity=False)
    out0 = coupled_step(model0, state, 0.0, 600.0)
    mean0 = float(jnp.sum(out0["net_fluxes"]["Q_S"] * grid.az_cc * wet2)) / area
    assert abs(mean0) > abs(mean)


def test_averaging_stride_respected_under_batching(tmp_path):
    """Averaged-writer output must be identical for batch_size=1 and 8:
    dispatch batching may not jump over sampling iterations (VERDICT r2
    weak #4 — `_steps_to_boundary` must respect each averaging writer's
    stride)."""
    from types import SimpleNamespace

    from climaocean_tpu.simulation.diagnostics import FieldWriter

    grid = SimpleNamespace(H=0, Ny=1, Nx=1)

    def run(batch, dirpath):
        writer = FieldWriter(lambda g, s: {"x": s["x"]}, grid, dirpath,
                             "avg", IterationInterval(12), averaging=True,
                             averaging_stride=4, file_splitting=None)
        sim = Simulation(_linear_step, {"x": jnp.zeros(())}, dt=1.0,
                         stop_iteration=48, multi_step_fn=_linear_multi,
                         batch_size=batch)
        sim.add_output_writer(writer)
        sim.run()
        writer.close()
        import glob
        import os
        parts = sorted(glob.glob(os.path.join(dirpath, "avg_part*.npz")))
        return np.concatenate([np.load(p)["x"] for p in parts])

    x1 = run(1, str(tmp_path / "b1"))
    x8 = run(8, str(tmp_path / "b8"))
    np.testing.assert_allclose(x8, x1, rtol=0, atol=1e-12)
    # with stride 4 the samples between fires are x = 4, 8, 12 → mean 8, etc.
    np.testing.assert_allclose(x1, [8.0, 20.0, 32.0, 44.0], atol=1e-12)
