"""OMIP layer + GM/Redi + prefetch + straits tests."""

import jax
import jax.numpy as jnp
import numpy as np


def test_gm_redi_slumps_front_conservatively():
    from climaocean_tpu.closures.gm_redi import IsopycnalSkewSymmetricDiffusivity
    from climaocean_tpu.core.halo import fill_halos
    from climaocean_tpu.core.tridiagonal import (
        implicit_vertical_diffusion_matrix, solve_tridiagonal)
    from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
    from climaocean_tpu.models import hydrostatic as hm
    from climaocean_tpu.models.hydrostatic import HydrostaticModel, SurfaceFluxes

    grid = latitude_longitude_grid((16, 12, 8), longitude=(-180, 180),
                                   latitude=(-60, 60), z=(-2000.0, 0.0), halo=4)
    grid = with_bottom_height(grid, np.full((12, 16), -2000.0), minimum_depth=10)
    gm = IsopycnalSkewSymmetricDiffusivity(kappa_skew=500.0, kappa_symmetric=200.0)
    model = HydrostaticModel(grid=grid, closures=(gm,), substeps=8)
    state = model.initial_state()
    zc = np.asarray(grid.z_c)
    H = grid.H
    lat = np.asarray(grid.interior(grid.lat_cc))
    T = 10 + 5 * np.tanh(np.deg2rad(lat)[None] * 6) * np.exp(zc[:, None, None] / 500.0)
    Tp = np.zeros(grid.padded_shape, np.float32)
    Tp[:, H:H + 12, H:H + 16] = T
    state["T"] = jnp.asarray(Tp)
    fluxes = SurfaceFluxes.zeros(grid)
    vol = grid.az_cc * grid.dz_c[:, None, None] * grid.wet_c

    @jax.jit
    def gm_step(s, dt=3600.0):
        s = dict(s, T=fill_halos(s["T"], grid), S=fill_halos(s["S"], grid))
        aux, _ = hm.closure_aux(model, s, fluxes)
        tend = gm.horizontal_tendencies(grid, s, aux)
        T = s["T"] + dt * tend["T"]
        _, kw = gm.diffusivities(grid, s, aux)
        a, b, c = implicit_vertical_diffusion_matrix(
            kw, grid.dz_c, grid.dz_f, dt, grid.wet_c, grid.wet_w)
        return dict(s, T=solve_tridiagonal(a, b, c, T * grid.wet_c))

    def total(s):
        return float(jnp.sum(grid.interior(s["T"] * vol)))

    def var(s):
        b = model.buoyancy(s)
        m = jnp.sum(b * vol, axis=(1, 2), keepdims=True) / jnp.sum(vol, axis=(1, 2), keepdims=True)
        return float(jnp.sum(grid.interior((b - m) ** 2 * vol)))

    t0, v0 = total(state), var(state)
    s = state
    for _ in range(24):
        s = gm_step(s)
    assert abs(total(s) - t0) / abs(t0) < 1e-4
    assert var(s) < v0        # front slumped


def test_prefetching_atmosphere_swaps_windows():
    from climaocean_tpu.coupler.prefetch import PrefetchingAtmosphere
    from climaocean_tpu.grids.grid import latitude_longitude_grid

    grid = latitude_longitude_grid((8, 6, 3), z=(-500.0, 0.0), halo=4)
    pf = PrefetchingAtmosphere.synthetic(grid, window_length=86400.0)
    refs = set()
    for i in range(40):
        t = i * 7200.0
        atm, t_ref = pf.window_for(t, t + 7200.0)
        st = atm.at_time(t - t_ref)
        assert bool(jnp.isfinite(st.T).all())
        assert t_ref + float(atm.times[0]) <= t + 1e-6      # covers t
        assert t_ref + float(atm.times[-1]) >= t + 7200.0 - 1e-6
        refs.add(t_ref)
    assert len(refs) >= 3     # windows rotated
    assert pf.swaps >= 2


def test_strait_transports():
    from climaocean_tpu.data.synthetic import synthetic_bathymetry
    from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
    from climaocean_tpu.simulation.strait_transports import strait_transports

    grid = latitude_longitude_grid((72, 36, 6), latitude=(-80, 80),
                                   z=(-4000.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat), -0.1),
                              minimum_depth=10)
    # uniform 0.1 m/s eastward: Drake transport should be large & positive
    u = np.full((6, 36, 72), 0.1, np.float32)
    v = np.zeros((6, 36, 72), np.float32)
    out = strait_transports(grid, u, v)
    assert set(out) == {"bering", "drake", "itf"}
    assert out["drake"] > 10.0       # ~0.1 m/s * ~1500 km * 4 km / 1e6 Sv


def test_nan_checker_aborts():
    import pytest
    from climaocean_tpu.simulation.simulation import (IterationInterval,
                                                      Simulation, nan_checker)
    state = {"T": jnp.ones((3, 4)), "u": jnp.zeros((3, 4))}

    def bad_step(s, t, dt):
        return {"T": s["T"] * jnp.nan, "u": s["u"]}

    sim = Simulation(bad_step, state, dt=1.0, stop_iteration=5)
    sim.add_callback(nan_checker(), IterationInterval(1))
    with pytest.raises(FloatingPointError):
        sim.run()


def test_orca_grid_standin():
    from climaocean_tpu.configurations.orca import ORCAGrid
    grid = ORCAGrid(Nz=6, depth=4000.0, with_bathymetry=False)
    assert grid.kind.startswith("tripolar:")
    assert grid.shape == (6, 331, 360)


def test_gm_no_variance_pumping_at_capped_slopes():
    """Round-4 year-validation regression: in weakly-stratified water with
    slopes pinned at the taper cap, the skew-FLUX discretization pumped
    tracer variance exponentially (~x2/2days at 1 deg). The advective
    (bolus) form must keep extrema bounded and variance non-increasing."""
    from climaocean_tpu.closures.gm_redi import IsopycnalSkewSymmetricDiffusivity
    from climaocean_tpu.core.halo import fill_halos
    from climaocean_tpu.core.tridiagonal import (
        implicit_vertical_diffusion_matrix, solve_tridiagonal)
    from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
    from climaocean_tpu.models import hydrostatic as hm
    from climaocean_tpu.models.hydrostatic import HydrostaticModel, SurfaceFluxes

    grid = latitude_longitude_grid((16, 12, 10), longitude=(-180, 180),
                                   latitude=(50, 80), z=(-1000.0, 0.0),
                                   halo=4)
    grid = with_bottom_height(grid, np.full((12, 16), -1000.0),
                              minimum_depth=10)
    gm = IsopycnalSkewSymmetricDiffusivity(kappa_skew=500.0,
                                           kappa_symmetric=200.0)
    model = HydrostaticModel(grid=grid, closures=(gm,), substeps=8)
    state = model.initial_state()
    rng = np.random.default_rng(0)
    zc = np.asarray(grid.z_c)
    H = grid.H
    lat = np.asarray(grid.interior(grid.lat_cc))
    lon = np.asarray(grid.interior(grid.lon_cc))
    # nearly unstratified + noisy horizontal buoyancy gradients -> slopes
    # pinned at the cap everywhere (the unstable regime)
    T = (4.0 + 0.02 * zc[:, None, None] / 1000.0
         + 0.5 * np.sin(np.deg2rad(lon)[None] * 6)
         * np.cos(np.deg2rad(lat)[None] * 8)
         + 0.05 * rng.standard_normal((10, 12, 16)))
    Tp = np.zeros(grid.padded_shape, np.float32)
    Tp[:, H:H + 12, H:H + 16] = T
    state["T"] = jnp.asarray(Tp) * grid.wet_c
    fluxes = SurfaceFluxes.zeros(grid)
    vol = grid.az_cc * grid.dz_c[:, None, None] * grid.wet_c

    @jax.jit
    def gm_step(s, dt=1200.0):
        s = dict(s, T=fill_halos(s["T"], grid), S=fill_halos(s["S"], grid))
        aux, _ = hm.closure_aux(model, s, fluxes)
        tend = gm.horizontal_tendencies(grid, s, aux)
        T = s["T"] + dt * tend["T"]
        _, kw = gm.diffusivities(grid, s, aux)
        a, b, c = implicit_vertical_diffusion_matrix(
            kw, grid.dz_c, grid.dz_f, dt, grid.wet_c, grid.wet_w)
        return dict(s, T=solve_tridiagonal(a, b, c, T * grid.wet_c))

    def stats(s):
        Ti = np.asarray(grid.interior(s["T"]))
        v = np.asarray(grid.interior(vol))
        mean = (Ti * v).sum() / v.sum()
        return Ti.max(), Ti.min(), ((Ti - mean) ** 2 * v).sum()

    hi0, lo0, var0 = stats(state)
    s = state
    for _ in range(144):                       # 2 simulated days
        s = gm_step(s)
    hi, lo, var = stats(s)
    Ti = np.asarray(grid.interior(s["T"]))
    assert np.isfinite(Ti).all()
    # bounded extrema (donor-cell bolus advection is monotone; Redi cross
    # terms allow tiny overshoot)
    assert hi < hi0 + 0.05, (hi, hi0)
    assert lo > lo0 - 0.05, (lo, lo0)
    assert var < 1.05 * var0, (var, var0)
