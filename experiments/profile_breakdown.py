"""Component-level timing breakdown of the 1/4-degree coupled step.

Times each stage of the hot loop (scan-of-N per component, forced
device->host transfer so the tunneled transport cannot hide work; see
DESIGN.md "Performance roadmap" for why `block_until_ready` alone is not
enough here) and prints a table. Run on a QUIET host:

    nohup python -u experiments/profile_breakdown.py > /tmp/breakdown.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(label, fn, *args, n=10, inner=10):
    """Time fn as a jitted scan-of-`inner`, carrying the first argument.

    All operands (including models) ride as jit ARGUMENTS, never closures:
    the tunneled remote compile caps serialized HLO size (DESIGN.md
    "Hard-won constraints"), so big arrays must be parameters."""
    import jax
    import jax.numpy as jnp

    first = args[0]
    rest = args[1:]

    @jax.jit
    def scan1(x0, *r):
        def body(x, _):
            return fn(x, *r), None
        y, _ = jax.lax.scan(body, x0, None, length=inner)
        return y

    y = scan1(first, *rest)
    float(jnp.sum(jax.tree_util.tree_leaves(y)[0]))   # flush compile+warmup
    t0 = time.perf_counter()
    for _ in range(n):
        y = scan1(y, *rest)
    float(jnp.sum(jax.tree_util.tree_leaves(y)[0]))
    dt = (time.perf_counter() - t0) / (n * inner) * 1e3
    print(f"{label:38s} {dt:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
    from climaocean_tpu.models.hydrostatic import (
        HydrostaticModel, closure_aux, implicit_vertical_step, tendencies,
        tracer_advection_tendency, diagnose_w, make_step_fn)
    from climaocean_tpu.models.coupled import (OceanSeaIceModel,
                                               atmosphere_ocean_fluxes,
                                               make_multi_step_fn)
    from climaocean_tpu.models.free_surface import substep_barotropic, BarotropicState
    from climaocean_tpu.closures.catke import CATKEVerticalDiffusivity
    from climaocean_tpu.closures.scalar_diffusivity import VerticalScalarDiffusivity
    from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere
    from climaocean_tpu.data.synthetic import (synthetic_bathymetry,
                                               synthetic_salinity,
                                               synthetic_temperature)

    small = bool(os.environ.get("BENCH_SMALL"))
    if small:
        nx, ny, nz, substeps = 180, 70, 10, 20
    else:
        nx, ny, nz, substeps = 1440, 560, 10, 70
    dt = 1200.0

    grid = latitude_longitude_grid((nx, ny, nz), longitude=(-180, 180),
                                   latitude=(-70, 70), z=(-3000.0, 0.0), halo=5)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat), -0.1),
                              minimum_depth=10.0)
    closures = (CATKEVerticalDiffusivity(),
                VerticalScalarDiffusivity(nu=3e-5, kappa=1e-5))
    ocean = HydrostaticModel(grid=grid, closures=closures, substeps=substeps,
                             momentum_scheme="vector_invariant",
                             momentum_order=5, tracer_order=7)
    atmos = synthetic_prescribed_atmosphere(grid, 0.0, 2 * 86400.0)
    model = OceanSeaIceModel(ocean=ocean, atmosphere=atmos)

    state = model.initial_state()
    H = grid.H
    zc = np.asarray(grid.z_c)
    Tp = np.zeros(grid.padded_shape, np.float32)
    Sp = np.full(grid.padded_shape, 35.0, np.float32)
    Tp[:, H:H + ny, H:H + nx] = synthetic_temperature(lon[None], lat[None],
                                                      zc[:, None, None])
    Sp[:, H:H + ny, H:H + nx] = synthetic_salinity(lon[None], lat[None],
                                                   zc[:, None, None])
    state["ocean"]["T"] = jnp.asarray(Tp)
    state["ocean"]["S"] = jnp.asarray(Sp)

    # one real step to settle structures (adds net_fluxes etc.)
    stepn = make_multi_step_fn(model, 1)
    state = stepn(state, jnp.float32(0.0), jnp.float32(dt))
    print(f"device={jax.devices()[0].device_kind}  grid=({nx},{ny},{nz})  "
          f"substeps={substeps}")

    os_ = state["ocean"]

    # --- full coupled step ---
    step10 = make_multi_step_fn(model, 10)
    y = step10(state, jnp.float32(0.0), jnp.float32(dt))
    float(jnp.sum(y["ocean"]["T"]))
    t0 = time.perf_counter()
    for _ in range(5):
        y = step10(y, jnp.float32(0.0), jnp.float32(dt))
    float(jnp.sum(y["ocean"]["T"]))
    print(f"{'full coupled step (scan-of-10)':38s} "
          f"{(time.perf_counter()-t0)/50*1e3:8.2f} ms")

    # --- bulk fluxes + atmosphere interp ---
    def fluxes_fn(s, m):
        atm = m.atmosphere.at_time(jnp.float32(43200.0))
        fl, _ = atmosphere_ocean_fluxes(m, atm, s)
        return dict(s, T=s["T"] + 1e-30 * fl.Q_T[None])
    timed("bulk fluxes + atmos interp", fluxes_fn, os_, model)

    atm = model.atmosphere.at_time(jnp.float32(43200.0))
    fluxes, _ = jax.jit(atmosphere_ocean_fluxes)(model, atm, os_)

    # --- tendencies with / without tracer advection ---
    def tend_full(s, m, fl):
        G, _aux, _ = tendencies(m.ocean, s, fl, tracer_advection=True, dt=dt)
        return dict(s, T=s["T"] + 1e-30 * G["T"], u=s["u"] + 1e-30 * G["u"])
    timed("tendencies (incl tracer adv)", tend_full, os_, model, fluxes)

    def tend_notracer(s, m, fl):
        G, _aux, _ = tendencies(m.ocean, s, fl, tracer_advection=False, dt=dt)
        return dict(s, u=s["u"] + 1e-30 * G["u"])
    timed("tendencies (no tracer adv)", tend_notracer, os_, model, fluxes)

    _G, aux, _sp = jax.jit(
        lambda m, s, fl: tendencies(m.ocean, s, fl, dt=dt))(model, os_, fluxes)

    # --- closure_aux (inside tendencies; isolate it) ---
    def aux_loop(s, m, fl):
        a = closure_aux(m.ocean, s, fl)
        leaf = jax.tree_util.tree_leaves(a)[0]
        return dict(s, T=s["T"] + 1e-30 * jnp.sum(leaf))
    timed("closure_aux", aux_loop, os_, model, fluxes)

    # --- implicit vertical step ---
    def impl(s, m, ax):
        out = implicit_vertical_step(m.ocean, s, ax, dt)
        return dict(s, T=out["T"], u=out["u"], e=out.get("e", s.get("e")))
    timed("implicit vertical step", impl, os_, model, aux)

    # --- barotropic window (as rk3_substage invokes it) ---
    from climaocean_tpu.core.halo import fill_halos
    from climaocean_tpu.models import free_surface as fs

    def baro(s, m):
        g = m.ocean.grid
        GU = jnp.zeros_like(s["u"][0])
        GV = jnp.zeros_like(s["v"][0])
        U0, V0 = fs.barotropic_transport(s["u"], s["v"], g)
        bt0 = fs.BarotropicState(s["eta"], U0, V0)
        averaged, _ = substep_barotropic(
            bt0, g, GU, GV, dt, substeps,
            lambda a: fill_halos(a, g), m.ocean.g,
            fill_U=lambda a: fill_halos(a, g, "u", vector=True),
            fill_V=lambda a: fill_halos(a, g, "v", vector=True))
        return dict(s, eta=averaged.eta)
    timed(f"barotropic window ({substeps} substeps)", baro, os_, model)


if __name__ == "__main__":
    main()
