"""Component-level timing of the 1° tripolar coupled step (the BASELINE.md
"ms/step at 1°" workload: EVP sea ice + CATKE + GM, Nz=60, Δt = 20 min).

Same methodology as `profile_breakdown.py`: each component runs as a
jitted scan-of-`inner`, and both warmup and timed windows end with a real
device→host transfer (`block_until_ready` returns early on the tunneled
transport — DESIGN.md "Performance roadmap").

    nohup python -u experiments/profile_coupled_1deg.py > /tmp/coupled1.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(label, fn, *args, n=5, inner=10):
    import jax
    import jax.numpy as jnp

    first, rest = args[0], args[1:]

    @jax.jit
    def scan1(x0, *r):
        def body(x, _):
            return fn(x, *r), None
        y, _ = jax.lax.scan(body, x0, None, length=inner)
        return y

    y = scan1(first, *rest)
    float(jnp.sum(jax.tree_util.tree_leaves(y)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        y = scan1(y, *rest)
    float(jnp.sum(jax.tree_util.tree_leaves(y)[0]))
    dt = (time.perf_counter() - t0) / (n * inner) * 1e3
    print(f"{label:38s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    from climaocean_tpu.configurations.tripolar import one_degree_tripolar_ocean
    from climaocean_tpu.models.coupled import (OceanSeaIceModel,
                                               atmosphere_ocean_fluxes,
                                               make_batched_step_fn)
    from climaocean_tpu.models import sea_ice as si
    from climaocean_tpu.models import hydrostatic as hm
    from climaocean_tpu.models.sea_ice import (SeaIceModel,
                                               default_ice_atmosphere_fluxes)
    from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere

    ocean, state_o = one_degree_tripolar_ocean(Nz=60, initialize=True)
    grid = ocean.grid
    ice = SeaIceModel(grid=grid, dynamics=True, substeps=100,
                      atmosphere_fluxes=default_ice_atmosphere_fluxes())
    atmos = synthetic_prescribed_atmosphere(grid, 0.0, 5 * 86400.0)
    model = OceanSeaIceModel(ocean=ocean, atmosphere=atmos, sea_ice=ice,
                             normalize_salinity=True)
    state = model.initial_state()
    state["ocean"] = state_o
    dt = 1200.0

    step = make_batched_step_fn(model, donate=False)
    state = step(state, 0.0, dt, 8)
    float(jnp.sum(state["ocean"]["T"]))
    print(f"device={jax.devices()[0].device_kind}  grid="
          f"({grid.Nx},{grid.Ny},{grid.Nz})  EVP substeps=100", flush=True)

    t0 = time.perf_counter()
    for _ in range(4):
        state = step(state, 0.0, dt, 8)
    float(jnp.sum(state["ocean"]["T"]))
    print(f"{'full coupled step (batch-of-8)':38s} "
          f"{(time.perf_counter()-t0)/32*1e3:8.2f} ms", flush=True)

    os_ = state["ocean"]
    ice_state = state["sea_ice"]
    atm = model.atmosphere.at_time(jnp.float32(43200.0))
    fluxes, _ = jax.jit(atmosphere_ocean_fluxes)(model, atm, os_)

    # --- EVP dynamics alone (carry the velocity) ---
    def evp_fn(ic, m, ostate, a):
        new_ice, tx, ty = si.evp_dynamics(m, ic, ostate, a, dt)
        return new_ice
    timed("EVP dynamics (100 substeps)", evp_fn, ice_state, model.sea_ice,
          os_, atm)

    # --- ice advection ---
    def adv_fn(ic, m):
        return si.advect_ice(m, ic, dt)
    timed("ice advection (WENO7 x3 fields)", adv_fn, ice_state,
          model.sea_ice)

    # --- slab thermodynamics ---
    def thermo_fn(ic, m, ostate, a):
        new_ice, _fl = si.slab_thermodynamics(m, ic, ostate, a, dt)
        return new_ice
    timed("slab thermodynamics", thermo_fn, ice_state, model.sea_ice,
          os_, atm)

    # --- bulk fluxes + atmos interp ---
    def fluxes_fn(s, m):
        a = m.atmosphere.at_time(jnp.float32(43200.0))
        fl, _ = atmosphere_ocean_fluxes(m, a, s)
        return dict(s, T=s["T"] + 1e-30 * fl.Q_T[None])
    timed("bulk fluxes + atmos interp", fluxes_fn, os_, model)

    # --- ocean step alone ---
    def ocean_fn(s, m, fl):
        return hm.step(m, s, fl, dt)
    timed("ocean step (RK3, no ice)", ocean_fn, os_, model.ocean, fluxes)

    # --- ocean tendencies ---
    def tend_fn(s, m, fl):
        G, _aux, _ = hm.tendencies(m, s, fl, tracer_advection=True, dt=dt)
        return dict(s, T=s["T"] + 1e-30 * G["T"], u=s["u"] + 1e-30 * G["u"])
    timed("ocean tendencies (1 stage)", tend_fn, os_, model.ocean, fluxes)

    # --- closure aux + implicit step ---
    def aux_fn(s, m, fl):
        aux = hm.closure_aux(m, s, fl, 0.0)
        leaf = jax.tree_util.tree_leaves(aux)[0]
        return dict(s, T=s["T"] + 1e-30 * leaf[: s["T"].shape[0]])
    timed("closure aux", aux_fn, os_, model.ocean, fluxes)


if __name__ == "__main__":
    main()
