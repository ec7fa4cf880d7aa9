"""OceanSeaIceModel — the coupled model.

TPU-native rebuild of NumericalEarth's `OceanSeaIceModel` +
`ComponentInterfaces` (reference: `omip_simulation.jl:123-164`; hot-loop
ordering from SURVEY.md §3.2: interpolate atmosphere → compute interface
fluxes → step sea ice → step ocean). The whole coupled step — including the
MOST flux iteration — is one jit-compiled function; computed net fluxes are
carried in the state for diagnostics, mirroring the reference's
`interfaces.net_fluxes.ocean.{u,v,T,S}` fields read by
`omip_diagnostics.jl:77-82`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..coupler import radiation as rad
from ..coupler.similarity_theory import SimilarityTheoryFluxes
from ..coupler.thermodynamics import CELSIUS, saturation_specific_humidity
from . import hydrostatic as hyd
from .hydrostatic import SurfaceFluxes

RHO_OCEAN = 1020.0          # kg/m³ Boussinesq reference
CP_OCEAN = 3991.0           # J/kg/K (TEOS-10 cp0)
RHO_FRESH = 1000.0


@partial(jax.tree_util.register_dataclass,
         data_fields=["ocean", "atmosphere", "sea_ice", "land"],
         meta_fields=["atmosphere_ocean_fluxes", "atmosphere_sea_ice_fluxes",
                      "ocean_albedo", "ocean_emissivity",
                      "ocean_minimum_salinity", "normalize_salinity"])
@dataclass(frozen=True)
class OceanSeaIceModel:
    """Coupled-model configuration (a pytree: the component models carry the
    device arrays as leaves so the jitted step takes them as arguments).

    ``sea_ice`` is either None (reference's ocean-only `OceanSeaIceModel`
    with no sea ice — the README benchmark workload) or a SeaIceModel.
    """
    ocean: object                               # HydrostaticModel
    atmosphere: object                          # PrescribedAtmosphere
    sea_ice: object = None
    # prescribed land freshwater (rivers friver + iceberg calving licalvf):
    # `coupler.land.PrescribedLand` or None (reference `JRA55PrescribedLand`,
    # atmosphere.jl:46)
    land: object = None
    atmosphere_ocean_fluxes: object = SimilarityTheoryFluxes()
    atmosphere_sea_ice_fluxes: object = None
    ocean_albedo: float = rad.OCEAN_ALBEDO
    ocean_emissivity: float = rad.OCEAN_EMISSIVITY
    ocean_minimum_salinity: float = 1.0         # omip_simulation.jl:132
    # subtract the global wet-area mean of the net surface salinity flux
    # every step, INSIDE the jitted step (reference `NormalizeSalinity`
    # callback + `_materialize_top_flux!` kernel, omip_simulation.jl:182-220
    # — fused here so the production loop stays batchable); correct under
    # shard_map via the `global_sum` psum hook
    normalize_salinity: bool = False

    def initial_state(self, **kw):
        state = {"ocean": self.ocean.initial_state(**kw),
                 # global-mean surface salinity-flux correction, maintained by
                 # the OMIP `salinity_normalizer` callback (omip_simulation.jl:182)
                 "salinity_flux_offset": jnp.zeros(())}
        if self.sea_ice is not None:
            state["sea_ice"] = self.sea_ice.initial_state()
        return state


def atmosphere_ocean_fluxes(model, atmos, ocean_state):
    """Bulk fluxes + radiation → kinematic ocean surface fluxes."""
    from ..core.halo import fill_halos

    grid = model.ocean.grid
    # Halo hygiene: fluxes are computed BEFORE the ocean step's entry
    # fills, so the surface slices feeding them must be refreshed here —
    # otherwise stale/poisoned halo values become flux halos, and the
    # split-explicit forcing (flux-derived) hands them to the deferred-fill
    # barotropic stencils, reaching interior η within one substep (the
    # halo-poison invariant test pins this).
    SST_K = fill_halos(ocean_state["T"][-1], grid) + CELSIUS
    SSS = fill_halos(ocean_state["S"][-1], grid)
    q_surf = 0.98 * saturation_specific_humidity(SST_K, atmos.p, over_ocean=False)
    # surface velocity in the geographic frame (identity on lat-lon grids;
    # rotation matters on the tripolar cap)
    c, s = grid.rot_cos, grid.rot_sin
    u_g = fill_halos(ocean_state["u"][-1], grid, "u", vector=True)
    v_g = fill_halos(ocean_state["v"][-1], grid, "v", vector=True)
    u_surf = c * u_g - s * v_g
    v_surf = s * u_g + c * v_g

    turb = model.atmosphere_ocean_fluxes(atmos, SST_K, q_surf, u_surf, v_surf)

    Q_lw = rad.net_longwave(atmos.Qlw_down, SST_K, model.ocean_emissivity)
    Q_sw = rad.net_shortwave(atmos.Qsw_down, model.ocean_albedo)
    Q_nonpen = turb.Q_sensible + turb.Q_latent + Q_lw      # W/m² into ocean

    # freshwater: E - P (land runoff enters separately in coupled_step via
    # `model.land` — coupler.land.PrescribedLand)
    fw = (turb.evaporation - atmos.rain - atmos.snow) / RHO_FRESH  # m/s out of ocean
    Q_S = SSS * fw                                          # g/kg·m/s into ocean

    # rotate the geographic-frame stress onto the (possibly curvilinear) grid
    tau_x_g = c * turb.tau_x + s * turb.tau_y
    tau_y_g = -s * turb.tau_x + c * turb.tau_y
    fluxes = SurfaceFluxes(
        tau_x=tau_x_g / RHO_OCEAN,
        tau_y=tau_y_g / RHO_OCEAN,
        Q_T=Q_nonpen / (RHO_OCEAN * CP_OCEAN),
        Q_S=Q_S,
        Q_sw=Q_sw / (RHO_OCEAN * CP_OCEAN),
    )
    diags = {"sensible_heat": turb.Q_sensible, "latent_heat": turb.Q_latent,
             "longwave": Q_lw, "shortwave": Q_sw, "evaporation": turb.evaporation,
             "u_star": turb.u_star}
    return fluxes, diags


def coupled_step(model, state, t, dt, t_offset=0.0):
    """One coupled time step (SURVEY.md §3.2 ordering).

    ``t`` is window-relative when a prefetcher serves the atmosphere
    (float32 precision over multi-century runs); ``t_offset`` restores the
    ABSOLUTE model time ``t + t_offset`` for time-dependent ocean forcings
    (`DatasetRestoring` toward a monthly series — monthly-scale targets
    tolerate f32 absolute-seconds resolution, ~17 min at year 300)."""
    atmos = model.atmosphere.at_time(t)
    ocean_state = state["ocean"]
    fluxes, diags = atmosphere_ocean_fluxes(model, atmos, ocean_state)
    offset = state.get("salinity_flux_offset")
    if offset is not None:
        fluxes = fluxes._replace(Q_S=fluxes.Q_S - offset)

    new_state = dict(state)
    if model.sea_ice is not None:
        from . import sea_ice as si
        ice_state, ice_ocean = si.step(model.sea_ice, state["sea_ice"],
                                       ocean_state, atmos, model, dt)
        new_state["sea_ice"] = ice_state
        # blend open-water and under-ice ocean fluxes by ice concentration;
        # the ice fraction also rides along so closures can damp their
        # wave-driven TKE sources by (1 − ℵ) (NEMO-TKE nn_etau path)
        a = ice_state["concentration"]
        open_Q_T = (1 - a) * fluxes.Q_T
        open_Q_S = (1 - a) * fluxes.Q_S
        fluxes = SurfaceFluxes(
            tau_x=(1 - a) * fluxes.tau_x + a * ice_ocean.tau_x,
            tau_y=(1 - a) * fluxes.tau_y + a * ice_ocean.tau_y,
            Q_T=(1 - a) * fluxes.Q_T + a * ice_ocean.Q_T,
            Q_S=(1 - a) * fluxes.Q_S + a * ice_ocean.Q_S,
            Q_sw=(1 - a) * fluxes.Q_sw,
            ice_fraction=a,
        )

    if model.land is not None:
        # coastal freshwater from rivers + iceberg calving, applied AFTER
        # the sea-ice blending (rivers discharge under ice too) and BEFORE
        # the normalization (so OMIP's zero-mean constraint accounts for
        # the runoff input, like the reference's NormalizeSalinity over the
        # full net flux). R [kg/m²/s] → kinematic salinity flux
        # −SSS·R/ρ_fresh (freshening). The `wfo` surface diagnostic reads
        # the resulting Q_S. Reference `JRA55PrescribedLand`
        # (atmosphere.jl:46; friver/licalvf in jra55_data_staging.jl:8).
        R = model.land.at_time(t + t_offset)
        SSS0 = ocean_state["S"][-1]
        fluxes = fluxes._replace(
            Q_S=fluxes.Q_S - SSS0 * R / RHO_FRESH
            * model.ocean.grid.wet_c[-1])

    if model.normalize_salinity:
        from ..core.halo import global_sum
        grid0 = model.ocean.grid
        # INTERIOR-masked reduction: the padded wet mask is wet in
        # periodic-wrap and fold halos, so a plain wet-masked sum (a)
        # double-counts wrap cells and (b) ingests halo scratch — the
        # round-4 year run died at day 302 when the ice thermodynamics
        # NaN'd a fold-halo cell and this global mean spread it to every
        # ocean cell within one step.
        Hh = grid0.H
        interior = jnp.zeros(grid0.az_cc.shape, grid0.az_cc.dtype).at[
            ..., Hh:Hh + grid0.Ny, Hh:Hh + grid0.Nx].set(1.0)
        wet2 = grid0.wet_c[-1] * interior
        area = global_sum(grid0.az_cc * wet2)
        # mask by SELECTION, not multiplication: halo scratch can hold
        # inf/NaN, and 0·inf = NaN would ride the global sum into every
        # ocean cell (exactly the day-302 class this mask exists to stop)
        QS_int = jnp.where(wet2 > 0, fluxes.Q_S, 0.0)
        mean_QS = global_sum(QS_int * grid0.az_cc) / area
        fluxes = fluxes._replace(Q_S=fluxes.Q_S - mean_QS)

    # Halo hygiene: the assembled fluxes must carry VALID halos into the
    # ocean step — the split-explicit forcing GU/GV is flux-derived and the
    # deferred-fill barotropic loop consumes its halo ring values, so halo
    # scratch here reaches interior η/U within one substep (the
    # 1e30-poison invariant test catches exactly this). Fluxes are
    # pointwise functions of the prognostic state, so copying wrapped/fold
    # interior values is exactly what computing on clean halos would give
    # (the fold's vector sign riding the u/v fills).
    from ..core.halo import fill_halos as _fh
    grid0 = model.ocean.grid
    fluxes = fluxes._replace(
        tau_x=_fh(fluxes.tau_x, grid0, "u", vector=True),
        tau_y=_fh(fluxes.tau_y, grid0, "v", vector=True),
        Q_T=_fh(fluxes.Q_T, grid0),
        Q_S=_fh(fluxes.Q_S, grid0),
        Q_sw=_fh(fluxes.Q_sw, grid0),
        ice_fraction=None if fluxes.ice_fraction is None
        else _fh(fluxes.ice_fraction, grid0),
    )
    ocean_new = hyd.step(model.ocean, ocean_state, fluxes, dt,
                         t=t + t_offset)
    # minimum-salinity clamp (omip_simulation.jl ocean_minimum_salinity = 1)
    ocean_new["S"] = jnp.maximum(ocean_new["S"], model.ocean_minimum_salinity
                                 * model.ocean.grid.wet_c)
    if model.sea_ice is not None:
        # COLUMN frazil: any sub-freezing water anywhere in the column
        # releases latent heat back to the freezing point and the deficit
        # becomes new surface ice (reference: ClimaSeaIce frazil coupling;
        # NEMO does the same column sweep). The slab model's surface
        # supercool term only guards the TOP cell — without this, deep
        # supercooled cells (e.g. brine-convection at coastal rim cells,
        # measured T→−21 °C at 1°) cool without bound.
        from . import sea_ice as si
        grid = model.ocean.grid
        Tf3 = si.freezing_temperature(ocean_new["S"])
        deficit = jnp.maximum(Tf3 - ocean_new["T"], 0.0) * grid.wet_c
        ocean_new["T"] = ocean_new["T"] + deficit
        dz3 = grid.dz_c[:, None, None]
        frazil_heat = jnp.sum(deficit * dz3, axis=0) / dt   # K·m/s into ocean
        frazil = (jnp.sum(deficit * dz3, axis=0) * RHO_OCEAN * CP_OCEAN
                  / (si.RHO_ICE * si.L_FUSION))
        ice = new_state["sea_ice"]
        a0 = ice["concentration"]
        new_state["sea_ice"] = dict(
            ice,
            thickness=jnp.clip(ice["thickness"] + frazil, 0.0, 20.0),
            concentration=jnp.clip(a0 + (1.0 - a0) * frazil / si.H_NEW_ICE,
                                   0.0, 1.0))
    new_state["ocean"] = ocean_new
    # flux decomposition diagnostics mirroring the reference's
    # `interfaces.net_fluxes` accessors (omip_diagnostics.jl:84-89):
    # atmosphere_ocean_* is the open-water share, sea_ice_ocean_* the
    # under-ice share, frazil_* the column supercooling heat release
    decomp = {}
    if model.sea_ice is not None:
        decomp = {
            "frazil_temperature_flux": frazil_heat,
            "sea_ice_ocean_temperature_flux": fluxes.Q_T - open_Q_T,
            "atmosphere_ocean_temperature_flux": open_Q_T,
            "sea_ice_ocean_salinity_flux": fluxes.Q_S - open_Q_S,
        }
    new_state["net_fluxes"] = {"tau_x": fluxes.tau_x, "tau_y": fluxes.tau_y,
                               "Q_T": fluxes.Q_T, "Q_S": fluxes.Q_S,
                               "Q_sw": fluxes.Q_sw, **diags, **decomp}
    return new_state


def _jit_multi_step(n_steps, donate):
    """Jitted ``(model, state, t0, dt) -> state`` advancing ``n_steps``
    coupled steps in one `lax.scan` dispatch — amortizes host dispatch
    latency (large over the tunneled-TPU transport) and lets XLA overlap
    steps."""
    def multi(model, state, t0, dt, t_offset=0.0):
        # first step outside the scan: it adds the net-flux diagnostics to
        # the state, and the scan carry must have a fixed structure
        state = coupled_step(model, state, t0, dt, t_offset)

        def body(s, i):
            return coupled_step(model, s, t0 + i * dt, dt, t_offset), None

        out, _ = jax.lax.scan(body, state,
                              jnp.arange(1, n_steps, dtype=jnp.float32))
        return out

    return jax.jit(multi, donate_argnums=(1,) if donate else ())


def _with_window(model, prefetcher, t, t_end):
    """Swap the model's atmosphere for the prefetcher's window covering
    [t, t_end]; returns (model', t_relative). Same array shapes every
    window → the jit cache hits, so the swap costs nothing on device."""
    import dataclasses
    win, t_ref = prefetcher.window_for(t, t_end)
    return dataclasses.replace(model, atmosphere=win), t - t_ref


def rotate_restoring(closures, t):
    """Rotate any time-varying restoring closures whose device window no
    longer covers the absolute time ``t`` (`TimeVaryingDatasetRestoring.
    refreshed` — a host-side no-op when covered). Returns the SAME tuple
    object when nothing rotated, so callers can cache by identity."""
    new = tuple(c.refreshed(t) if hasattr(c, "refreshed") else c
                for c in closures)
    return closures if all(a is b for a, b in zip(new, closures)) else new


def make_forcing_resolver(model, prefetcher):
    """Per-dispatch forcing resolution: atmosphere window swap (prefetcher)
    + automatic restoring-window rotation — the reference's transparent
    `DatasetRestoring(metadata; time_indices_in_memory)` time-series
    serving (SURVEY.md §2b DataWrangling row). Returns ``resolve(t, t_end)
    -> (model', t_relative)``. Both swaps keep array shapes, so the jitted
    step's cache hits. The rotated closure tuple is carried between
    dispatches (the loader's coverage bounds track the LATEST window, so
    rotation must always start from the last rotated instance)."""
    import dataclasses
    cur = {"closures": getattr(model.ocean, "closures", ()),
           "land": model.land}

    def resolve(t, t_end):
        m, t_eff = (model, t) if prefetcher is None else \
            _with_window(model, prefetcher, t, t_end)
        cur["closures"] = rotate_restoring(cur["closures"], t)
        if cur["closures"] is not getattr(model.ocean, "closures", ()):
            m = dataclasses.replace(
                m, ocean=dataclasses.replace(m.ocean,
                                             closures=cur["closures"]))
        # land freshwater window rides the same refreshed(t) rotation
        if cur["land"] is not None and hasattr(cur["land"], "refreshed"):
            cur["land"] = cur["land"].refreshed(t)
        if cur["land"] is not model.land:
            m = dataclasses.replace(m, land=cur["land"])
        return m, t_eff

    return resolve


def make_multi_step_fn(model, n_steps, donate=False, prefetcher=None):
    """Donation is measured perf-NEUTRAL on the TPU target (94.1 vs 93.8
    ms/step on the 1/4-degree coupled benchmark with properly-flushed
    timing); default False so callers can reuse the input state (e.g.
    writers snapshotting the pre-step state), since HBM is not the
    constraint (the extra state copy is ~0.3 GB)."""
    jitted = _jit_multi_step(n_steps, donate)
    resolve = make_forcing_resolver(model, prefetcher)

    def f(state, t0, dt):
        m, t_eff = resolve(t0, t0 + n_steps * dt)
        return jitted(m, state, t_eff, dt, t0 - t_eff)

    return f


def make_batched_step_fn(model, donate=False, prefetcher=None):
    """``(state, t, dt, n) -> state`` for `Simulation`'s dispatch batching:
    one `lax.scan` dispatch per ``n`` coupled steps, with the jitted scan
    cached per distinct ``n`` (the driver only ever uses one batch size,
    so this compiles once)."""
    cache = {}
    resolve = make_forcing_resolver(model, prefetcher)

    def f(state, t, dt, n):
        fn = cache.get(n)
        if fn is None:
            fn = cache.setdefault(n, _jit_multi_step(n, donate))
        m, t_eff = resolve(t, t + n * dt)
        return fn(m, state, t_eff, dt, t - t_eff)

    return f


def make_coupled_step_fn(model, donate=False, prefetcher=None):
    """Jitted ``(state, t, dt) -> state``. The model pytree is passed as an
    argument on every call (arrays already live on device — this is free)
    so its leaves are HLO parameters, never embedded literals. With a
    ``prefetcher``, the atmosphere window is swapped in per dispatch and
    time is passed window-relative (multi-year runs keep full float32 time
    precision and bounded HBM — reference `atmosphere.jl:22-27`)."""
    jitted = jax.jit(coupled_step, donate_argnums=(1,) if donate else ())
    resolve = make_forcing_resolver(model, prefetcher)

    def f(state, t, dt):
        m, t_eff = resolve(t, t + dt)
        return jitted(m, state, t_eff, dt, t - t_eff)

    return f
