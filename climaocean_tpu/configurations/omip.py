"""OMIP experiment protocol — the reference's top-level product.

TPU-native rebuild of `src/OMIPConfigurations/omip_simulation.jl` (691 LoC;
SURVEY.md §2a, call stack §3.1): the `omip_simulation(config)` builder with
the 6-way vertical-closure selector (`omip_closure`, :442-496), the three
flux configurations (:default/:corrected/:ncar — `build_coupled_model`,
:123-164), global salinity-flux normalization (:182-220), JRA55-style
forcing (`atmosphere.jl`), the progress callback with the STATE_HASH
determinism probe (:644-691), and the OMIP diagnostics wiring.
"""

from __future__ import annotations

import hashlib
import time as _time

import numpy as np

from ..closures.catke import CATKEVerticalDiffusivity
from ..closures.kpp import KPPVerticalDiffusivity
from ..closures.nemo_tke import NEMOTKEVerticalDiffusivity
from ..closures.ri_based import RiBasedVerticalDiffusivity
from ..closures.scalar_diffusivity import (
    ConvectiveAdjustmentVerticalDiffusivity, HorizontalScalarBiharmonicDiffusivity,
    VerticalScalarDiffusivity, henyey_diffusivity, step_kappa_simple,
    step_nu_simple)
from ..coupler.atmosphere import synthetic_prescribed_atmosphere
from ..coupler.similarity_theory import (CoefficientBasedFluxes,
                                         SimilarityTheoryFluxes)
from ..models.coupled import OceanSeaIceModel, make_coupled_step_fn
from ..models.sea_ice import SeaIceModel, default_ice_atmosphere_fluxes
from ..simulation.diagnostics import add_omip_diagnostics
from ..simulation.simulation import IterationInterval, Simulation
from ..utils.units import days, minutes, prettytime
from . import tripolar as tri
from .ocean import latitude_longitude_ocean


def omip_closure(vertical_closure="catke", kappa_skew=500.0,
                 kappa_symmetric=200.0, Cb=0.28, biharmonic_timescale=15 * days,
                 biharmonic_viscosity=None, CWu=None):
    """Reference `omip_closure` (`omip_simulation.jl:442-496`): primary
    vertical closure + optional GM + biharmonic + background κ/ν."""
    name = str(vertical_closure).lstrip(":")
    if name == "catke":
        kw = {"Cb": Cb}
        if CWu is not None:
            kw["CWu"] = CWu
        primary = CATKEVerticalDiffusivity(**kw)
        background = VerticalScalarDiffusivity(
            nu=3e-5, kappa=lambda lat, z: henyey_diffusivity(lat))
    elif name == "simple":
        primary = ConvectiveAdjustmentVerticalDiffusivity(kappa_z=1.0, nu_z=1.0)
        background = VerticalScalarDiffusivity(
            nu=lambda lat, z: step_nu_simple(z),
            kappa=lambda lat, z: step_kappa_simple(z))
    elif name == "rbvd":
        primary = RiBasedVerticalDiffusivity()
        background = VerticalScalarDiffusivity(
            nu=1e-4, kappa=lambda lat, z: henyey_diffusivity(lat))
    elif name == "nori":
        # distinct 7th closure (reference `omip_simulation.jl:465-466`):
        # standalone — NO background closure, mirroring the reference's
        # `NORiBaseVerticalDiffusivity(), nothing`
        from ..closures.nori import NORiBaseVerticalDiffusivity
        primary, background = NORiBaseVerticalDiffusivity(), None
    elif name == "kpp":
        primary, background = KPPVerticalDiffusivity(), None
    elif name == "nemo_tke":
        primary, background = NEMOTKEVerticalDiffusivity(), None
    else:
        raise ValueError(f"Unknown vertical_closure: {vertical_closure}. "
                         "Options: catke, simple, nori, rbvd, kpp, nemo_tke")

    eddy = None
    if kappa_skew is not None and kappa_symmetric is not None:
        from ..closures.gm_redi import IsopycnalSkewSymmetricDiffusivity
        eddy = IsopycnalSkewSymmetricDiffusivity(kappa_skew=kappa_skew,
                                                 kappa_symmetric=kappa_symmetric)

    horizontal = None
    if biharmonic_viscosity is not None:
        horizontal = HorizontalScalarBiharmonicDiffusivity(nu=biharmonic_viscosity)
    elif biharmonic_timescale is not None:
        horizontal = HorizontalScalarBiharmonicDiffusivity(
            timescale=biharmonic_timescale)

    return tuple(c for c in (primary, eddy, horizontal, background)
                 if c is not None)


def atmosphere_ocean_flux_solver(flux_configuration="default"):
    """Reference flux configurations (`omip_simulation.jl:40-113,123-164`)."""
    name = str(flux_configuration).lstrip(":")
    if name in ("default", "corrected"):
        # COARE-3.6-consistent: wind-dependent Charnock, COARE log profile,
        # minimum gustiness 0.5 m/s, T-dependent air viscosity
        return SimilarityTheoryFluxes(minimum_gustiness=0.5)
    if name == "ncar":
        # Large & Yeager coefficient-based, FixedIterations(5)
        return CoefficientBasedFluxes(iterations=5)
    raise ValueError(f"Unknown flux_configuration: {flux_configuration}")


def omip_forcing(grid, start_time=0.0, end_time=10 * days, forcing_dir=None,
                 time_indices_in_memory=None, repeat_year=False):
    """Reference `omip_forcing` (`atmosphere.jl:13-49`): JRA55-do
    atmosphere + radiation. The land member of the reference's triple
    (rivers + iceberg calving) is built by `omip_land_forcing` below.

    Returns ``(window, prefetcher)``. When ``forcing_dir`` holds JRA55-
    style NetCDF files (one per shortname per year, reference
    `jra55_data_staging.jl:8`) and ``time_indices_in_memory`` is set, the
    windows are served by the multi-year file backend through a
    `PrefetchingAtmosphere` — bounded HBM, background refill, exactly
    `JRA55PrescribedAtmosphere(arch; dir, dataset=MultiYearJRA55()/
    RepeatYearJRA55(), time_indices_in_memory, prefetch=true)`
    (`atmosphere.jl:22-27`). ``prefetcher`` is None for short runs that
    fit one device window. Zero-egress default is the analytic proxy at
    the JRA55 3-hour cadence (also windowed when the run is long)."""
    from ..coupler.prefetch import PrefetchingAtmosphere

    if forcing_dir is not None:
        from ..data.netcdf import find_netcdf
        if find_netcdf(forcing_dir, "tas") is None:
            # the caller POINTED at a forcing directory; silently running a
            # production protocol on analytic forcing would be a very
            # expensive mistake (mirrors data.metadata.load_native)
            import warnings
            warnings.warn(
                f"forcing_dir='{forcing_dir}' holds no JRA55-style NetCDF "
                "(no 'tas' file found) — falling back to the SYNTHETIC "
                "atmosphere proxy (set CLIMAOCEAN_STRICT_DATA=1 to make "
                "this an error)", stacklevel=2)
            from ..data.metadata import _strict_data
            if _strict_data():
                raise FileNotFoundError(
                    f"no JRA55 forcing files under '{forcing_dir}' and "
                    "strict data mode is on")
        else:
            if time_indices_in_memory is not None:
                pf = PrefetchingAtmosphere.from_files(
                    grid, forcing_dir,
                    time_indices_in_memory=time_indices_in_memory,
                    repeat_year=repeat_year, t_start=start_time)
                win, _ = pf.window_for(start_time)
                return win, pf
            from ..coupler.atmosphere import netcdf_prescribed_atmosphere
            return netcdf_prescribed_atmosphere(grid, forcing_dir), None
    if end_time - start_time > 45 * days:
        pf = PrefetchingAtmosphere.synthetic(grid,
                                             window_length=30 * days,
                                             t_start=start_time)
        win, _ = pf.window_for(start_time)
        return win, pf
    return synthetic_prescribed_atmosphere(grid, start_time, end_time), None


def omip_land_forcing(grid, forcing_dir=None, prefetcher=None,
                      start_time=0.0, end_time=None, land="auto"):
    """The land member of the reference's forcing triple
    (`atmosphere.jl:46` `JRA55PrescribedLand(arch; kw...)`): river runoff
    (friver) + iceberg calving (licalvf) as a coastal freshwater flux.

    ``land``: "auto" (files when present, else the loud synthetic coastal
    proxy), True (same), False/None (off). Returns a `PrescribedLand` or
    None."""
    if land in (False, None):
        return None
    from ..coupler.land import (jra55_prescribed_land,
                                synthetic_prescribed_land)
    backend = getattr(prefetcher, "backend", None)
    if backend is not None and any(sn in backend.index
                                   for sn in ("friver", "licalvf")):
        return jra55_prescribed_land(grid, backend, t=start_time)
    if forcing_dir is not None:
        from ..data.netcdf import find_netcdf
        if find_netcdf(forcing_dir, "friver") is not None:
            try:
                from ..coupler.jra55 import JRA55FileAtmosphere
                be = JRA55FileAtmosphere(grid, forcing_dir)
                return jra55_prescribed_land(grid, be, t=start_time)
            except Exception as e:
                # e.g. friver files present but the full atmosphere set
                # absent (the backend requires it) — land='auto' promises
                # a fallback, not a crash
                import warnings
                warnings.warn(f"could not build file-backed land forcing "
                              f"({e}) — using the synthetic coastal proxy",
                              stacklevel=2)
    import warnings
    warnings.warn("no friver/licalvf files — using the SYNTHETIC coastal "
                  "runoff proxy (set CLIMAOCEAN_STRICT_DATA=1 to make "
                  "this an error)", stacklevel=2)
    from ..data.metadata import _strict_data
    if _strict_data():
        raise FileNotFoundError("no JRA55 land (friver/licalvf) files and "
                                "strict data mode is on")
    return synthetic_prescribed_land(grid, start_time,
                                     end_time or start_time + 365 * days)


def _orca_builder(**kw):
    from .orca import orca_ocean
    return orca_ocean(**kw)


_CONFIG_BUILDERS = {
    "latlon": lambda **kw: latitude_longitude_ocean(
        **{"resolution": 1.0, **kw}),
    "onedegree": tri.one_degree_tripolar_ocean,
    # arbitrary-size tripolar (test/dryrun scale — distributed protocol
    # coverage on the faked mesh; production constructors below)
    "tripolar": tri.tripolar_ocean,
    "halfdegree": tri.half_degree_tripolar_ocean,
    "sixthdegree": tri.sixth_degree_tripolar_ocean,
    "tenthdegree": tri.tenth_degree_tripolar_ocean,
    # eORCA1 mesh, Δt = 30 min / Nz = 70 in OMIP production (reference
    # `omip_simulation.jl:235,562-568`, `launch.sh:157-162`)
    "orca": _orca_builder,
}


def omip_simulation(config="halfdegree", dt=30 * minutes, stop_time=None,
                    stop_iteration=None, vertical_closure="catke",
                    flux_configuration="default", with_sea_ice=True,
                    sea_ice_dynamics=True, normalize_salinity=True,
                    salinity_restoring=True, piston_velocity=0.5,
                    restoring=None,
                    diagnostics=True, output_dir="output",
                    forcing_end_time=None, forcing_dir=None, staging_dir=None,
                    time_indices_in_memory=240, repeat_year=False,
                    progress_interval=10, Nz=None, steps_per_dispatch=None,
                    partition=None, diagnostics_kw=None, land="auto",
                    **config_kw):
    """Reference `omip_simulation` (`omip_simulation.jl:292-403`): build the
    coupled OMIP simulation for a named grid configuration. Returns a
    `Simulation` with progress (+STATE_HASH) callback and, when
    ``diagnostics=True``, the OMIP writers attached.

    ``partition=(Py, Px)`` runs the FULL protocol distributed — the
    reference's `omip_simulation(...; arch=Distributed(GPU(),
    partition=Partition(Rx, Ry)))` production composition (`launch.sh:165`
    Partition(1,4), `pbs_launch.sh:51,71` Partition(1,8)): the coupled step
    (and its dispatch batching) runs under `shard_map` with ppermute halo
    exchange over a (Py, Px) ('y','x') device mesh; writers, checkpointing
    (+`pickup`), progress, staging, and the forcing prefetcher all operate
    on the global state through a `GlobalStateView` (unpartition at fire
    time, rank-0 writes)."""
    import jax.numpy as jnp

    name = str(config).lstrip(":")
    builder = _CONFIG_BUILDERS[name]
    kw = dict(config_kw)
    if Nz is not None:
        kw["Nz"] = Nz
    kw["closure"] = omip_closure(vertical_closure)
    if partition is not None and name in ("tripolar", "onedegree",
                                          "halfdegree", "sixthdegree",
                                          "tenthdegree"):
        # distributed tripolar: snap the fold pivot so the fold exchange
        # is tile-aligned under the (py, px) mesh (`parallel.shard`
        # requires nx_loc | 2p; `tripolar_grid(fold_alignment_px=...)`)
        kw.setdefault("fold_alignment_px", int(partition[1]))
    ocean_model, ocean_state = builder(**kw)
    grid = ocean_model.grid

    # OMIP-level tracer-advection override: the reference replaces every
    # config's tracer scheme with WENO(order=7, minimum_buffer_upwind_order=3,
    # NormalDivision) (`omip_simulation.jl:600`) — momentum keeps the
    # per-config scheme/weights. (The buffer≥3 near-boundary behavior is the
    # dry-substencil ENO penalty in `advection/weno.py`.)
    import dataclasses
    ocean_model = dataclasses.replace(ocean_model, tracer_order=7,
                                      tracer_weno_weights="normal_division")

    if salinity_restoring:
        # WOA surface-salinity piston restoring rides the closure tuple as an
        # additional surface flux (reference `additional_surface_fluxes`,
        # `omip_simulation.jl:507-523`)
        from ..data.restoring import woa_salinity_restoring
        sss = woa_salinity_restoring(grid, piston_velocity)
        ocean_model = dataclasses.replace(
            ocean_model, closures=ocean_model.closures + (sss,))

    if restoring is not None:
        # interior time-series nudging — the reference's
        # `DatasetRestoring(metadata, arch; rate, time_indices_in_memory)`
        # attached through the forcing path. Accepts a built
        # `TimeVaryingDatasetRestoring`, a `Metadata` date range, or a dict
        # of `dataset_restoring` kwargs (metadata=..., rate=...,
        # time_indices_in_memory=...). The run loop rotates its device
        # window automatically at dispatch boundaries
        # (`models.coupled.make_forcing_resolver`).
        from ..data.restoring import (TimeVaryingDatasetRestoring,
                                      dataset_restoring)
        items = restoring if isinstance(restoring, (list, tuple)) \
            else [restoring]
        built = []
        for r in items:
            if isinstance(r, TimeVaryingDatasetRestoring):
                built.append(r)
            elif isinstance(r, dict):
                built.append(dataset_restoring(grid, **r))
            else:
                built.append(dataset_restoring(grid, r,
                                               time_indices_in_memory=2))
        ocean_model = dataclasses.replace(
            ocean_model, closures=ocean_model.closures + tuple(built))

    sea_ice = None
    if with_sea_ice:
        sea_ice = SeaIceModel(grid=grid, dynamics=sea_ice_dynamics,
                              atmosphere_fluxes=default_ice_atmosphere_fluxes())

    staging_cb = None
    if forcing_dir is not None and staging_dir is not None:
        # two-tier storage: read forcing through the fast-scratch staging
        # farm; the callback copies years ahead of the clock (reference
        # `setup_staging_directory` + JRA55DataStagingCallback at
        # IterationInterval(1440), `omip_simulation.jl:348,377-382`).
        # Window builds re-resolve file paths, so background refills pick
        # up freshly staged fast copies as the run advances.
        from ..data.staging import JRA55DataStagingCallback
        staging_cb = JRA55DataStagingCallback(forcing_dir, staging_dir)
        forcing_dir = staging_dir
    # forcing must cover the whole run: with stop_iteration-only runs the
    # end time is iteration-derived (a clamped window would freeze the
    # diurnal/seasonal cycle past its edge)
    run_end = stop_time if stop_time is not None else \
        (stop_iteration * dt if stop_iteration is not None else 30 * days)
    atmos, prefetcher = omip_forcing(
        grid, 0.0, forcing_end_time or run_end + days,
        forcing_dir=forcing_dir,
        time_indices_in_memory=time_indices_in_memory,
        repeat_year=repeat_year)
    land_component = omip_land_forcing(
        grid, forcing_dir=forcing_dir, prefetcher=prefetcher,
        start_time=0.0, end_time=forcing_end_time or run_end + days,
        land=land)
    model = OceanSeaIceModel(
        ocean=ocean_model, atmosphere=atmos, sea_ice=sea_ice, land=land_component,
        atmosphere_ocean_fluxes=atmosphere_ocean_flux_solver(flux_configuration),
        # in-step global-mean subtraction (reference NormalizeSalinity,
        # omip_simulation.jl:182-220) — fused into the jitted step so the
        # run loop stays batchable (no per-iteration host callback)
        normalize_salinity=normalize_salinity)

    state = model.initial_state()
    state["ocean"] = ocean_state
    if with_sea_ice:
        from ..data.metadata import ECCO4Monthly, Metadatum, set_fields
        state["sea_ice"] = set_fields(
            state["sea_ice"], grid,
            thickness=Metadatum("sea_ice_thickness", dataset=ECCO4Monthly()),
            concentration=Metadatum("sea_ice_concentration", dataset=ECCO4Monthly()))

    if steps_per_dispatch is None:
        # unconditional: the EVP-inside-multi-step-scan TPU InvalidArgument
        # (ROUND_NOTES r1 gap 4) no longer reproduces — re-verified at the
        # production shape (1° tripolar, Nz=60, EVP substeps=100, batch 8)
        # on TPU v5 lite in round 3
        steps_per_dispatch = 8
    if partition is not None:
        import jax
        from ..parallel.mesh import make_mesh
        from ..parallel.shard import make_sharded_batched_step_fn
        from ..simulation.simulation import GlobalStateView
        py, px = partition
        mesh = make_mesh(shape=(py, px), devices=jax.devices()[:py * px])
        batched, part, unpart = make_sharded_batched_step_fn(
            model, mesh, donate=False, prefetcher=prefetcher)
        sim = Simulation(lambda s, t, d: batched(s, t, d, 1), part(state),
                         dt=dt, stop_time=stop_time,
                         stop_iteration=stop_iteration,
                         multi_step_fn=batched,
                         batch_size=steps_per_dispatch)
        sim.callback_view = GlobalStateView(sim, unpart)
        sim._partition_state = part
        sim.mesh = mesh
    else:
        step = make_coupled_step_fn(model, donate=False,
                                    prefetcher=prefetcher)
        from ..models.coupled import make_batched_step_fn
        sim = Simulation(lambda s, t, d: step(s, t, d), state, dt=dt,
                         stop_time=stop_time, stop_iteration=stop_iteration,
                         multi_step_fn=make_batched_step_fn(
                             model, donate=False, prefetcher=prefetcher),
                         batch_size=steps_per_dispatch)
    sim.prefetcher = prefetcher
    sim.add_callback(omip_progress_callback(grid),
                     IterationInterval(progress_interval), name="progress")
    if staging_cb is not None:
        sim.add_callback(staging_cb, IterationInterval(1440),
                         name="jra55_staging")
        staging_cb(sim)          # prime current + next year at startup
    if diagnostics:
        add_omip_diagnostics(sim, grid, dir=output_dir,
                             **(diagnostics_kw or {}))
    sim.model = model
    return sim


def omip_progress_callback(grid, hash_iterations=(1, 5, 100, 1000)):
    """Reference `omip_progress_callback` (`omip_simulation.jl:644-691`):
    ice h/ℵ maxima, T/S extrema, velocity maxima, wall time — plus the
    STATE_HASH determinism probe at fixed iterations (compare two
    pickup-from-same-checkpoint runs to bisect nondeterminism)."""
    import jax.numpy as jnp

    wall = {"t": _time.time()}

    def cb(sim):
        s = sim.state
        ocean = s["ocean"]
        # INTERIOR extrema only: halo strips are scratch between deferred
        # fills (stencil wrap residue, fold ghost dynamics) and routinely
        # hold wild values that every consumer refills before reading —
        # padded-array extrema once "diagnosed" a 104 °C blowup in a
        # perfectly healthy run (round-4 year validation)
        cut = grid.interior
        msgs = [f"time: {prettytime(sim.time)}", f"iteration: {sim.iteration}",
                f"Δt: {prettytime(sim.dt)}"]
        if "sea_ice" in s and s["sea_ice"] is not None:
            ice = s["sea_ice"]
            msgs.append(f"max(h): {float(jnp.max(cut(ice['thickness']))):.2e} m")
            msgs.append(
                f"max(ℵ): {float(jnp.max(cut(ice['concentration']))):.2e}")
        T_i, S_i = cut(ocean["T"]), cut(ocean["S"])
        msgs.append(f"extrema(T): ({float(jnp.min(T_i)):.2f}, "
                    f"{float(jnp.max(T_i)):.2f}) °C")
        msgs.append(f"extrema(S): ({float(jnp.min(S_i)):.2f}, "
                    f"{float(jnp.max(S_i)):.2f})")
        msgs.append(f"max|u|: {float(jnp.max(jnp.abs(cut(ocean['u'])))):.2e}")
        msgs.append(f"max|v|: {float(jnp.max(jnp.abs(cut(ocean['v'])))):.2e}")
        now = _time.time()
        msgs.append(f"wall time: {prettytime(now - wall['t'])}")
        wall["t"] = now
        print(", ".join(msgs), flush=True)

        if sim.iteration in hash_iterations:
            hashes = []
            for name, arr in (("T", ocean["T"]), ("S", ocean["S"]),
                              ("u", ocean["u"])):
                h = hashlib.sha256(np.asarray(arr).tobytes()).hexdigest()[:16]
                hashes.append(f"{name}={h}")
            if "sea_ice" in s and s["sea_ice"] is not None:
                h = hashlib.sha256(
                    np.asarray(s["sea_ice"]["thickness"]).tobytes()).hexdigest()[:16]
                hashes.append(f"h={h}")
            print(f"STATE_HASH iter={sim.iteration}  " + "  ".join(hashes),
                  flush=True)

    return cb
