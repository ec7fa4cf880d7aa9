"""Tripolar ocean configurations.

TPU-native rebuild of the reference's tripolar constructors with their
exact defaults (SURVEY.md §2a):

* `one_degree_tripolar_ocean` (`one_degree_tripolar.jl`): 360×180,
  WENOVectorInvariant(5)/WENO(5), CATKE + GM(κ_skew=500, κ_sym=200) +
  biharmonic(15 days) + background, substeps=70, minimum_depth=10,
  interpolation_passes=10, major_basins=2.
* `half_degree_tripolar_ocean` (`half_degree_tripolar.jl`): 720×360,
  WENO(5)/WENO(7), biharmonic 40 days, substeps=150, minimum_depth=20,
  passes=25, major_basins=1.
* `sixth_degree_tripolar_ocean` (`sixth_degree_tripolar.jl`): 2160×1080,
  substeps=300, passes=40, CATKE + Henyey only (no GM at eddy-permitting
  resolution).
* `tenth_degree_tripolar_ocean` (`tenth_degree_tripolar.jl`): 3600×1800,
  Nz=100, depth 5500, substeps=70.

"""

from __future__ import annotations

from ..closures.catke import CATKEVerticalDiffusivity
from ..closures.scalar_diffusivity import (HorizontalScalarBiharmonicDiffusivity,
                                           VerticalScalarDiffusivity,
                                           henyey_diffusivity)
from ..data.bathymetry import regrid_bathymetry
from ..data.metadata import Metadatum, WOAAnnual, set_fields
from ..grids.grid import with_bottom_height
from ..grids.tripolar import dry_unresolvable_cells, tripolar_grid
from ..utils.units import days
from .ocean import ocean_simulation, vertical_coordinate


def _tripolar_closure(biharmonic_timescale, kappa_skew=None, kappa_symmetric=None):
    closures = [CATKEVerticalDiffusivity()]
    if kappa_skew is not None:
        from ..closures.gm_redi import IsopycnalSkewSymmetricDiffusivity
        closures.append(IsopycnalSkewSymmetricDiffusivity(
            kappa_skew=kappa_skew, kappa_symmetric=kappa_symmetric or 0.0))
    if biharmonic_timescale is not None:
        closures.append(HorizontalScalarBiharmonicDiffusivity(
            timescale=biharmonic_timescale))
    closures.append(VerticalScalarDiffusivity(
        nu=3e-5, kappa=lambda lat, z: henyey_diffusivity(lat)))
    return tuple(closures)


def _build(Nx, Ny, Nz, depth, halo, substeps, minimum_depth, passes, basins,
           momentum_order, tracer_order, biharmonic_timescale,
           kappa_skew=None, kappa_symmetric=None, closure=None,
           initialize=True, zstar=False, dir=".", fold_alignment_px=None,
           weno_weights="zweno"):
    grid = tripolar_grid((Nx, Ny, Nz), southernmost_latitude=-80.0, halo=halo,
                         z=vertical_coordinate(Nz, depth, zstar),
                         fold_alignment_px=fold_alignment_px)
    bottom = regrid_bathymetry(grid, minimum_depth=minimum_depth,
                               major_basins=basins,
                               interpolation_passes=passes, dir=dir)
    # the synthetic bathymetry does not guarantee the tripolar poles sit
    # over land like eORCA's does — dry the CFL-unresolvable pole caps,
    # then re-apply the basin filter so cap-drying cannot leave isolated
    # wet puddles (they cool without limit in ocean-only runs)
    bottom = dry_unresolvable_cells(grid, bottom)
    if basins is not None:
        from ..data.bathymetry import keep_major_basins
        bottom = keep_major_basins(bottom, basins, grid.periodic_x)
    grid = with_bottom_height(grid, bottom, minimum_depth=minimum_depth)
    model = ocean_simulation(
        grid,
        closure=closure or _tripolar_closure(biharmonic_timescale,
                                             kappa_skew, kappa_symmetric),
        momentum_advection="weno_vector_invariant",
        momentum_order=momentum_order, tracer_order=tracer_order,
        free_surface_substeps=substeps, zstar=zstar,
        weno_weights=weno_weights)
    state = model.initial_state()
    if initialize:
        state = set_fields(state, grid,
                           T=Metadatum("temperature", dataset=WOAAnnual(), dir=dir),
                           S=Metadatum("salinity", dataset=WOAAnnual(), dir=dir))
    return model, state


def one_degree_tripolar_ocean(Nz=60, depth=6000.0, **kw):
    kw.setdefault("kappa_skew", 500.0)
    kw.setdefault("kappa_symmetric", 200.0)
    return _build(360, 180, Nz, depth, halo=4, substeps=70, minimum_depth=10,
                  passes=10, basins=2, momentum_order=5, tracer_order=5,
                  biharmonic_timescale=15 * days, **kw)


def half_degree_tripolar_ocean(Nz=60, depth=6000.0, **kw):
    kw.setdefault("weno_weights", "normal_division")   # omip_simulation.jl:563
    return _build(720, 360, Nz, depth, halo=5, substeps=150, minimum_depth=20,
                  passes=25, basins=1, momentum_order=5, tracer_order=7,
                  biharmonic_timescale=40 * days, **kw)


def sixth_degree_tripolar_ocean(Nz=60, depth=6000.0, **kw):
    return _build(2160, 1080, Nz, depth, halo=5, substeps=300, minimum_depth=20,
                  passes=40, basins=1, momentum_order=5, tracer_order=7,
                  biharmonic_timescale=None, **kw)


def tenth_degree_tripolar_ocean(Nz=100, depth=5500.0, **kw):
    kw.setdefault("weno_weights", "normal_division")   # omip_simulation.jl:564
    return _build(3600, 1800, Nz, depth, halo=5, substeps=70, minimum_depth=20,
                  passes=40, basins=1, momentum_order=5, tracer_order=7,
                  biharmonic_timescale=None, **kw)


def tripolar_ocean(Nx=48, Ny=24, Nz=4, depth=3000.0, halo=4, substeps=8,
                   **kw):
    """Arbitrary-size tripolar builder (test/dryrun scale): the same
    composition as the production constructors (conformal fold, synthetic
    bathymetry with cap drying, WENO vector-invariant momentum) on a grid
    small enough for the faked 8-device CPU mesh — used by the distributed
    OMIP protocol tests and `dryrun_multichip` (the reference's production
    distributed runs are tripolar: `sixth_degree_tripolar_ocean_sea_ice.jl:22`,
    `pbs_launch.sh:51`)."""
    kw.setdefault("kappa_skew", 500.0)
    kw.setdefault("kappa_symmetric", 200.0)
    return _build(Nx, Ny, Nz, depth, halo=halo, substeps=substeps,
                  minimum_depth=10, passes=2, basins=None, momentum_order=5,
                  tracer_order=5, biharmonic_timescale=15 * days, **kw)
