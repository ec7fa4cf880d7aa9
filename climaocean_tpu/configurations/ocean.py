"""Ocean configuration constructors.

TPU-native rebuild of the reference's `OceanConfigurations` layer
(`/root/reference/src/OceanConfigurations/`): turnkey realistic-ocean
builders with the exact defaults tabulated in SURVEY.md §2a, on top of a
NumericalEarth-`ocean_simulation`-equivalent entry point.
"""

from __future__ import annotations

from ..closures.catke import CATKEVerticalDiffusivity
from ..closures.scalar_diffusivity import (
    ConvectiveAdjustmentVerticalDiffusivity, HorizontalScalarBiharmonicDiffusivity,
    HorizontalScalarDiffusivity, VerticalScalarDiffusivity, henyey_diffusivity,
    step_kappa_simple, step_nu_simple)
from ..data.bathymetry import regrid_bathymetry
from ..data.metadata import Metadatum, WOAAnnual, set_fields
from ..grids.grid import latitude_longitude_grid, with_bottom_height
from ..grids.vertical import ExponentialDiscretization
from ..models.hydrostatic import HydrostaticModel
from ..utils.units import days


def vertical_coordinate(Nz=60, depth=6000.0, zstar=False):
    """Reference `vertical_coordinate` (`OceanConfigurations.jl:58-60`):
    60 levels, exponential spacing, 6000 m depth."""
    return ExponentialDiscretization(Nz, -depth, 0.0, mutable=zstar)


def simplified_ocean_closure():
    """Reference `simplified_ocean_closure` (`OceanConfigurations.jl:49-54`):
    biharmonic (Az²/10 days) + convective adjustment (κ=ν=1) + step-function
    background, for memory-limited devices."""
    return (HorizontalScalarBiharmonicDiffusivity(timescale=10 * days),
            ConvectiveAdjustmentVerticalDiffusivity(kappa_z=1.0, nu_z=1.0),
            VerticalScalarDiffusivity(nu=lambda lat, z: step_nu_simple(z),
                                      kappa=lambda lat, z: step_kappa_simple(z)))


def default_latlon_closure():
    """CATKE + horizontal Laplacian ν=5e4 + Henyey background
    (`latitude_longitude.jl`)."""
    return (CATKEVerticalDiffusivity(),
            HorizontalScalarDiffusivity(nu=5e4),
            VerticalScalarDiffusivity(nu=3e-5,
                                      kappa=lambda lat, z: henyey_diffusivity(lat)))


def ocean_simulation(grid, closure=None, momentum_advection="vector_invariant",
                     momentum_order=5, tracer_order=7, free_surface_substeps=70,
                     timestepper="SplitRungeKutta3", eos=None, zstar=False,
                     weno_weights="zweno", adaptive_vertical_cfl=None):
    """NumericalEarth-`ocean_simulation` equivalent: HydrostaticModel +
    initial state with T/S tracers, TEOS-10 buoyancy, flux-storing surface
    BCs and the CATKE default closure (`default_ocean_closure`)."""
    if closure is None:
        closure = (CATKEVerticalDiffusivity(),
                   VerticalScalarDiffusivity(
                       nu=3e-5, kappa=lambda lat, z: henyey_diffusivity(lat)))
    if not isinstance(closure, tuple):
        closure = (closure,)
    model = HydrostaticModel(grid=grid, closures=closure,
                             momentum_scheme=momentum_advection,
                             momentum_order=momentum_order,
                             tracer_order=tracer_order,
                             substeps=free_surface_substeps, eos=eos,
                             zstar=zstar, timestepper=timestepper,
                             weno_weights=weno_weights,
                             adaptive_vertical_cfl=adaptive_vertical_cfl)
    return model


def latitude_longitude_ocean(resolution=1.0, Nz=60, depth=6000.0,
                             latitude=(-75.0, 75.0), closure=None,
                             minimum_depth=10.0, interpolation_passes=5,
                             major_basins=3, free_surface_substeps=70,
                             initialize=True, zstar=False, halo=5, dir="."):
    """Reference `latitude_longitude_ocean` (`latitude_longitude.jl:14-56`):
    360×150-style lat-lon grid (75°S–75°N), ETOPO immersed bathymetry
    (minimum_depth=10, passes=5, basins=3), CATKE + ν_h=5e4 + Henyey,
    VectorInvariant momentum + WENO(7) tracers. Returns (model, state)."""
    Nx = int(round(360 / resolution))
    Ny = int(round((latitude[1] - latitude[0]) / resolution))
    grid = latitude_longitude_grid(
        (Nx, Ny, Nz), longitude=(-180.0, 180.0), latitude=latitude,
        z=vertical_coordinate(Nz, depth, zstar), halo=halo)
    bottom = regrid_bathymetry(grid, minimum_depth=minimum_depth,
                               major_basins=major_basins,
                               interpolation_passes=interpolation_passes, dir=dir)
    grid = with_bottom_height(grid, bottom, minimum_depth=minimum_depth)

    model = ocean_simulation(grid, closure=closure or default_latlon_closure(),
                             momentum_advection="vector_invariant",
                             tracer_order=7,
                             free_surface_substeps=free_surface_substeps,
                             zstar=zstar)
    state = model.initial_state()
    if initialize:
        state = set_fields(state, grid,
                           T=Metadatum("temperature", dataset=WOAAnnual(), dir=dir),
                           S=Metadatum("salinity", dataset=WOAAnnual(), dir=dir))
    return model, state
