"""ORCA-mesh ocean configuration.

TPU-native rebuild of the reference's `orca_ocean`
(`/root/reference/src/OceanConfigurations/orca.jl`): the NEMO eORCA1 mesh
via `ORCAGrid(arch; dataset=ORCA1(), with_bathymetry=true)`.

The reference loads the eORCA1 coordinates + bathymetry from the ORCA1
dataset artifact. Zero-egress substitute: an `.npz` mesh file
(``orca1_mesh.npz`` with ``lon_f/lat_f`` corner arrays and
``bottom_height``) is used when present in ``dir``; otherwise the
analytically-generated tripolar grid at eORCA1-like dimensions (360×331)
with the synthetic bathymetry stands in — same topology (Arctic bipolar
fold), same API.
"""

from __future__ import annotations

import os

from ..data.bathymetry import regrid_bathymetry
from ..data.metadata import Metadatum, WOAAnnual, set_fields
from ..grids.grid import with_bottom_height
from ..grids.tripolar import dry_unresolvable_cells, tripolar_grid
from .ocean import ocean_simulation, vertical_coordinate


def ORCAGrid(dataset="ORCA1", Nz=60, depth=6000.0, halo=4,
             with_bathymetry=True, dir=".", zstar=False):
    """eORCA-style grid. File-backed when ``orca1_mesh.npz`` exists in
    ``dir``; analytic tripolar stand-in otherwise."""
    import glob as _glob

    nc_meshes = [p for pat in ("coordinates*.nc", "*mesh*.nc")
                 for p in sorted(_glob.glob(os.path.join(dir, pat)))]
    mesh_path = os.path.join(dir, f"{str(dataset).lower()}_mesh.npz")
    if nc_meshes:
        # NEMO coordinates.nc / mesh_mask.nc (glamt/gphit/... arrays) or a
        # direct lon/lat supergrid NetCDF — the reference's ORCA1 artifact
        from ..grids.tripolar import (supergrid_from_netcdf_mesh,
                                      tripolar_grid_from_supergrid)
        lon_sg, lat_sg, bottom = supergrid_from_netcdf_mesh(nc_meshes[0])
        grid = tripolar_grid_from_supergrid(
            lon_sg, lat_sg, Nz, z=vertical_coordinate(Nz, depth, zstar),
            halo=halo)
        if with_bathymetry and bottom is not None:
            bottom = dry_unresolvable_cells(grid, bottom)
            return with_bottom_height(grid, bottom, minimum_depth=10.0)
    elif os.path.exists(mesh_path):
        # ORCA-style .npz mesh: supergrid node coordinates `lon`/`lat` of
        # shape (2Ny+1, 2Nx) (NEMO convention, seam last), optional `p`
        # (pole face column; inferred from the fold symmetry otherwise)
        # and optional interior `bottom_height` (Ny, Nx)
        import numpy as np

        from ..grids.tripolar import tripolar_grid_from_supergrid
        mesh = np.load(mesh_path)
        grid = tripolar_grid_from_supergrid(
            mesh["lon"], mesh["lat"], Nz,
            z=vertical_coordinate(Nz, depth, zstar), halo=halo,
            p=int(mesh["p"]) if "p" in mesh else None)
        if with_bathymetry and "bottom_height" in mesh:
            bottom = dry_unresolvable_cells(grid, mesh["bottom_height"])
            return with_bottom_height(grid, bottom, minimum_depth=10.0)
    else:
        grid = tripolar_grid((360, 331, Nz), southernmost_latitude=-84.0,
                             halo=halo,
                             z=vertical_coordinate(Nz, depth, zstar),
                             north_poles_latitude=50.0,
                             first_pole_longitude=73.0)
    if with_bathymetry:
        bottom = regrid_bathymetry(grid, minimum_depth=10.0, major_basins=2,
                                   interpolation_passes=10, dir=dir)
        bottom = dry_unresolvable_cells(grid, bottom)
        grid = with_bottom_height(grid, bottom, minimum_depth=10.0)
    return grid


def orca_ocean(Nz=60, depth=6000.0, closure=None, initialize=True,
               free_surface_substeps=70, dir=".", **kw):
    """Reference `orca_ocean` (`orca.jl:33-39`): ORCA mesh +
    `AdaptiveVerticallyImplicitDiscretization`-style advection settings.
    Returns (model, state)."""
    from .tripolar import _tripolar_closure
    from ..utils.units import days

    grid = ORCAGrid(Nz=Nz, depth=depth, dir=dir)
    model = ocean_simulation(
        grid,
        closure=closure or _tripolar_closure(15 * days, 500.0, 200.0),
        momentum_advection="weno_vector_invariant",
        momentum_order=5, tracer_order=5,
        weno_weights="normal_division",     # orca.jl:11, omip_simulation.jl:562
        adaptive_vertical_cfl=0.4,          # AdaptiveVerticallyImplicit..., orca.jl:11-12
        free_surface_substeps=free_surface_substeps)
    state = model.initial_state()
    if initialize:
        state = set_fields(state, grid,
                           T=Metadatum("temperature", dataset=WOAAnnual(), dir=dir),
                           S=Metadatum("salinity", dataset=WOAAnnual(), dir=dir))
    return model, state
