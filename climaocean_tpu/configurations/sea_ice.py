"""Sea-ice configuration constructors.

TPU-native rebuild of the reference's `SeaIceConfigurations`
(`/root/reference/src/SeaIceConfigurations/configurations.jl:8-45`): five
one-liner constructors delegating to a `sea_ice_simulation` equivalent on
the ocean's own grid.
"""

from __future__ import annotations

from ..models.sea_ice import SeaIceModel


def sea_ice_simulation(grid, ocean=None, dynamics=True, substeps=100,
                       snow=True, **kw):
    """NumericalEarth `sea_ice_simulation(grid, ocean; ...)` equivalent:
    slab thermodynamics + EVP dynamics + snow on the shared grid."""
    return SeaIceModel(grid=grid, dynamics=dynamics, substeps=substeps,
                       snow=snow, **kw)


def latitude_longitude_sea_ice(ocean_model, **kw):
    return sea_ice_simulation(ocean_model.grid, **kw)


def one_degree_tripolar_sea_ice(ocean_model, **kw):
    return sea_ice_simulation(ocean_model.grid, **kw)


def half_degree_tripolar_sea_ice(ocean_model, **kw):
    return sea_ice_simulation(ocean_model.grid, **kw)


def sixth_degree_tripolar_sea_ice(ocean_model, **kw):
    return sea_ice_simulation(ocean_model.grid, **kw)


def orca_sea_ice(ocean_model, **kw):
    return sea_ice_simulation(ocean_model.grid, **kw)
