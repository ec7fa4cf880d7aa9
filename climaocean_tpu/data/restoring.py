"""Restoring forcings.

TPU-native rebuild of NumericalEarth's `DatasetRestoring` (interior nudging
toward a dataset, `rate`, `time_indices_in_memory`) and
`SurfaceFluxRestoring` (restoring expressed as a surface flux riding the
`additional_surface_fluxes` path) — reference call sites:
`omip_simulation.jl:507-523` (WOA surface-salinity piston-velocity
restoring) and SURVEY.md §2b DataWrangling row.

Both plug into the model as closure-protocol objects (only the
`horizontal_tendencies` hook), so they compose with the physics closures in
the same tuple — mirroring the reference where restoring rides the flux BC
path and forcing callbacks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.units import days


@partial(jax.tree_util.register_dataclass, data_fields=["target"],
         meta_fields=["rate", "tracer"])
@dataclass(frozen=True)
class DatasetRestoring:
    """Interior nudging: G_c += rate · (target − c), masked to wet cells.

    ``target``: padded (Nz, Nyp, Nxp) device array (from
    `data.metadata.set_fields`-style ingestion); ``rate`` [1/s]. Seasonal
    targets can be refreshed host-side between windows (like the
    atmosphere prefetcher).
    """
    target: jnp.ndarray
    rate: float = 1.0 / (30 * days)
    tracer: str = "T"

    def initial_prognostics(self, grid):
        return {}

    def diffusivities(self, grid, fields, aux):
        return None

    def horizontal_tendencies(self, grid, fields, aux):
        c = fields[self.tracer]
        return {self.tracer: self.rate * (self.target - c) * grid.wet_c}


@partial(jax.tree_util.register_dataclass, data_fields=["target_surface"],
         meta_fields=["piston_velocity", "tracer"])
@dataclass(frozen=True)
class SurfaceFluxRestoring:
    """Surface-only restoring as a flux: the reference's
    `salinity_surface_restoring` with ``rate = piston_velocity /
    (Δz_surface · days)`` (`omip_simulation.jl:507-523`), i.e. an effective
    surface flux ``piston_velocity/days · (target − c_surface)`` deposited
    in the top cell.

    ``target_surface``: padded (Nyp, Nxp); ``piston_velocity`` [m/day].
    """
    target_surface: jnp.ndarray
    piston_velocity: float = 0.5
    tracer: str = "S"

    def initial_prognostics(self, grid):
        return {}

    def diffusivities(self, grid, fields, aux):
        return None

    def horizontal_tendencies(self, grid, fields, aux):
        c_sfc = fields[self.tracer][-1]
        dz_top = grid.dz_c[-1]
        flux = (self.piston_velocity / days) * (self.target_surface - c_sfc)
        tend = jnp.zeros_like(fields[self.tracer])
        tend = tend.at[-1].set(flux / dz_top * grid.wet_c[-1])
        return {self.tracer: tend}


def woa_salinity_restoring(grid, piston_velocity=0.5, dir="."):
    """The OMIP configuration's WOA surface-salinity restoring
    (`salinity_surface_restoring`)."""
    from .metadata import Metadatum, WOAAnnual, regrid_to_grid

    target = regrid_to_grid(Metadatum("salinity", dataset=WOAAnnual(),
                                      dir=dir), grid, surface=True)
    H = grid.H
    padded = np.zeros((grid.Nyp, grid.Nxp), np.float32)
    padded[H:H + grid.Ny, H:H + grid.Nx] = target
    return SurfaceFluxRestoring(target_surface=jnp.asarray(padded),
                                piston_velocity=piston_velocity)
