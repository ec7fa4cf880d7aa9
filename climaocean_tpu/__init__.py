"""climaocean_tpu — TPU-native realistic ocean + sea-ice simulations.

From-scratch JAX/XLA rebuild of the capability surface of
CliMA/ClimaOcean.jl and the stack it drives (the Oceananigans hydrostatic
core + the NumericalEarth coupler); see SURVEY.md at the repo root for the
layer map this package implements.

Public API mirrors the reference's vocabulary (`src/ClimaOcean.jl:3-42`):
grids, `ocean_simulation`, configuration constructors, `set_fields`
(= `set!`), `OceanSeaIceModel`, `Simulation`/`run`, diagnostics writers.
"""

from .grids.grid import (Grid, latitude_longitude_grid, rectilinear_grid,
                         with_bottom_height)
from .grids.tripolar import tripolar_grid
from .grids.vertical import ExponentialDiscretization, UniformDiscretization

from .physics.eos import (LinearEquationOfState, TEOS10EquationOfState,
                          rho_anomaly, rho_insitu, thermal_expansion,
                          haline_contraction)

from .closures.catke import CATKEVerticalDiffusivity
from .closures.ri_based import RiBasedVerticalDiffusivity
from .closures.scalar_diffusivity import (
    ConvectiveAdjustmentVerticalDiffusivity, HorizontalScalarBiharmonicDiffusivity,
    HorizontalScalarDiffusivity, VerticalScalarDiffusivity, henyey_diffusivity)

from .core.operations import (Average, FieldOperation, Integral,
                              KernelFunctionOperation, at_surface,
                              kinetic_energy, prognostic)

from .models.hydrostatic import HydrostaticModel, SurfaceFluxes, make_step_fn
from .models.coupled import OceanSeaIceModel, coupled_step, make_coupled_step_fn
from .models.sea_ice import SeaIceModel

from .coupler.atmosphere import (PrescribedAtmosphere,
                                 synthetic_prescribed_atmosphere)
from .coupler.similarity_theory import (CoefficientBasedFluxes,
                                        SimilarityTheoryFluxes)

from .data.bathymetry import regrid_bathymetry
from .data.metadata import (ECCO2Daily, ECCO4Monthly, EN4Monthly, ETOPO,
                            GLORYS, Metadata, Metadatum, WOAAnnual,
                            WOAMonthly, set_fields)

from .simulation.simulation import (IterationInterval, Simulation,
                                    TimeInterval, WallTimeInterval,
                                    progress_callback)
from .simulation.checkpoint import Checkpointer, latest_checkpoint, pickup
from .simulation.diagnostics import add_omip_diagnostics, FieldWriter

from .configurations.ocean import (latitude_longitude_ocean, ocean_simulation,
                                   simplified_ocean_closure,
                                   vertical_coordinate)
from .configurations.tripolar import (half_degree_tripolar_ocean,
                                      one_degree_tripolar_ocean,
                                      sixth_degree_tripolar_ocean,
                                      tenth_degree_tripolar_ocean)
from .configurations.sea_ice import (half_degree_tripolar_sea_ice,
                                     latitude_longitude_sea_ice,
                                     one_degree_tripolar_sea_ice,
                                     orca_sea_ice, sea_ice_simulation,
                                     sixth_degree_tripolar_sea_ice)
from .configurations.orca import ORCAGrid, orca_ocean
from .configurations.omip import omip_closure, omip_simulation
from .data.restoring import (DatasetRestoring, SurfaceFluxRestoring,
                             TimeVaryingDatasetRestoring, dataset_restoring,
                             woa_salinity_restoring)
from .closures.gm_redi import IsopycnalSkewSymmetricDiffusivity
from .closures.kpp import KPPVerticalDiffusivity
from .closures.nemo_tke import NEMOTKEVerticalDiffusivity
from .coupler.prefetch import PrefetchingAtmosphere
from .coupler.jra55 import JRA55FileAtmosphere
from .simulation.analysis import CaseCache, atlantic_ocean_basin
from .simulation.field_time_series import FieldTimeSeries, InMemory, OnDisk
from .simulation.strait_transports import (StraitSection, strait_sections,
                                           strait_transports)
from .simulation.simulation import nan_checker

from .coupler.atmosphere import netcdf_prescribed_atmosphere
from .data.download import (ARTIFACTS_BASE_URL, download_from_artifacts,
                            download_with_fallback)
from .data.netcdf import load_field as load_netcdf_field
from .data.netcdf import open_netcdf
from .data.staging import (JRA55DataStagingCallback, setup_staging_directory,
                           stage_year, unstage_year)

# reference-name alias: `Progress` (src/ClimaOcean.jl:48-88)
Progress = progress_callback

__version__ = "0.1.0"
