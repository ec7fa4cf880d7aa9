"""API-contract smoke test: every reference-facing name exists on the
package — the rebuild of the reference's export/re-export existence checks
(`test/test_module.jl:7-45`; SURVEY.md §4). Cheap wiring test that catches
broken imports and dropped exports."""

import climaocean_tpu as co

# grouped by the reference export lists (`src/ClimaOcean.jl:3-42`)
EXPORTED = [
    # configuration constructors (ClimaOcean.jl:3-14)
    "latitude_longitude_ocean", "one_degree_tripolar_ocean",
    "half_degree_tripolar_ocean", "sixth_degree_tripolar_ocean",
    "tenth_degree_tripolar_ocean", "orca_ocean",
    "latitude_longitude_sea_ice", "one_degree_tripolar_sea_ice",
    "half_degree_tripolar_sea_ice", "sixth_degree_tripolar_sea_ice",
    "orca_sea_ice", "simplified_ocean_closure", "vertical_coordinate",
    # vendored closures (ClimaOcean.jl:20-22)
    "KPPVerticalDiffusivity", "NEMOTKEVerticalDiffusivity",
    # OMIP protocol (OMIPConfigurations.jl:51-57)
    "omip_simulation", "omip_closure", "add_omip_diagnostics",
    "strait_transports", "strait_sections", "StraitSection",
    # Progress callback (ClimaOcean.jl:48-88)
    "Progress",
    # re-exported dynamical-core surface (SURVEY.md §2b Oceananigans rows)
    "Grid", "latitude_longitude_grid", "tripolar_grid", "rectilinear_grid",
    "with_bottom_height", "ExponentialDiscretization",
    "HydrostaticModel", "make_step_fn", "Simulation",
    "IterationInterval", "TimeInterval", "Checkpointer", "pickup",
    "CATKEVerticalDiffusivity", "RiBasedVerticalDiffusivity",
    "ConvectiveAdjustmentVerticalDiffusivity", "VerticalScalarDiffusivity",
    "HorizontalScalarDiffusivity", "HorizontalScalarBiharmonicDiffusivity",
    "IsopycnalSkewSymmetricDiffusivity", "henyey_diffusivity",
    "TEOS10EquationOfState", "nan_checker",
    # re-exported coupler surface (SURVEY.md §2b NumericalEarth rows)
    "ocean_simulation", "sea_ice_simulation", "OceanSeaIceModel",
    "SeaIceModel", "make_coupled_step_fn",
    "SimilarityTheoryFluxes", "CoefficientBasedFluxes",
    "PrescribedAtmosphere", "PrefetchingAtmosphere",
    "netcdf_prescribed_atmosphere",
    # data wrangling (SURVEY.md §2b DataWrangling row)
    "Metadatum", "Metadata", "set_fields", "regrid_bathymetry",
    "ECCO2Daily", "ECCO4Monthly", "EN4Monthly", "GLORYS", "WOAAnnual",
    "WOAMonthly", "ETOPO", "ORCAGrid",
    "DatasetRestoring", "SurfaceFluxRestoring",
    "open_netcdf", "load_netcdf_field",
    "download_with_fallback", "download_from_artifacts",
    "ARTIFACTS_BASE_URL",
    "JRA55DataStagingCallback", "setup_staging_directory",
    # analysis
    "CaseCache", "atlantic_ocean_basin",
]


def test_exports_exist():
    missing = [n for n in EXPORTED if not hasattr(co, n)]
    assert not missing, f"missing exports: {missing}"


def test_constructor_signatures():
    """hasmethod-style checks (reference test_ocean_configurations.jl:40-54):
    constructors accept their documented keywords."""
    import inspect

    sig = inspect.signature(co.omip_simulation)
    for kw in ("dt", "stop_time", "vertical_closure", "flux_configuration",
               "with_sea_ice", "forcing_dir", "staging_dir", "output_dir"):
        assert kw in sig.parameters, kw

    sig = inspect.signature(co.latitude_longitude_ocean)
    for kw in ("resolution", "Nz", "closure", "minimum_depth",
               "interpolation_passes", "major_basins", "dir"):
        assert kw in sig.parameters, kw

    sig = inspect.signature(co.ORCAGrid)
    for kw in ("dataset", "Nz", "halo", "with_bathymetry", "dir"):
        assert kw in sig.parameters, kw
