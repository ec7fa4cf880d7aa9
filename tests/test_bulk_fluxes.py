"""Quantitative validation of the bulk-flux algorithms and sea-ice physics.

Covers VERDICT round-1 item 6: regression tests pinning
`CoefficientBasedFluxes` (NCAR Large & Yeager 2004/2009) and
`SimilarityTheoryFluxes` (COARE-class) outputs at canonical
(U₁₀, ΔT, Δq) points against published transfer-coefficient values
(reference flux configurations `omip_simulation.jl:40-113`), plus
sea-ice surface-balance linearization and EVP stress prognostics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climaocean_tpu.coupler.similarity_theory import (AtmosphereState,
                                                      CoefficientBasedFluxes,
                                                      SimilarityTheoryFluxes)
from climaocean_tpu.coupler.thermodynamics import (CP_AIR, LV, air_density,
                                                   saturation_specific_humidity)


def make_atmos(U10, T_air_K, q=None, p=101325.0):
    shape = np.shape(U10) or (1,)
    arr = lambda v: jnp.full(shape, v, jnp.float32)
    if q is None:
        q = 0.7 * float(saturation_specific_humidity(jnp.asarray(T_air_K), p))
    return AtmosphereState(u=arr(U10), v=arr(0.0), T=arr(T_air_K), q=arr(q),
                           p=arr(p), Qsw_down=arr(0.0), Qlw_down=arr(300.0),
                           rain=arr(0.0), snow=arr(0.0))


def neutral_surface(atmos):
    """Surface (T, q) that zero out ΔΘ and Δq for the solver."""
    T_s = atmos.T + 0.0098 * 10.0      # cancels the potential-T correction
    return T_s, atmos.q


def ly_cd_neutral(U10):
    """Large & Yeager (2004) eq. 6a: 1e3·C_D = 2.70/U + 0.142 + 0.0764·U."""
    return 1e-3 * (2.70 / U10 + 0.142 + 0.0764 * U10)


# --------------------------------------------------------------------------
# NCAR Large & Yeager coefficient-based algorithm
# --------------------------------------------------------------------------

@pytest.mark.parametrize("U10", [4.0, 7.0, 10.0, 15.0, 25.0])
def test_ly_neutral_drag_matches_published(U10):
    """In neutral stratification the recovered drag coefficient equals the
    published L&Y 10-m neutral value exactly (the stability iteration is a
    no-op at ζ = 0)."""
    solver = CoefficientBasedFluxes()
    atmos = make_atmos(U10, 283.15)
    T_s, q_s = neutral_surface(atmos)
    out = solver(atmos, T_s, q_s)
    rho = float(air_density(atmos.T, atmos.p, atmos.q)[0])
    Cd = float(out.tau_x[0]) / (rho * U10 ** 2)
    assert abs(Cd - ly_cd_neutral(U10)) / ly_cd_neutral(U10) < 1e-3


def test_ly_neutral_scalar_coefficients():
    """L&Y (2004) eqs. 6b-c: 1e3·C_E = 34.6·√C_D; 1e3·C_H = 32.7·√C_D
    (unstable) / 18.0·√C_D (stable). Pin both branches at U₁₀ = 8 m/s with
    a small ΔΘ so the stability adjustment stays ~neutral."""
    solver = CoefficientBasedFluxes()
    U10 = 8.0
    rootCd = np.sqrt(ly_cd_neutral(U10))

    for dT, ch_factor in ((-0.05, 32.7e-3), (+0.05, 18.0e-3)):
        # dT = T_surf - theta_air: negative -> stable, positive -> unstable
        # (wait: surface warmer than air = unstable)
        atmos = make_atmos(U10, 283.15)
        T_s0, q_s = neutral_surface(atmos)
        T_s = T_s0 + (-dT if dT < 0 else dT)  # placeholder, fixed below
        T_s = T_s0 + dT
        out = solver(atmos, T_s, q_s)
        rho = float(air_density(atmos.T, atmos.p, atmos.q)[0])
        # Q_sens = rho cp Ch S dtheta, dtheta = theta_a - T_s = -dT
        Ch = float(out.Q_sensible[0]) / (rho * CP_AIR * U10 * (-dT))
        expect = (18.0e-3 if dT < 0 else 32.7e-3) * rootCd
        assert abs(Ch - expect) / expect < 0.05, (dT, Ch, expect)

    # latent: evaporation with Δq < 0 (dry air over saturated surface)
    atmos = make_atmos(U10, 283.15)
    T_s, _ = neutral_surface(atmos)
    q_s = saturation_specific_humidity(T_s, atmos.p)
    out = solver(atmos, T_s, q_s)
    rho = float(air_density(atmos.T, atmos.p, atmos.q)[0])
    dq = float((atmos.q - q_s)[0])
    # Q_latent = −LV·evap = LV·ρ·Ce·S·Δq (Δq < 0 → ocean loses heat)
    Ce = float(out.Q_latent[0]) / (LV * rho * U10 * dq)
    # moist ΔΘ makes this slightly non-neutral; 5% tolerance
    assert abs(Ce - 34.6e-3 * rootCd) / (34.6e-3 * rootCd) < 0.05
    assert float(out.evaporation[0]) > 0.0          # water leaves the ocean
    assert float(out.Q_latent[0]) < 0.0             # ocean loses heat


def test_ly_stability_adjustment_direction():
    """Stable stratification must reduce the exchange below neutral;
    unstable must enhance it (L&Y 2004 fig. 3 behavior)."""
    solver = CoefficientBasedFluxes()
    U10 = 6.0
    rho_tau = {}
    for name, dT_surf in (("stable", -3.0), ("neutral", 0.0), ("unstable", 3.0)):
        atmos = make_atmos(U10, 283.15)
        T_s, q_s = neutral_surface(atmos)
        out = solver(atmos, T_s + dT_surf, q_s)
        rho = float(air_density(atmos.T, atmos.p, atmos.q)[0])
        rho_tau[name] = float(out.tau_x[0]) / (rho * U10 ** 2)
    assert rho_tau["stable"] < rho_tau["neutral"] < rho_tau["unstable"]


# --------------------------------------------------------------------------
# COARE-class similarity-theory solver
# --------------------------------------------------------------------------

@pytest.mark.parametrize("U10,lo,hi", [(5.0, 0.90e-3, 1.25e-3),
                                       (10.0, 1.05e-3, 1.40e-3),
                                       (18.0, 1.55e-3, 2.25e-3)])
def test_coare_neutral_drag_in_published_range(U10, lo, hi):
    """COARE 3.5/3.6 neutral 10-m drag (Edson et al. 2013 fig. 6):
    ~1.1e-3 at 5 m/s, ~1.2e-3 at 10 m/s, ~1.9e-3 at 18 m/s. The solver
    includes gustiness (min 0.5 m/s), so compare the *effective* Cd
    against a tolerant published band."""
    solver = SimilarityTheoryFluxes()
    atmos = make_atmos(U10, 283.15)
    T_s, q_s = neutral_surface(atmos)
    out = solver(atmos, T_s, q_s)
    rho = float(air_density(atmos.T, atmos.p, atmos.q)[0])
    Cd = float(out.tau_x[0]) / (rho * U10 ** 2)
    assert lo < Cd < hi, Cd


def test_coare_ustar_magnitude():
    """u★ ≈ 0.34-0.37 m/s at U₁₀ = 10 m/s neutral (COARE canonical)."""
    solver = SimilarityTheoryFluxes()
    atmos = make_atmos(10.0, 283.15)
    T_s, q_s = neutral_surface(atmos)
    out = solver(atmos, T_s, q_s)
    assert 0.30 < float(out.u_star[0]) < 0.42


def test_coare_tropical_canonical_point():
    """Canonical tropical case (≈ COARE reference conditions): U₁₀ = 6 m/s,
    SST 29 °C, air 28 °C, RH ≈ 80%. Latent ~100±40 W/m², sensible ~10±8
    W/m² out of the ocean (Fairall et al. 1996 mean TOGA-COARE fluxes)."""
    solver = SimilarityTheoryFluxes()
    T_air = 273.15 + 28.0
    q_air = 0.80 * float(saturation_specific_humidity(jnp.asarray(T_air),
                                                      101325.0))
    atmos = make_atmos(6.0, T_air, q=q_air)
    T_s = jnp.full((1,), 273.15 + 29.0)
    q_s = saturation_specific_humidity(T_s, atmos.p)
    out = solver(atmos, T_s, q_s)
    assert -140.0 < float(out.Q_latent[0]) < -60.0
    assert -18.0 < float(out.Q_sensible[0]) < -2.0


# --------------------------------------------------------------------------
# sea-ice: surface-balance linearization + EVP stress prognostics
# --------------------------------------------------------------------------

def _ice_setup(nx=16, ny=10, nz=3):
    from climaocean_tpu.grids.grid import latitude_longitude_grid
    from climaocean_tpu.models.sea_ice import SeaIceModel

    grid = latitude_longitude_grid((nx, ny, nz), longitude=(-180, 180),
                                   latitude=(-10, 10), z=(-500.0, 0.0), halo=4)
    model = SeaIceModel(grid=grid, substeps=40)
    ice = model.initial_state()
    shp = ice["thickness"].shape
    ice["thickness"] = jnp.full(shp, 1.0) * grid.wet_c[-1]
    ice["concentration"] = jnp.full(shp, 0.9) * grid.wet_c[-1]
    # ocean exactly at the freezing point (no frazil term in play)
    ocean = {"T": jnp.full((nz,) + shp, -0.054 * 33.0),
             "S": jnp.full((nz,) + shp, 33.0),
             "u": jnp.zeros((nz,) + shp), "v": jnp.zeros((nz,) + shp)}
    arr = lambda v: jnp.full(shp, v, jnp.float32)
    atmos = AtmosphereState(u=arr(5.0), v=arr(0.0), T=arr(253.15),
                            q=arr(5e-4), p=arr(101325.0), Qsw_down=arr(0.0),
                            Qlw_down=arr(180.0), rain=arr(0.0), snow=arr(0.0))
    return grid, model, ice, ocean, atmos


def test_ice_surface_temperature_solves_balance():
    """Ts from the linearized implicit solve must (a) sit below freezing in
    a cold atmosphere, (b) move toward reducing the residual Q_atm+Q_cond,
    and (c) cool when the atmosphere cools (∂Ts/∂T_air > 0) — i.e. the
    dQ/dT linearization has the right sign and a physical magnitude."""
    from climaocean_tpu.models import sea_ice as si

    grid, model, ice, ocean, atmos = _ice_setup()
    new, _ = si.slab_thermodynamics(model, ice, ocean, atmos, 600.0)
    wet = np.asarray(grid.wet_c[-1]) > 0
    Ts = np.asarray(new["Ts"])[wet]
    assert np.all(Ts < 0.0)
    assert np.all(Ts > -45.0)

    colder = atmos._replace(T=atmos.T - 10.0)
    new2, _ = si.slab_thermodynamics(model, ice, ocean, colder, 600.0)
    Ts2 = np.asarray(new2["Ts"])[wet]
    assert np.mean(Ts2) < np.mean(Ts) - 1.0


def test_ice_growth_rate_physical():
    """Bottom growth of 1 m ice under a -20 °C atmosphere: Stefan-law scale
    is k ΔT / (ρ L h) ≈ 2.03·18/(917·3.34e5·1) ≈ 1.2e-7 m/s ≈ 1 cm/day.
    Accept a [0.2, 5] cm/day band (the implicit Ts solve moves ΔT)."""
    from climaocean_tpu.models import sea_ice as si

    grid, model, ice, ocean, atmos = _ice_setup()
    dt = 3600.0
    new, _ = si.slab_thermodynamics(model, ice, ocean, atmos, dt)
    wet = np.asarray(grid.wet_c[-1]) > 0
    dh_per_day = (np.asarray(new["thickness"]) - np.asarray(ice["thickness"]))[wet] \
        * 86400.0 / dt
    assert np.all(dh_per_day > 0.002)
    assert np.all(dh_per_day < 0.05)


def test_evp_stress_is_prognostic():
    """EVP internal stress must persist between coupled steps (Hunke &
    Dukowicz carry σ; VERDICT round-1 weak item 3)."""
    from climaocean_tpu.models import sea_ice as si

    grid, model, ice, ocean, atmos = _ice_setup()
    assert "sigma1" in ice and "sigma12" in ice

    step = jax.jit(lambda i: si.step(model, i, ocean, atmos, None, 600.0)[0])
    s1 = step(ice)
    # convergent wind forcing over ice -> nonzero internal stress somewhere
    assert float(jnp.max(jnp.abs(s1["sigma1"]))) > 0.0
    # and the next step starts FROM that stress: zeroing it changes u
    s2_carried = step(s1)
    s1_zeroed = dict(s1, sigma1=jnp.zeros_like(s1["sigma1"]),
                     sigma2=jnp.zeros_like(s1["sigma2"]),
                     sigma12=jnp.zeros_like(s1["sigma12"]))
    s2_zeroed = step(s1_zeroed)
    assert float(jnp.max(jnp.abs(s2_carried["u"] - s2_zeroed["u"]))) > 0.0


def test_free_drift_nansen_rule():
    """With no internal stress (thin, low-concentration ice) and no Coriolis
    (equatorial band), steady drift obeys the quadratic-drag balance
    ρₐ C_ai Uₐ² = ρₒ C_io u_i² -> u_i/Uₐ = √(ρₐ C_ai / ρₒ C_io) ≈ 1.8%
    (Nansen's ~2% rule)."""
    from climaocean_tpu.models import sea_ice as si

    grid, model, ice, ocean, atmos = _ice_setup()
    ice["thickness"] = jnp.full_like(ice["thickness"], 0.2) * grid.wet_c[-1]
    ice["concentration"] = jnp.full_like(ice["concentration"], 0.3) * grid.wet_c[-1]
    model_fd = si.SeaIceModel(grid=grid, substeps=300)

    new, _, _ = si.evp_dynamics(model_fd, ice, ocean, atmos, 3600.0)
    wet_u = np.asarray(grid.wet_u[-1]) > 0
    # interior away from coasts: take the median drift of active cells
    u = np.asarray(new["u"])[wet_u]
    u = u[np.abs(u) > 1e-4]
    assert u.size > 0
    ratio = np.median(u) / 5.0      # wind is +5 m/s zonal
    expect = np.sqrt(1.25 * 1.4e-3 / (1020.0 * 5.5e-3))   # ≈ 0.0177
    assert 0.5 * expect < ratio < 1.8 * expect, (ratio, expect)
