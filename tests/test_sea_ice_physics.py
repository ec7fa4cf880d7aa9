"""Quantitative sea-ice physics anchoring (VERDICT r2 item 8a):

* seasonal-cycle tolerance bands — thermodynamic winter growth and summer
  melt rates on an idealized polar basin must land in the ranges set by
  Stefan-law conduction and the surface energy balance;
* WENO(7) ice advection (reference `omip_simulation.jl:629`) must keep a
  transported ice edge sharper than donor-cell while staying positive and
  ~conservative.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from climaocean_tpu.coupler.similarity_theory import AtmosphereState
from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.models import sea_ice as si


def _polar_setup(nx=16, ny=8, nz=3):
    grid = latitude_longitude_grid((nx, ny, nz), longitude=(-180, 180),
                                   latitude=(60, 84), z=(-200.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    bottom = np.full_like(lon, -200.0)
    grid = with_bottom_height(grid, bottom, minimum_depth=10.0)
    return grid


def _atmos(grid, T_celsius, sw=0.0, wind=5.0):
    shp = np.asarray(grid.lat_cc).shape
    c = lambda v: jnp.full(shp, np.float32(v))
    T_K = T_celsius + 273.15
    # saturation-ish humidity at T (Clausius-Clapeyron around 273 K)
    q = 3.8e-3 * np.exp(17.67 * T_celsius / (T_celsius + 243.5))
    # clear polar sky: downwelling LW ~ eps_eff * sigma * T^4
    lw = 0.75 * 5.67e-8 * T_K ** 4
    return AtmosphereState(u=c(wind), v=c(0.0), T=c(T_K), q=c(q), p=c(101325.0),
                           Qsw_down=c(sw), Qlw_down=c(lw),
                           rain=c(0.0), snow=c(0.0))


def _mixed_layer_ocean(grid, T_celsius, S=32.0):
    shape3 = grid.padded_shape
    return {"T": jnp.full(shape3, np.float32(T_celsius)),
            "S": jnp.full(shape3, np.float32(S)),
            "u": jnp.zeros(shape3, np.float32),
            "v": jnp.zeros(shape3, np.float32)}


def _run_thermo(model, ice, ocean, atmos, dt, n):
    import jax

    @jax.jit
    def one(ice):
        new, _ = si.step(model, ice, ocean, atmos, None, dt)
        return new

    for _ in range(n):
        ice = one(ice)
    return ice


def test_winter_growth_band():
    """60 days under −25 °C air over freezing water, from a thin seed (new
    ice nucleation is the coupled model's frazil path — an uncoupled fixed
    ocean at exactly T_f never supercools): Stefan-law conduction bounds
    growth at ~1.3 m; the surface balance keeps Ts above the air
    temperature, so pin mean thickness to [0.3, 2.0] m and near-total
    cover (extent fraction > 0.9 at the 15% concentration threshold)."""
    grid = _polar_setup()
    model = si.SeaIceModel(grid=grid, dynamics=False, snow=False)
    ice = model.initial_state()
    wet2 = grid.wet_c[-1]
    ice["thickness"] = 0.1 * wet2                  # 10 cm seed
    ice["concentration"] = 0.5 * wet2
    S = 32.0
    ocean = _mixed_layer_ocean(grid, float(si.freezing_temperature(S)), S)
    atmos = _atmos(grid, -25.0, sw=0.0)

    ice = _run_thermo(model, ice, ocean, atmos, dt=6 * 3600.0, n=240)  # 60 d

    wet = np.asarray(grid.interior(grid.wet_c[-1])) > 0
    h = np.asarray(grid.interior(ice["thickness"]))[wet]
    a = np.asarray(grid.interior(ice["concentration"]))[wet]
    assert 0.3 < h.mean() < 2.0, f"winter growth {h.mean():.2f} m off-band"
    assert (a > 0.15).mean() > 0.9, f"winter extent fraction {(a > 0.15).mean():.2f}"
    assert np.isfinite(h).all() and h.min() >= 0.0


def test_summer_melt_band():
    """Starting from 1.5 m full cover, 60 days of +5 °C air with 250 W/m²
    insolation over +2 °C water melts most of the pack: mean thickness
    < 0.5 m and extent collapse below 50%."""
    grid = _polar_setup()
    model = si.SeaIceModel(grid=grid, dynamics=False, snow=False)
    ice = model.initial_state()
    wet2 = grid.wet_c[-1]
    ice["thickness"] = 1.5 * wet2
    ice["concentration"] = 0.95 * wet2
    ice["Ts"] = -5.0 * wet2
    ocean = _mixed_layer_ocean(grid, 2.0)
    atmos = _atmos(grid, 5.0, sw=250.0)

    ice = _run_thermo(model, ice, ocean, atmos, dt=6 * 3600.0, n=240)

    wet = np.asarray(grid.interior(grid.wet_c[-1])) > 0
    h = np.asarray(grid.interior(ice["thickness"]))[wet]
    a = np.asarray(grid.interior(ice["concentration"]))[wet]
    assert h.mean() < 0.5, f"summer melt too weak: {h.mean():.2f} m left"
    assert (a > 0.15).mean() < 0.5, f"summer extent fraction {(a > 0.15).mean():.2f}"


def test_seasonal_cycle_returns():
    """Grow (60 d cold) then melt (60 d warm): the annual signal must be
    materially larger than the residual — the cycle returns to a thin
    state rather than ratcheting."""
    grid = _polar_setup()
    model = si.SeaIceModel(grid=grid, dynamics=False, snow=False)
    ice = model.initial_state()
    wet2 = grid.wet_c[-1]
    ice["thickness"] = 0.1 * wet2
    ice["concentration"] = 0.5 * wet2
    S = 32.0
    freezing = _mixed_layer_ocean(grid, float(si.freezing_temperature(S)), S)
    warm = _mixed_layer_ocean(grid, 2.0)
    ice = _run_thermo(model, ice, freezing, _atmos(grid, -25.0), 6 * 3600.0, 240)
    wet = np.asarray(grid.interior(grid.wet_c[-1])) > 0
    h_max = np.asarray(grid.interior(ice["thickness"]))[wet].mean()
    ice = _run_thermo(model, ice, warm, _atmos(grid, 5.0, sw=250.0),
                      6 * 3600.0, 240)
    h_end = np.asarray(grid.interior(ice["thickness"]))[wet].mean()
    assert h_end < 0.4 * h_max, (h_max, h_end)


@pytest.mark.parametrize("order", [1, 7])
def test_ice_advection_positive_and_conservative(order):
    grid = _polar_setup(nx=48, ny=8)
    model = si.SeaIceModel(grid=grid, advection_order=order)
    ice = model.initial_state()
    H = grid.H
    h = np.zeros(np.asarray(grid.lat_cc).shape, np.float32)
    h[:, H + 10:H + 20] = 1.0                      # zonal slab of 1 m ice
    from climaocean_tpu.core.halo import fill_halos
    wet2 = grid.wet_c[-1]
    ice["thickness"] = fill_halos(jnp.asarray(h) * wet2, grid)
    ice["concentration"] = fill_halos(jnp.asarray(0.9 * h) * wet2, grid)
    ice["u"] = 0.2 * grid.wet_u[-1]               # uniform eastward drift
    ice["v"] = jnp.zeros_like(ice["u"])

    az = np.asarray(grid.interior(grid.az_cc))
    vol0 = (np.asarray(grid.interior(ice["thickness"])) * az).sum()
    import jax

    # dt chosen for CFL ≈ 0.2 at this coarse grid (dx ≈ 250 km at 72°N) so
    # 40 steps transport the slab ~8 cells — a numerics test, not a
    # physical time step
    dt = 2.5e5

    @jax.jit
    def advect_once(ice):
        out = si.advect_ice(model, ice, dt)
        out["thickness"] = fill_halos(out["thickness"], grid)
        out["concentration"] = fill_halos(out["concentration"], grid)
        return out

    for _ in range(40):
        ice = advect_once(ice)
    h_end = np.asarray(grid.interior(ice["thickness"]))
    assert h_end.min() >= 0.0
    vol1 = (h_end * az).sum()
    # clipping can shed a little mass at the edges; keep it under 2%
    assert abs(vol1 - vol0) / vol0 < 0.02, (vol0, vol1)


def test_weno_edge_sharper_than_donor_cell():
    """After 40 steps of uniform drift, the WENO(7) edge must be sharper
    than donor-cell's (fewer intermediate-value cells along the front)."""
    widths = {}
    for order in (1, 7):
        grid = _polar_setup(nx=48, ny=8)
        model = si.SeaIceModel(grid=grid, advection_order=order)
        ice = model.initial_state()
        H = grid.H
        h = np.zeros(np.asarray(grid.lat_cc).shape, np.float32)
        h[:, H + 10:H + 20] = 1.0
        from climaocean_tpu.core.halo import fill_halos
        wet2 = grid.wet_c[-1]
        ice["thickness"] = fill_halos(jnp.asarray(h) * wet2, grid)
        ice["concentration"] = fill_halos(jnp.asarray(0.9 * h) * wet2, grid)
        ice["u"] = 0.2 * grid.wet_u[-1]
        ice["v"] = jnp.zeros_like(ice["u"])
        import jax
        dt = 2.5e5                                  # CFL ≈ 0.2 (see above)

        @jax.jit
        def advect_once(ice):
            out = si.advect_ice(model, ice, dt)
            out["thickness"] = fill_halos(out["thickness"], grid)
            out["concentration"] = fill_halos(out["concentration"], grid)
            return out

        for _ in range(40):
            ice = advect_once(ice)
        h_end = np.asarray(grid.interior(ice["thickness"]))
        row = h_end[4]                              # mid-basin latitude row
        widths[order] = int(((row > 0.05) & (row < 0.95)).sum())
    assert widths[7] < widths[1], widths
