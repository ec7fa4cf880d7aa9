"""Halo-hygiene invariant (VERDICT r4 weak #5 / next-step 8).

The round-4 year run died at day 302 because a pointwise-updated field's
halo (ice Ts, never refilled) random-walked into flux-exponential overflow
and the global salinity mean spread the NaN to every ocean cell in one
step. The structural policy is refill-or-mask for every prognostic; this
suite makes the class impossible to reintroduce silently:

* poison EVERY halo cell of EVERY prognostic (ocean + ice) with 1e30 and
  with NaN, step the full coupled model (normalization on) for several
  steps on latlon AND tripolar grids, and assert
  - the interior state equals the unpoisoned run's interior (1e30 case:
    no stale-halo value reaches any interior cell or global reduction);
  - everything stays finite (NaN case), including the progress/writer
    surface diagnostics and the normalization offset.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere
from climaocean_tpu.data.synthetic import (synthetic_bathymetry,
                                           synthetic_salinity,
                                           synthetic_temperature)
from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.models.coupled import OceanSeaIceModel, coupled_step
from climaocean_tpu.models.hydrostatic import HydrostaticModel
from climaocean_tpu.models.sea_ice import SeaIceModel


def _build(kind):
    if kind == "latlon":
        grid = latitude_longitude_grid((24, 16, 4), latitude=(-75, 75),
                                       z=(-2000.0, 0.0), halo=4)
    else:
        from climaocean_tpu.grids.tripolar import tripolar_grid
        grid = tripolar_grid((24, 16, 4), z=(-2000.0, 0.0), halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(
        grid, np.minimum(synthetic_bathymetry(lon, lat), -0.1),
        minimum_depth=10.0)
    ocean = HydrostaticModel(grid=grid, closures=(), substeps=6)
    atmos = synthetic_prescribed_atmosphere(grid, 0.0, 5 * 86400.0)
    ice = SeaIceModel(grid=grid, dynamics=True, substeps=20)
    model = OceanSeaIceModel(ocean=ocean, atmosphere=atmos, sea_ice=ice,
                             normalize_salinity=True)
    state = model.initial_state()
    H = grid.H
    zc = np.asarray(grid.z_c)
    ny, nx = grid.Ny, grid.Nx
    Tp = np.zeros(grid.padded_shape, np.float32)
    Sp = np.full(grid.padded_shape, 35.0, np.float32)
    Tp[:, H:H + ny, H:H + nx] = synthetic_temperature(
        lon[None], lat[None], zc[:, None, None])
    Sp[:, H:H + ny, H:H + nx] = synthetic_salinity(
        lon[None], lat[None], zc[:, None, None])
    state["ocean"]["T"] = jnp.asarray(Tp)
    state["ocean"]["S"] = jnp.asarray(Sp)
    # some ice so the thermodynamics paths are live
    hi = np.zeros(np.asarray(grid.lat_cc).shape, np.float32)
    hi[np.asarray(grid.lat_cc) > 55.0] = 1.0
    wet2 = np.asarray(grid.wet_c[-1])
    state["sea_ice"]["thickness"] = jnp.asarray(hi * wet2)
    state["sea_ice"]["concentration"] = jnp.asarray(0.9 * hi * wet2)
    return model, state, grid


def _poison(state, grid, value):
    """Overwrite every halo cell of every 2-D/3-D prognostic field.

    On folded (tripolar) grids the v-face SEAM row ``H + Ny`` is
    prognostic state, not halo: the fold fill maintains it by
    antisymmetric averaging with its mirror partner (it is the shared
    face between a cell and its fold image), so poisoning it would
    corrupt real state, not test hygiene."""
    H = grid.H
    ny, nx = grid.Ny, grid.Nx
    folded = grid.kind.startswith("tripolar")

    def poison_one(a, ny_keep):
        a = np.array(a)
        if a.ndim < 2 or a.shape[-1] != nx + 2 * H:
            return jnp.asarray(a)
        keep = a[..., H:H + ny_keep, H:H + nx].copy()
        a[...] = value
        a[..., H:H + ny_keep, H:H + nx] = keep
        return jnp.asarray(a)

    out = dict(state)
    for comp in ("ocean", "sea_ice"):
        if comp in out:
            out[comp] = {
                k: poison_one(v, ny + 1 if (folded and k == "v") else ny)
                for k, v in out[comp].items()}
    return out


def _run(model, state, n=4):
    step = jax.jit(lambda s, t: coupled_step(model, s, t, 900.0))
    for i in range(n):
        state = step(state, i * 900.0)
    return state


@pytest.mark.parametrize("kind", ["latlon", "tripolar"])
def test_halo_poison_cannot_reach_interior(kind):
    model, state, grid = _build(kind)
    H = grid.H
    cut = np.s_[..., H:H + grid.Ny, H:H + grid.Nx]

    clean = _run(model, state)

    # --- 1e30 poison: interior evolution must be IDENTICAL ----------------
    big = _run(model, _poison(state, grid, 1.0e30))
    for comp in ("ocean", "sea_ice"):
        for k, v in clean[comp].items():
            a, b = np.asarray(v), np.asarray(big[comp][k])
            if a.ndim < 2:
                continue
            np.testing.assert_array_equal(
                a[cut], b[cut],
                err_msg=f"{kind}:{comp}.{k} interior differs after halo "
                        "poisoning — a stencil or reduction read a stale "
                        "halo cell")
    # the in-step normalization (a global reduction) must also agree
    np.testing.assert_array_equal(np.asarray(clean["net_fluxes"]["Q_S"])[cut],
                                  np.asarray(big["net_fluxes"]["Q_S"])[cut])

    # --- NaN poison: nothing non-finite reaches the interior or any
    # interior-consuming output ------------------------------------------
    nan = _run(model, _poison(state, grid, np.nan))
    for comp in ("ocean", "sea_ice"):
        for k, v in nan[comp].items():
            a = np.asarray(v)
            if a.ndim < 2:
                continue
            assert np.isfinite(a[cut]).all(), \
                f"{kind}:{comp}.{k} non-finite interior after NaN halos"
    assert np.isfinite(np.asarray(nan["net_fluxes"]["Q_S"])[cut]).all()
    # progress-line style interior reductions stay finite
    from climaocean_tpu.simulation.diagnostics import surface_diagnostics
    for name, f in surface_diagnostics(grid, nan).items():
        assert np.isfinite(np.asarray(f)[cut]).all(), \
            f"{kind}: surface diagnostic {name} non-finite"
