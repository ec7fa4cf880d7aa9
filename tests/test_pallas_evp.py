"""Fused Pallas mEVP window vs the XLA scan path.

The kernel reproduces the padded path's arithmetic exactly — interior
state, the prognostic fold-seam rows (V face, σ₁₂ corner), the southern
zero-gradient ghost stresses, and the ice→ocean stress epilogue — so
parity is asserted tightly on every prognostic and on the stress handed
to the ocean, on BOTH a bounded lat-lon basin and a tripolar grid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.grids.tripolar import tripolar_grid, dry_unresolvable_cells
from climaocean_tpu.core.halo import fill_halos
from climaocean_tpu.data.synthetic import synthetic_bathymetry
from climaocean_tpu.models.sea_ice import SeaIceModel
from climaocean_tpu.models import sea_ice as si
from climaocean_tpu.models.hydrostatic import HydrostaticModel
from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere


def _latlon_grid():
    return latitude_longitude_grid((32, 16, 3), longitude=(-180, 180),
                                   latitude=(40, 80), z=(-500.0, 0.0),
                                   halo=4)


def _tripolar():
    grid = tripolar_grid((32, 16, 3), southernmost_latitude=-78, halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    bottom = dry_unresolvable_cells(
        grid, np.minimum(synthetic_bathymetry(lon, lat), -0.1))
    return with_bottom_height(grid, bottom, minimum_depth=10.0)


def _case(grid, seed=0, icy_lat=50.0):
    rng = np.random.default_rng(seed)
    H, Nx, Ny = grid.H, grid.Nx, grid.Ny
    lat_i = np.asarray(grid.lat_cc)[H:H + Ny, H:H + Nx]

    def rand2(scale, mask=1.0):
        a = np.zeros((grid.Nyp, grid.Nxp), np.float32)
        a[H:H + Ny, H:H + Nx] = (rng.uniform(-scale, scale, (Ny, Nx))
                                 * mask).astype(np.float32)
        return jnp.asarray(a)

    icy = (np.abs(lat_i) > icy_lat).astype(np.float32)
    model = SeaIceModel(grid=grid, dynamics=True, substeps=40)
    ice = model.initial_state()
    ice = dict(ice,
               thickness=jnp.abs(rand2(2.0, icy)) + 0.5 * fill_like(grid, icy),
               concentration=jnp.clip(jnp.abs(rand2(0.5, icy))
                                      + 0.5 * fill_like(grid, icy), 0, 1),
               snow=jnp.abs(rand2(0.2, icy)),
               u=rand2(0.2), v=rand2(0.2),
               sigma1=rand2(100.0, icy), sigma2=rand2(100.0, icy),
               sigma12=rand2(50.0, icy))
    # entry-fill every stencil-read field, exactly like sea_ice.step
    ice = dict(ice,
               thickness=fill_halos(ice["thickness"], grid),
               concentration=fill_halos(ice["concentration"], grid),
               snow=fill_halos(ice["snow"], grid),
               u=fill_halos(ice["u"], grid, "u", vector=True),
               v=fill_halos(ice["v"], grid, "v", vector=True),
               sigma1=fill_halos(ice["sigma1"], grid),
               sigma2=fill_halos(ice["sigma2"], grid),
               sigma12=fill_halos(ice["sigma12"], grid))

    ocean = HydrostaticModel(grid=grid, substeps=4)
    ostate = ocean.initial_state()
    ostate["T"] = ostate["T"] * 0 - 1.0
    u3 = np.zeros(grid.padded_shape, np.float32)
    u3[:, H:H + Ny, H:H + Nx] = rng.uniform(-0.2, 0.2, (grid.Nz, Ny, Nx))
    ostate["u"] = jnp.asarray(u3) * grid.wet_u
    v3 = np.zeros(grid.padded_shape, np.float32)
    v3[:, H:H + Ny, H:H + Nx] = rng.uniform(-0.2, 0.2, (grid.Nz, Ny, Nx))
    ostate["v"] = jnp.asarray(v3) * grid.wet_v
    atmos = synthetic_prescribed_atmosphere(grid, 0.0, 86400.0).at_time(3600.0)
    return model, ice, ostate, atmos


def fill_like(grid, interior):
    a = np.zeros((grid.Nyp, grid.Nxp), np.float32)
    H = grid.H
    a[H:H + grid.Ny, H:H + grid.Nx] = interior
    return jnp.asarray(a)


def _run(model, ice, ostate, atmos, on, monkeypatch):
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_EVP", "1" if on else "0")
    fn = jax.jit(lambda i, o: si.evp_dynamics(model, i, o, atmos, 1200.0))
    new_ice, tx, ty = fn(ice, ostate)
    return new_ice, tx, ty


@pytest.mark.parametrize("kind", ["latlon", "tripolar"])
def test_evp_window_parity(kind, monkeypatch):
    grid = _latlon_grid() if kind == "latlon" else _tripolar()
    model, ice, ostate, atmos = _case(grid, seed=3,
                                      icy_lat=50.0 if kind == "latlon" else 40.0)
    a_ice, a_tx, a_ty = _run(model, ice, ostate, atmos, True, monkeypatch)
    b_ice, b_tx, b_ty = _run(model, ice, ostate, atmos, False, monkeypatch)
    H, Ny, Nx = grid.H, grid.Ny, grid.Nx

    def interior(x):
        return np.asarray(x)[..., H:H + Ny, H:H + Nx]

    for name in ("u", "v", "sigma1", "sigma2", "sigma12"):
        x = interior(a_ice[name])
        y = interior(b_ice[name])
        scale = max(np.abs(y).max(), 1e-10)
        assert np.abs(x - y).max() / scale < 5e-5, \
            f"{kind} {name}: {np.abs(x - y).max() / scale:.2e}"
    for name, x, y in (("tau_x", a_tx, b_tx), ("tau_y", a_ty, b_ty)):
        xs, ys = interior(x), interior(y)
        scale = max(np.abs(ys).max(), 1e-10)
        assert np.abs(xs - ys).max() / scale < 5e-5, f"{kind} {name}"
    if kind == "tripolar":
        # prognostic seam rows (padded row H+Ny)
        for name in ("v", "sigma12"):
            xs = np.asarray(a_ice[name])[H + Ny, H:H + Nx]
            ys = np.asarray(b_ice[name])[H + Ny, H:H + Nx]
            scale = max(np.abs(ys).max(), 1e-10)
            assert np.abs(xs - ys).max() / scale < 5e-5, f"seam {name}"


def test_evp_pallas_full_step(monkeypatch):
    """The fused window composes with the full ice step (advection +
    thermodynamics) without breaking parity."""
    grid = _tripolar()
    model, ice, ostate, atmos = _case(grid, seed=11, icy_lat=40.0)
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_EVP", "1")
    a, fa = jax.jit(lambda i, o: si.step(model, i, o, atmos, None, 1200.0))(
        ice, ostate)
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_EVP", "0")
    b, fb = jax.jit(lambda i, o: si.step(model, i, o, atmos, None, 1200.0))(
        ice, ostate)
    H, Ny, Nx = grid.H, grid.Ny, grid.Nx
    for name in ("thickness", "concentration", "u", "v", "Ts"):
        x = np.asarray(a[name])[H:H + Ny, H:H + Nx]
        y = np.asarray(b[name])[H:H + Ny, H:H + Nx]
        scale = max(np.abs(y).max(), 1e-10)
        assert np.abs(x - y).max() / scale < 1e-4, name


def _run_block(model, ice, ostate, atmos, on, monkeypatch):
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_EVP", "0")        # window off
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_EVP_BLOCK", "1" if on else "0")
    fn = jax.jit(lambda i, o: si.evp_dynamics(model, i, o, atmos, 1200.0))
    return fn(ice, ostate)


@pytest.mark.parametrize("kind", ["latlon", "tripolar"])
def test_evp_block_parity(kind, monkeypatch):
    """BLOCK kernel (k = H//3 substeps per kernel between fills) vs the
    XLA scan. At H=4, k=1 — the fill cadence is identical to the XLA
    path, so parity is the kernel arithmetic alone."""
    grid = _latlon_grid() if kind == "latlon" else _tripolar()
    model, ice, ostate, atmos = _case(grid, seed=7,
                                      icy_lat=50.0 if kind == "latlon" else 40.0)
    a_ice, a_tx, a_ty = _run_block(model, ice, ostate, atmos, True,
                                   monkeypatch)
    b_ice, b_tx, b_ty = _run_block(model, ice, ostate, atmos, False,
                                   monkeypatch)
    H, Ny, Nx = grid.H, grid.Ny, grid.Nx

    def interior(x):
        return np.asarray(x)[..., H:H + Ny, H:H + Nx]

    for name in ("u", "v", "sigma1", "sigma2", "sigma12"):
        x, y = interior(a_ice[name]), interior(b_ice[name])
        scale = max(np.abs(y).max(), 1e-10)
        assert np.abs(x - y).max() / scale < 5e-5, \
            f"{kind} {name}: {np.abs(x - y).max() / scale:.2e}"
    for name, x, y in (("tau_x", a_tx, b_tx), ("tau_y", a_ty, b_ty)):
        xs, ys = interior(x), interior(y)
        scale = max(np.abs(ys).max(), 1e-10)
        assert np.abs(xs - ys).max() / scale < 5e-5, f"{kind} {name}"


def test_evp_block_deferred_fill_parity(monkeypatch):
    """k = 2 (H = 7): the u/v fills between kernels are DEFERRED within
    the 3-ring-per-substep budget — interior physics stay within stencil
    tolerance of the fill-every-substep XLA path."""
    grid = latitude_longitude_grid((32, 16, 3), longitude=(-180, 180),
                                   latitude=(40, 80), z=(-500.0, 0.0),
                                   halo=7)
    model, ice, ostate, atmos = _case(grid, seed=9, icy_lat=50.0)
    assert max(1, grid.H // 3) == 2
    a_ice, _, _ = _run_block(model, ice, ostate, atmos, True, monkeypatch)
    b_ice, _, _ = _run_block(model, ice, ostate, atmos, False, monkeypatch)
    H, Ny, Nx = grid.H, grid.Ny, grid.Nx
    for name in ("u", "v", "sigma1", "sigma12"):
        x = np.asarray(a_ice[name])[..., H:H + Ny, H:H + Nx]
        y = np.asarray(b_ice[name])[..., H:H + Ny, H:H + Nx]
        scale = max(np.abs(y).max(), 1e-10)
        assert np.abs(x - y).max() / scale < 5e-4, \
            f"{name}: {np.abs(x - y).max() / scale:.2e}"


def test_evp_block_slab_split_is_exact(monkeypatch):
    """y-slab decomposition returns identical interiors (same fp ops on
    the same values in the ghost-extended slabs)."""
    from climaocean_tpu.models.pallas_evp import evp_block_pallas

    grid = _latlon_grid()
    model, ice, ostate, atmos = _case(grid, seed=13, icy_lat=50.0)
    rng = np.random.default_rng(2)
    shp = (grid.Nyp, grid.Nxp)

    def r(s=1.0):
        return jnp.asarray((s * rng.standard_normal(shp)).astype(np.float32))

    state = tuple(r(0.1) for _ in range(5))
    consts = (r(0.1), r(0.1), jnp.abs(r(1e4)), jnp.abs(r(1e-4)),
              jnp.abs(r(1e-4)), jnp.abs(r()) > 0.5, jnp.abs(r()) > 0.5,
              r(0.1), r(0.1), r(0.1), r(0.1), r(0.1), r(0.1),
              r(1e-4), r(1e-4)) + tuple(jnp.abs(r(1e-5)) + 1e-6
                                        for _ in range(8))
    consts = tuple(c.astype(jnp.float32) for c in consts)
    one = evp_block_pallas(state, consts, 1, 500.0, 500.0, 4.0, n_slabs=1)
    two = evp_block_pallas(state, consts, 1, 500.0, 500.0, 4.0, n_slabs=2)
    for a, b in zip(one, two):
        # same fp ops on the same values; tolerance covers backend
        # reassociation across the different padded slab shapes (~1 ulp)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
