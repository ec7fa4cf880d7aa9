"""Core stencil / tridiagonal / grid unit tests (pure-function tier of the
reference's test pyramid, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from climaocean_tpu.core import stencil as st
from climaocean_tpu.core.tridiagonal import (implicit_vertical_diffusion_matrix,
                                             solve_tridiagonal)
from climaocean_tpu.grids.grid import (latitude_longitude_grid,
                                       rectilinear_grid, with_bottom_height,
                                       R_EARTH)
from climaocean_tpu.grids.vertical import (exponential_z_faces,
                                           find_exponential_scale)


def test_shift_conventions():
    a = jnp.arange(8.0).reshape(1, 1, 8)
    assert float(st.xp1(a)[0, 0, 0]) == 1.0
    assert float(st.xm1(a)[0, 0, 1]) == 0.0
    # face difference of centers: dxf(a)[i] = a[i]-a[i-1]
    assert float(st.dxf(a)[0, 0, 3]) == 1.0
    # center difference of faces: dxc(a)[i] = a[i+1]-a[i]
    assert float(st.dxc(a)[0, 0, 3]) == 1.0


def test_shift_clamp():
    a = jnp.arange(5.0).reshape(5, 1, 1)
    up = st.shift_clamp(a, st.Z, 1)
    assert float(up[-1, 0, 0]) == 4.0       # clamped at top
    dn = st.shift_clamp(a, st.Z, -1)
    assert float(dn[0, 0, 0]) == 0.0


def test_tridiagonal_vs_numpy():
    rng = np.random.default_rng(0)
    Nz = 12
    a = rng.uniform(0.1, 1.0, (Nz, 3, 4)); a[0] = 0
    c = rng.uniform(0.1, 1.0, (Nz, 3, 4)); c[-1] = 0
    b = 2.0 + a + c
    d = rng.normal(size=(Nz, 3, 4))
    x = np.asarray(jax.jit(solve_tridiagonal)(*map(jnp.asarray, (a, b, c, d))))
    # verify residual
    res = b * x + a * np.roll(x, 1, 0) * (np.arange(Nz) > 0)[:, None, None] \
        + c * np.roll(x, -1, 0) * (np.arange(Nz) < Nz - 1)[:, None, None] - d
    assert np.abs(res).max() < 1e-4


def test_implicit_diffusion_conserves_tracer():
    grid = rectilinear_grid((4, 4, 8), z=(-100.0, 0.0))
    kap = jnp.full((9, grid.Nyp, grid.Nxp), 1e-2)
    rng = np.random.default_rng(1)
    T = jnp.asarray(rng.normal(size=(8, grid.Nyp, grid.Nxp)))
    a, b, c = implicit_vertical_diffusion_matrix(
        kap, grid.dz_c, grid.dz_f, 3600.0, grid.wet_c, grid.wet_w)
    Tn = jax.jit(solve_tridiagonal)(a, b, c, T * grid.wet_c)
    col0 = np.sum(np.asarray(T * grid.wet_c * grid.dz_c[:, None, None]), 0)
    col1 = np.sum(np.asarray(Tn * grid.wet_c * grid.dz_c[:, None, None]), 0)
    np.testing.assert_allclose(col0, col1, atol=1e-3)


def test_exponential_vertical_coordinate():
    # reference semantics: dz_top = depth*expm1(dzU/h)/expm1(depth/h)
    h = find_exponential_scale(60, 6000.0, 10.0)
    z = exponential_z_faces(60, 6000.0, scale=h)
    assert z[0] == -6000.0 and z[-1] == 0.0
    dz_top = z[-1] - z[-2]
    assert abs(dz_top - 10.0) < 1e-3
    assert np.all(np.diff(z) > 0)
    # spacing increases with depth
    dz = np.diff(z)
    assert dz[0] > dz[-1]


def test_latlon_grid_metrics():
    grid = latitude_longitude_grid((36, 15, 4), longitude=(-180, 180),
                                   latitude=(-75, 75), z=(-1000.0, 0.0), halo=4)
    assert grid.periodic_x
    H = grid.H
    # dx shrinks with latitude
    dx_eq = float(grid.dx_cc[H + 7, H])   # near equator row
    dx_hi = float(grid.dx_cc[H + 14, H])
    assert dx_hi < dx_eq
    # total wet-surface area approximates the sphere band area
    area = float(jnp.sum(grid.interior(grid.az_cc)))
    exact = 4 * np.pi * R_EARTH ** 2 * np.sin(np.deg2rad(75.0)) / 1.0
    assert abs(area - exact) / exact < 1e-3


def test_immersed_masks():
    grid = latitude_longitude_grid((16, 8, 5), z=(-1000.0, 0.0), halo=4)
    bottom = np.full((8, 16), -1000.0)
    bottom[2:4, 5:8] = -350.0     # seamount
    bottom[0, 0] = -5.0           # shallower than minimum depth -> land
    g2 = with_bottom_height(grid, bottom, minimum_depth=10.0)
    H = g2.H
    wet = np.asarray(g2.wet_c)
    assert wet[:, H + 0, H + 0].sum() == 0          # land column
    assert wet[:, H + 2, H + 5].sum() < 5           # seamount column truncated
    assert wet[:, H + 6, H + 12].sum() == 5         # deep ocean column full
    # u-face between land and ocean is dry
    wu = np.asarray(g2.wet_u)
    assert wu[:, H, H].sum() == 0
