"""Pallas fused barotropic window vs the XLA paths (DESIGN lever 3).

The kernel is the unpadded interior-only formulation fused into one
VMEM-resident loop; it must match the padded production path's interior to
f32 roundoff and conserve mass exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climaocean_tpu.grids.grid import latitude_longitude_grid, with_bottom_height
from climaocean_tpu.models import free_surface as fs
from climaocean_tpu.core.halo import fill_halos
from climaocean_tpu.data.synthetic import synthetic_bathymetry


def _case(nx=48, ny=24, nz=4, seed=0):
    grid = latitude_longitude_grid((nx, ny, nz), longitude=(-180, 180),
                                   latitude=(-70, 70), z=(-3000.0, 0.0),
                                   halo=4)
    lon = np.asarray(grid.interior(grid.lon_cc))
    lat = np.asarray(grid.interior(grid.lat_cc))
    grid = with_bottom_height(grid, np.minimum(synthetic_bathymetry(lon, lat),
                                               -0.1), minimum_depth=10.0)
    rng = np.random.default_rng(seed)
    shp = np.asarray(grid.lat_cc).shape
    H_c, H_u, H_v = fs.column_depths(grid)
    eta = jnp.asarray(rng.normal(0, 0.1, shp).astype(np.float32)) \
        * (H_c > 0)
    U = jnp.asarray(rng.normal(0, 1.0, shp).astype(np.float32)) * (H_u > 0)
    V = jnp.asarray(rng.normal(0, 1.0, shp).astype(np.float32)) * (H_v > 0)
    GU = jnp.asarray(rng.normal(0, 1e-4, shp).astype(np.float32)) * (H_u > 0)
    GV = jnp.asarray(rng.normal(0, 1e-4, shp).astype(np.float32)) * (H_v > 0)
    eta = fill_halos(eta, grid)
    U = fill_halos(U, grid, "u", vector=True)
    V = fill_halos(V, grid, "v", vector=True)
    return grid, fs.BarotropicState(eta, U, V), GU, GV


def _run(grid, bt, GU, GV, which, substeps=24, dt_stage=400.0):
    if which == "pallas":
        fn = lambda: fs._substep_barotropic_pallas(bt, grid, GU, GV,
                                                   dt_stage, substeps,
                                                   fs.G_EARTH)
    elif which == "unpadded":
        fn = lambda: fs._substep_barotropic_unpadded(bt, grid, GU, GV,
                                                     dt_stage, substeps,
                                                     fs.G_EARTH)
    else:
        fn = lambda: fs._substep_barotropic_padded(
            bt, grid, GU, GV, dt_stage, substeps,
            lambda a: fill_halos(a, grid), fs.G_EARTH,
            fill_U=lambda a: fill_halos(a, grid, "u", vector=True),
            fill_V=lambda a: fill_halos(a, grid, "v", vector=True))
    return jax.jit(fn)()


@pytest.mark.parametrize("other", ["unpadded", "padded"])
def test_pallas_window_parity(other):
    grid, bt, GU, GV = _case()
    a, af = _run(grid, bt, GU, GV, "pallas")
    b, bf = _run(grid, bt, GU, GV, other)
    for name in ("eta", "U", "V", "U_eff", "V_eff"):
        x = np.asarray(grid.interior(getattr(a, name)))
        y = np.asarray(grid.interior(getattr(b, name)))
        scale = max(np.abs(y).max(), 1e-12)
        assert np.abs(x - y).max() / scale < 2e-5, name
    for name in ("eta", "U", "V"):
        x = np.asarray(grid.interior(getattr(af, name)))
        y = np.asarray(grid.interior(getattr(bf, name)))
        scale = max(np.abs(y).max(), 1e-12)
        assert np.abs(x - y).max() / scale < 2e-5, f"final {name}"


def test_pallas_window_mass_conservation():
    grid, bt, GU, GV = _case(seed=3)
    avg, fin = _run(grid, bt, GU, GV, "pallas", substeps=40)
    az = np.asarray(grid.interior(grid.az_cc))
    m0 = (np.asarray(grid.interior(bt.eta)) * az).sum()
    m1 = (np.asarray(grid.interior(fin.eta)) * az).sum()
    ma = (np.asarray(grid.interior(avg.eta)) * az).sum()
    scale = np.abs(np.asarray(grid.interior(bt.eta)) * az).sum() + 1e-12
    assert abs(m1 - m0) / scale < 1e-5
    assert abs(ma - m0) / scale < 1e-5


def test_pallas_window_effective_transport_identity():
    """η_avg = η₀ − Δt ∇·U_eff must hold exactly (the mass-consistency
    telescoping that makes ROMS-ordered tracer advection conservative)."""
    grid, bt, GU, GV = _case(seed=5)
    dt_stage = 400.0
    avg, _ = _run(grid, bt, GU, GV, "pallas", substeps=24,
                  dt_stage=dt_stage)
    # fill-then-MASK, like every consumer: zero-gradient bounded-y fills
    # would otherwise put nonzero transport on dry wall faces
    H_c, H_u, H_v = fs.column_depths(grid)
    Ue = fill_halos(avg.U_eff, grid, "u", vector=True) * (H_u > 0)
    Ve = fill_halos(avg.V_eff, grid, "v", vector=True) * (H_v > 0)
    div = fs.barotropic_divergence(Ue, Ve, grid)
    pred = (bt.eta - dt_stage * div) * (H_c > 0)
    x = np.asarray(grid.interior(pred))
    y = np.asarray(grid.interior(avg.eta))
    assert np.abs(x - y).max() < 5e-6 * max(np.abs(y).max(), 1e-12)


# ---------------------------------------------------------------------- #
# tripolar fold (seam INSIDE the kernel via the permutation matmul)
# ---------------------------------------------------------------------- #

def _tripolar_case(nx=32, ny=16, nz=3, seed=0):
    from climaocean_tpu.grids.tripolar import tripolar_grid
    grid = tripolar_grid((nx, ny, nz), southernmost_latitude=-78, halo=4)
    rng = np.random.default_rng(seed)
    shp = np.asarray(grid.lat_cc).shape
    H_c, H_u, H_v = fs.column_depths(grid)
    eta = jnp.asarray(rng.normal(0, 0.1, shp).astype(np.float32)) * (H_c > 0)
    U = jnp.asarray(rng.normal(0, 1.0, shp).astype(np.float32)) * (H_u > 0)
    V = jnp.asarray(rng.normal(0, 1.0, shp).astype(np.float32)) * (H_v > 0)
    GU = jnp.asarray(rng.normal(0, 1e-4, shp).astype(np.float32)) * (H_u > 0)
    GV = jnp.asarray(rng.normal(0, 1e-4, shp).astype(np.float32)) * (H_v > 0)
    eta = fill_halos(eta, grid)
    U = fill_halos(U, grid, "u", vector=True)
    V = fill_halos(V, grid, "v", vector=True)
    GU = fill_halos(GU, grid, "u", vector=True) * (H_u > 0)
    GV = fill_halos(GV, grid, "v", vector=True) * (H_v > 0)
    return grid, fs.BarotropicState(eta, U, V), GU, GV


def _run_fold(grid, bt, GU, GV, which, substeps=24, dt_stage=400.0):
    if which == "pallas":
        fn = lambda: fs._substep_barotropic_pallas(bt, grid, GU, GV,
                                                   dt_stage, substeps,
                                                   fs.G_EARTH, fold=True)
    else:
        fn = lambda: fs._substep_barotropic_padded(
            bt, grid, GU, GV, dt_stage, substeps,
            lambda a: fill_halos(a, grid), fs.G_EARTH,
            fill_U=lambda a: fill_halos(a, grid, "u", vector=True),
            fill_V=lambda a: fill_halos(a, grid, "v", vector=True))
    return jax.jit(fn)()


def test_pallas_fold_window_parity():
    """Fold-aware kernel matches the padded production path on a tripolar
    grid — interior state AND the prognostic seam V row."""
    grid, bt, GU, GV = _tripolar_case()
    a, af = _run_fold(grid, bt, GU, GV, "pallas")
    b, bf = _run_fold(grid, bt, GU, GV, "padded")
    H, Ny, Nx = grid.H, grid.Ny, grid.Nx
    for name in ("eta", "U", "V", "U_eff", "V_eff"):
        x = np.asarray(grid.interior(getattr(a, name)))
        y = np.asarray(grid.interior(getattr(b, name)))
        scale = max(np.abs(y).max(), 1e-12)
        assert np.abs(x - y).max() / scale < 3e-5, name
    # the seam V face row (padded row H+Ny) is prognostic on folded grids
    for name in ("V", "V_eff"):
        xs = np.asarray(getattr(a, name))[..., H + Ny, H:H + Nx]
        ys = np.asarray(getattr(b, name))[..., H + Ny, H:H + Nx]
        scale = max(np.abs(ys).max(), 1e-12)
        assert np.abs(xs - ys).max() / scale < 3e-5, f"seam {name}"
    for name in ("eta", "U", "V"):
        x = np.asarray(grid.interior(getattr(af, name)))
        y = np.asarray(grid.interior(getattr(bf, name)))
        scale = max(np.abs(y).max(), 1e-12)
        assert np.abs(x - y).max() / scale < 3e-5, f"final {name}"


def test_pallas_fold_mass_conservation():
    """Seam fluxes are antisymmetric: what leaves one side of the fold
    enters the mirror side, so total mass is conserved across the seam."""
    grid, bt, GU, GV = _tripolar_case(seed=3)
    avg, fin = _run_fold(grid, bt, GU, GV, "pallas", substeps=40)
    az = np.asarray(grid.interior(grid.az_cc))
    m0 = (np.asarray(grid.interior(bt.eta)) * az).sum()
    m1 = (np.asarray(grid.interior(fin.eta)) * az).sum()
    ma = (np.asarray(grid.interior(avg.eta)) * az).sum()
    scale = np.abs(np.asarray(grid.interior(bt.eta)) * az).sum() + 1e-12
    assert abs(m1 - m0) / scale < 2e-5
    assert abs(ma - m0) / scale < 2e-5


def test_pallas_fold_seam_antisymmetry():
    """The evolved seam row satisfies Vs(i) = −Vs(mirror(i))."""
    grid, bt, GU, GV = _tripolar_case(seed=7)
    avg, fin = _run_fold(grid, bt, GU, GV, "pallas", substeps=24)
    H, Ny, Nx = grid.H, grid.Ny, grid.Nx
    p = int(grid.kind.split(":")[1])
    mmap = (2 * p - 1 - np.arange(Nx)) % Nx
    for arr in (avg.V, avg.V_eff, fin.V):
        s = np.asarray(arr)[..., H + Ny, H:H + Nx]
        assert np.abs(s + s[..., mmap]).max() < 1e-5 * (np.abs(s).max() + 1e-12)


def test_fold_routing_engages(monkeypatch):
    """substep_barotropic routes tripolar grids through the fused kernel
    when forced on (and falls back to padded when VMEM-gated off)."""
    import climaocean_tpu.models.free_surface as fsm
    grid, bt, GU, GV = _tripolar_case(seed=1)
    monkeypatch.setenv("CLIMAOCEAN_PALLAS_BAROTROPIC", "1")
    called = {}
    orig = fsm._substep_barotropic_pallas

    def spy(*a, **kw):
        called["fold"] = kw.get("fold")
        return orig(*a, **kw)

    monkeypatch.setattr(fsm, "_substep_barotropic_pallas", spy)
    avg, _ = fs.substep_barotropic(
        bt, grid, GU, GV, 400.0, 8, lambda a: fill_halos(a, grid),
        fill_U=lambda a: fill_halos(a, grid, "u", vector=True),
        fill_V=lambda a: fill_halos(a, grid, "v", vector=True))
    assert called.get("fold") is True
