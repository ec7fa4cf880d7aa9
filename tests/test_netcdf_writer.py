"""NetCDF output-writer option + single-gather write path.

VERDICT r3 items 7 & 8: `omip_simulation(..., diagnostics_kw=
dict(format="netcdf"))` must produce classic NetCDF parts any external
tool can open (the interoperable alternative to npz; reference
`omip_diagnostics.jl:152-158` JLD2), `FieldTimeSeries` must read both
formats, and each writer fire must pay exactly ONE device→host gather.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climaocean_tpu.configurations.omip import omip_simulation
from climaocean_tpu.simulation.field_time_series import FieldTimeSeries


@pytest.fixture(scope="module")
def netcdf_run(tmp_path_factory):
    from climaocean_tpu.simulation.simulation import IterationInterval

    out = tmp_path_factory.mktemp("ncout")
    sim = omip_simulation(
        "latlon", dt=1800.0, stop_iteration=24, with_sea_ice=True,
        diagnostics=True, output_dir=str(out), resolution=15.0, Nz=5,
        depth=3000.0, progress_interval=1000,
        diagnostics_kw=dict(format="netcdf", file_splitting=1,
                            surface_schedule=IterationInterval(12),
                            fields_schedule=IterationInterval(12),
                            scalars_schedule=IterationInterval(12)))
    sim.run()
    for w in sim.output_writers:
        if hasattr(w, "close"):
            w.close()
    return out


def test_netcdf_parts_written_and_scipy_openable(netcdf_run):
    """Parts are classic NetCDF: scipy (an independent reader stack from
    the in-tree h5py path) opens them, dims/coords/attrs are CF-ish."""
    from scipy.io import netcdf_file

    parts = sorted(netcdf_run.glob("omip_surface_part*.nc"))
    assert parts, list(netcdf_run.iterdir())
    with netcdf_file(str(parts[0]), "r", mmap=False) as f:
        assert "time" in f.variables
        assert "tos" in f.variables
        v = f.variables["tos"]
        assert v.dimensions[0] == "time"
        assert v.standard_name == b"sea_surface_temperature"
        lat = f.variables["lat"]
        assert lat.units == b"degrees_north"
        tos = np.asarray(v[:])
        assert np.isfinite(tos).any()
        # interior-sliced global shape for a 15-degree latlon grid
        assert tos.shape[-2:] == (10, 24)


def test_netcdf_3d_fields_and_scalars(netcdf_run):
    from scipy.io import netcdf_file

    parts = sorted(netcdf_run.glob("omip_fields_part*.nc"))
    assert parts
    with netcdf_file(str(parts[0]), "r", mmap=False) as f:
        T = f.variables["T"]
        assert len(T.dimensions) == 4          # time, z, y, x
        assert "z" in f.variables
        z = np.asarray(f.variables["z"][:])
        assert z.shape == (5,) and (z < 0).all()
    sparts = sorted(netcdf_run.glob("omip_scalars_part*.nc"))
    assert sparts
    with netcdf_file(str(sparts[0]), "r", mmap=False) as f:
        assert np.asarray(f.variables["zosga"][:]).ndim == 1


def test_field_time_series_reads_netcdf_parts(netcdf_run):
    fts = FieldTimeSeries(str(netcdf_run), "omip_surface", "tos")
    assert len(fts) >= 1
    snap = fts[0]
    assert snap.shape == (10, 24)
    assert np.isfinite(snap).any()
    assert np.all(np.diff(fts.times) > 0)


def test_netcdf_npz_round_trip(tmp_path):
    """write_netcdf_part → read_netcdf_part is the identity on the record
    dict contract."""
    from climaocean_tpu.data.netcdf import read_netcdf_part, write_netcdf_part

    rng = np.random.default_rng(0)
    stacked = {
        "time": np.array([0.0, 3600.0]),
        "iteration": np.array([10, 20]),
        "tos": rng.standard_normal((2, 6, 8)).astype(np.float32),
        "T": rng.standard_normal((2, 4, 6, 8)).astype(np.float32),
        "zosga": rng.standard_normal(2).astype(np.float32),
    }
    path = str(tmp_path / "t_part0.nc")
    write_netcdf_part(path, stacked, grid=None)
    back = read_netcdf_part(path)
    for k, v in stacked.items():
        np.testing.assert_allclose(back[k], v, rtol=1e-6, err_msg=k)


def test_writer_fires_one_gather(monkeypatch, tmp_path):
    """Each writer fire pays exactly ONE device→host gather
    (`fetch_global_tree`), not one per field (VERDICT r3 item 8)."""
    from climaocean_tpu.parallel import mesh as mesh_mod
    from climaocean_tpu.simulation.diagnostics import FieldWriter
    from climaocean_tpu.simulation.simulation import IterationInterval

    calls = {"n": 0}
    real = mesh_mod.fetch_global_tree

    def counting(tree):
        calls["n"] += 1
        return real(tree)

    monkeypatch.setattr(mesh_mod, "fetch_global_tree", counting)

    from climaocean_tpu.grids.grid import latitude_longitude_grid
    grid = latitude_longitude_grid((8, 6, 3), z=(-300.0, 0.0), halo=4)

    def diags(grid, state):
        return {"a": state["a"], "b": state["a"] ** 2, "c": state["a"][-1],
                "d": state["a"][0], "e": jnp.sum(state["a"])}

    w = FieldWriter(diags, grid, str(tmp_path), "g", IterationInterval(1))

    class FakeSim:
        state = {"a": jnp.ones((3, grid.Nyp, grid.Nxp))}
        iteration = 1
        time = 0.0

    w.maybe_write(FakeSim())
    assert calls["n"] == 1
