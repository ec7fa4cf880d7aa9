"""Lazy FieldTimeSeries reader over npz parts (reference `FieldTimeSeries`
with `InMemory(n)`/`OnDisk()` backends, `common.jl:78`)."""

import numpy as np
import pytest

from climaocean_tpu.simulation.field_time_series import (FieldTimeSeries,
                                                         InMemory, OnDisk)


@pytest.fixture
def parts_dir(tmp_path):
    rng = np.random.default_rng(0)
    nt_per, nparts = 4, 5
    full = rng.normal(size=(nt_per * nparts, 6, 8)).astype(np.float32)
    times = np.arange(nt_per * nparts, dtype=np.float64) * 3600.0
    for k in range(nparts):
        sl = slice(k * nt_per, (k + 1) * nt_per)
        np.savez(tmp_path / f"surf_part{k}.npz", tos=full[sl], time=times[sl])
    return tmp_path, full, times


def test_indexing_matches_eager(parts_dir):
    d, full, times = parts_dir
    fts = FieldTimeSeries(str(d), "surf", "tos")
    assert len(fts) == len(times)
    np.testing.assert_array_equal(fts.times, times)
    for n in (0, 3, 4, 11, 19, -1):
        np.testing.assert_array_equal(fts[n], full[n])
    np.testing.assert_array_equal(fts[5:9], full[5:9])


def test_inmemory_window_bounds_residency(parts_dir):
    d, full, _ = parts_dir
    fts = FieldTimeSeries(str(d), "surf", "tos", backend=InMemory(8))
    for n in range(len(fts)):                       # forward sweep
        np.testing.assert_array_equal(fts[n], full[n])
        assert fts.resident_snapshots <= 8
    for n in reversed(range(len(fts))):             # backward sweep re-loads
        np.testing.assert_array_equal(fts[n], full[n])
        assert fts.resident_snapshots <= 8


def test_ondisk_single_part(parts_dir):
    d, full, _ = parts_dir
    fts = FieldTimeSeries(str(d), "surf", "tos", backend=OnDisk())
    np.testing.assert_array_equal(fts[0], full[0])
    np.testing.assert_array_equal(fts[17], full[17])
    assert fts.resident_snapshots <= 4


def test_missing_prefix_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        FieldTimeSeries(str(tmp_path), "nope", "tos")
