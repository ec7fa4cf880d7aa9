"""JRA55 two-tier staging pipeline tests (reference
`jra55_data_staging.jl`; SURVEY.md §3.4): symlink farm setup + crash
healing, atomic year staging, unstaging, and the callback state machine
driven through simulated years.
"""

import os

import pytest

from climaocean_tpu.data.staging import (JRA55_SHORTNAMES,
                                         JRA55DataStagingCallback,
                                         setup_staging_directory, stage_year,
                                         unstage_year, year_files)


@pytest.fixture
def forcing(tmp_path):
    """Bulk forcing dir: 3 variables × 3 years of fake files."""
    fd = tmp_path / "forcing"
    fd.mkdir()
    for var in ("tas", "uas", "prra"):
        for year in (1958, 1959, 1960):
            (fd / f"{var}_jra55_{year}.nc").write_bytes(
                f"{var}{year}".encode() * 100)
    return str(fd)


def test_setup_symlink_farm(forcing, tmp_path):
    sd = str(tmp_path / "scratch")
    setup_staging_directory(forcing, sd)
    names = sorted(os.listdir(sd))
    assert len(names) == 9
    for n in names:
        p = os.path.join(sd, n)
        assert os.path.islink(p)
        # reads through the link see the bulk bytes
        assert open(p, "rb").read() == open(os.path.join(forcing, n), "rb").read()


def test_setup_heals_truncated(forcing, tmp_path):
    sd = str(tmp_path / "scratch")
    setup_staging_directory(forcing, sd)
    name = "tas_jra55_1958.nc"
    # full staged copy survives healing; truncated one is re-linked
    stage_year(forcing, sd, 1958)
    assert not os.path.islink(os.path.join(sd, name))
    with open(os.path.join(sd, "uas_jra55_1959.nc"), "wb") as f:
        f.write(b"partial")          # crash mid-copy leftover (over-link is
    # impossible via rename, so simulate by replacing the link)
    setup_staging_directory(forcing, sd)
    assert not os.path.islink(os.path.join(sd, name))          # kept
    assert os.path.islink(os.path.join(sd, "uas_jra55_1959.nc"))  # healed


def test_stage_and_unstage_year(forcing, tmp_path):
    sd = str(tmp_path / "scratch")
    setup_staging_directory(forcing, sd)
    assert year_files(forcing, 1959) == sorted(
        f"{v}_jra55_1959.nc" for v in ("tas", "uas", "prra"))
    n = stage_year(forcing, sd, 1959)
    assert n == 3
    for v in ("tas", "uas", "prra"):
        p = os.path.join(sd, f"{v}_jra55_1959.nc")
        assert not os.path.islink(p)
        assert open(p, "rb").read() == f"{v}1959".encode() * 100
    # idempotent: already-staged files skipped
    assert stage_year(forcing, sd, 1959) == 0
    assert unstage_year(forcing, sd, 1959) == 3
    assert all(os.path.islink(os.path.join(sd, f"{v}_jra55_1959.nc"))
               for v in ("tas", "uas", "prra"))


class _FakeSim:
    def __init__(self, t):
        self.time = t


def test_callback_state_machine(forcing, tmp_path):
    sd = str(tmp_path / "scratch")
    yr = 365.0 * 86400.0
    cb = JRA55DataStagingCallback(forcing, sd, start_year=1958)

    cb(_FakeSim(0.0))            # year 1958: stage 1958 + 1959
    cb.wait()
    cb(_FakeSim(0.0))            # reap
    assert {1958, 1959} <= cb.staged_years
    assert not os.path.islink(os.path.join(sd, "tas_jra55_1958.nc"))
    assert not os.path.islink(os.path.join(sd, "tas_jra55_1959.nc"))
    assert os.path.islink(os.path.join(sd, "tas_jra55_1960.nc"))

    cb(_FakeSim(2.5 * yr))       # year 1960: stage it, unstage 1958
    cb.wait()
    cb(_FakeSim(2.5 * yr))
    assert 1960 in cb.staged_years
    assert 1958 not in cb.staged_years
    assert os.path.islink(os.path.join(sd, "tas_jra55_1958.nc"))
    assert not os.path.islink(os.path.join(sd, "tas_jra55_1960.nc"))
    # 1961 has no files: requested but never staged, no error
    assert 1961 in cb.requested_years


def test_callback_blocks_when_caught_up(forcing, tmp_path):
    """ensure_year_ready!: a slow in-flight copy of the current year is
    joined before the callback returns."""
    import time

    sd = str(tmp_path / "scratch")
    done = []

    def slow_copy(fd, sdir, year):
        time.sleep(0.2)
        stage_year(fd, sdir, year)
        done.append(year)

    cb = JRA55DataStagingCallback(forcing, sd, start_year=1958,
                                  copy_fn=slow_copy)
    cb(_FakeSim(0.0))            # spawns slow copies (non-blocking: reads
    # fall through the symlink to bulk storage until the copy lands)
    assert 1958 not in cb.staged_years or 1958 in done
    cb(_FakeSim(0.0))            # second fire with the copy in flight:
    # ensure_year_ready! joins it before returning
    assert 1958 in done
    assert 1958 in cb.staged_years


def test_shortnames_inventory():
    assert len(JRA55_SHORTNAMES) == 11
    assert "licalvf" in JRA55_SHORTNAMES
