"""Two-tier JRA55 forcing storage: symlink farm + async year staging.

TPU-native rebuild of the reference's `jra55_data_staging.jl` (247 LoC;
SURVEY.md §2a "JRA55 staging" row, call stack §3.4): forcing lives on slow
bulk storage (`forcing_dir`); the model reads through a staging directory
(`staging_dir`) on fast scratch that starts as a symlink farm into the bulk
copy. A background thread copies the current + next simulated year's files
to scratch ahead of the clock (atomic `rename(2)` over the symlink, so
readers on any process see either the symlink or the complete copy —
reference `:55-61,144-151`), and years older than current−1 are unstaged
back to symlinks to bound scratch use (~25 GB/yr in the reference,
`:237-243`).

Process discipline mirrors the reference (`:157-159,186-196`): only
process 0 mutates the filesystem (`jax.process_index() == 0` replaces
`@root`); the background worker touches only files — never collectives —
so it is safe off-thread; `requested_years` advances identically on every
rank, keeping any rank-synchronized work symmetric.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import threading

# the 11 JRA55-do variables (reference `jra55_data_staging.jl:8`)
JRA55_SHORTNAMES = ("tas", "huss", "psl", "uas", "vas", "rlds", "rsds",
                    "prra", "prsn", "friver", "licalvf")


def _is_rank0() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def atomic_replace(tmp_path, dst_path):
    """Publish ``tmp_path`` at ``dst_path`` via rename(2) — atomic on one
    filesystem, so concurrent readers never observe a partial file
    (reference `atomic_replace!`, `jra55_data_staging.jl:55-61`)."""
    os.replace(tmp_path, dst_path)


def year_files(forcing_dir, year):
    """Forcing files belonging to ``year``: any file whose name contains
    the 4-digit year (the JRA55-do per-year file layout)."""
    tag = str(year)
    out = []
    for name in sorted(os.listdir(forcing_dir)):
        if tag in name and os.path.isfile(os.path.join(forcing_dir, name)):
            out.append(name)
    return out


def setup_staging_directory(forcing_dir, staging_dir):
    """Create/heal the staging symlink farm: every forcing file appears in
    ``staging_dir`` as a symlink into ``forcing_dir``, except files already
    fully staged (same size as the source — kept). Regular files whose
    size mismatches the source are truncated leftovers from a crash mid-
    copy and are healed back to symlinks (reference `:24-48`). Rank-0 only;
    other ranks return immediately (cross-rank visibility is via the
    shared filesystem)."""
    if not _is_rank0():
        return staging_dir
    os.makedirs(staging_dir, exist_ok=True)
    # sweep temp leftovers from copies/symlinks that died mid-flight (the
    # reference removes `.nc.tmp` leftovers at setup, `:36-41`); these are
    # only ever created under the temp prefixes below, never published
    for name in os.listdir(staging_dir):
        if name.startswith((".stage_cp_", ".stage_ln_", ".download_")):
            try:
                os.remove(os.path.join(staging_dir, name))
            except OSError:
                pass
    for name in sorted(os.listdir(forcing_dir)):
        src = os.path.join(forcing_dir, name)
        if not os.path.isfile(src):
            continue
        dst = os.path.join(staging_dir, name)
        if os.path.islink(dst):
            continue
        if os.path.isfile(dst):
            if os.path.getsize(dst) == os.path.getsize(src):
                continue                      # healthy staged copy: keep
            os.remove(dst)                    # truncated crash leftover
        _symlink_over(src, dst)
    return staging_dir


def _symlink_over(src, dst):
    """Atomically (re)point ``dst`` at ``src`` as a symlink."""
    d = os.path.dirname(dst)
    tmp = tempfile.mktemp(prefix=".stage_ln_", dir=d)
    os.symlink(os.path.abspath(src), tmp)
    os.replace(tmp, dst)


def stage_year(forcing_dir, staging_dir, year):
    """Copy ``year``'s files to fast scratch: copy to a temp name in
    ``staging_dir`` then atomic-rename over the symlink (reference
    `stage_jra55_year!`). Files already staged (regular, size-matched) are
    skipped. Returns the number of files copied."""
    copied = 0
    for name in year_files(forcing_dir, year):
        src = os.path.join(forcing_dir, name)
        dst = os.path.join(staging_dir, name)
        if (os.path.exists(dst) and not os.path.islink(dst)
                and os.path.getsize(dst) == os.path.getsize(src)):
            continue
        fd, tmp = tempfile.mkstemp(prefix=".stage_cp_", dir=staging_dir)
        os.close(fd)
        try:
            shutil.copyfile(src, tmp)
            atomic_replace(tmp, dst)
            copied += 1
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
    return copied


def unstage_year(forcing_dir, staging_dir, year):
    """Restore ``year``'s staged copies to symlinks, freeing scratch
    (reference `unstage_jra55_year!`, `:237-243`)."""
    freed = 0
    for name in year_files(forcing_dir, year):
        dst = os.path.join(staging_dir, name)
        if os.path.exists(dst) and not os.path.islink(dst):
            _symlink_over(os.path.join(forcing_dir, name), dst)
            freed += 1
    return freed


class JRA55DataStagingCallback:
    """Simulation callback running the reap / block / spawn / unstage state
    machine of the reference (`jra55_data_staging.jl:154-247`):

    * **reap** finished background copies (non-blocking);
    * **block** when the simulation clock has caught up with an in-flight
      copy of the year it is about to read (`ensure_year_ready!`);
    * **spawn** staging of the current + next year on a daemon thread
      (no collectives off-thread — files only);
    * **unstage** years older than ``current − 1``.

    ``year_of(t)`` maps simulation seconds to a calendar year (default:
    365-day years from ``start_year``). All ranks advance
    ``requested_years`` identically; only rank 0 touches the filesystem.
    """

    def __init__(self, forcing_dir, staging_dir, start_year=1958,
                 year_of=None, copy_fn=None):
        self.forcing_dir = forcing_dir
        self.staging_dir = staging_dir
        self.start_year = start_year
        self.year_of = year_of or (
            lambda t: start_year + int(t // (365.0 * 86400.0)))
        self._copy = copy_fn or stage_year
        self.requested_years: set[int] = set()
        self.staged_years: set[int] = set()
        self._inflight: dict[int, threading.Thread] = {}
        setup_staging_directory(forcing_dir, staging_dir)

    # -- state machine pieces (reference :167-243) ----------------------- #
    def _reap(self):
        for year, th in list(self._inflight.items()):
            if not th.is_alive():
                th.join()
                self._inflight.pop(year)
                self.staged_years.add(year)

    def _ensure_ready(self, year):
        th = self._inflight.get(year)
        if th is not None:                    # sim caught up: block
            th.join()
            self._inflight.pop(year, None)
            self.staged_years.add(year)

    def _spawn(self, year):
        if (year in self.staged_years or year in self._inflight
                or not year_files(self.forcing_dir, year)):
            return
        if not _is_rank0():
            self.staged_years.add(year)       # bookkeeping stays symmetric
            return
        th = threading.Thread(
            target=self._copy,
            args=(self.forcing_dir, self.staging_dir, year), daemon=True)
        th.start()
        self._inflight[year] = th

    def _unstage_old(self, current):
        for year in sorted(y for y in self.staged_years if y < current - 1):
            if _is_rank0():
                unstage_year(self.forcing_dir, self.staging_dir, year)
            self.staged_years.discard(year)

    # -- callback entry point -------------------------------------------- #
    def __call__(self, sim):
        current = self.year_of(sim.time)
        self.requested_years.update((current, current + 1))
        self._reap()
        self._ensure_ready(current)
        self._spawn(current)
        self._spawn(current + 1)
        self._unstage_old(current)

    def wait(self):
        """Join all in-flight copies (for tests/shutdown)."""
        for year in list(self._inflight):
            self._ensure_ready(year)
