#!/usr/bin/env python
"""Output archival — move completed parts + stale checkpoints off fast disk.

Rebuild of the reference's `store.sh` (`store.sh:7-17`; SURVEY.md §5):
ships completed output part files and all-but-the-newest checkpoint to an
archive directory, keeping the newest checkpoint local so
`pickup=:latest` still works.
"""

import os
import re
import shutil
import sys


def store(outdir, archive):
    os.makedirs(archive, exist_ok=True)
    moved = 0

    # completed parts: every part index except the highest per prefix
    parts = {}
    for f in os.listdir(outdir):
        m = re.match(r"(.+)_part(\d+)\.npz$", f)
        if m:
            parts.setdefault(m.group(1), []).append((int(m.group(2)), f))
    for prefix, lst in parts.items():
        lst.sort()
        for _, f in lst[:-1]:
            shutil.move(os.path.join(outdir, f), os.path.join(archive, f))
            moved += 1

    # checkpoints: keep only the newest locally
    ckpts = []
    for f in os.listdir(outdir):
        m = re.match(r"(.+)_iter(\d+)\.npz$", f)
        if m and "checkpoint" in m.group(1):
            ckpts.append((int(m.group(2)), f))
    ckpts.sort()
    for _, f in ckpts[:-1]:
        shutil.move(os.path.join(outdir, f), os.path.join(archive, f))
        moved += 1

    print(f"[store] moved {moved} files from {outdir} to {archive}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "output"
    archive = sys.argv[2] if len(sys.argv) > 2 else outdir + "_archive"
    store(outdir, archive)
