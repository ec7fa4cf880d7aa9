"""Lazy time-series reader over npz part files.

Counterpart of Oceananigans' `FieldTimeSeries` with lazy `InMemory(n)` /
`OnDisk()` backends (reference usage: `strait_transports.jl:62-64`,
`common.jl:78`, `visualize_sixth_degree_simulation.jl` `backend=OnDisk()`):
indexing `fts[n]` serves snapshot ``n`` of one variable from the part file
that holds it, keeping at most ``n`` part files' worth of that variable
resident — so figure scripts can sweep multi-year 3-D output without
loading it whole (`read_parts` is the eager alternative).
"""

from __future__ import annotations

import os
import re
from collections import OrderedDict

import numpy as np


class InMemory:
    """Backend keeping at most ``n`` snapshots resident (reference
    `InMemory(n)`); `InMemory()` with n=None keeps everything."""

    def __init__(self, n: int | None = None):
        self.n = n


class OnDisk:
    """Backend keeping only the single most recent part resident."""


class FieldTimeSeries:
    """``fts = FieldTimeSeries(dir, prefix, "tos"); fts[n] -> array``.

    Part files are the `FieldWriter` product: ``<prefix>_part<k>.npz``
    with arrays stacked along time plus a ``time`` vector. The part
    inventory and times load eagerly (cheap); variable data loads per
    part on demand with LRU eviction sized by the backend.
    """

    def __init__(self, dir, prefix, name, backend=None):
        self.dir, self.prefix, self.name = dir, prefix, name
        self.backend = backend or InMemory()
        # parts may be .npz (default) or .nc (`FieldWriter(format="netcdf")`)
        pat = re.compile(rf"{re.escape(prefix)}_part(\d+)\.(npz|nc)$")
        parts = sorted((int(m.group(1)), os.path.join(dir, f))
                       for f in os.listdir(dir) if (m := pat.match(f)))
        if not parts:
            raise FileNotFoundError(f"no parts '{prefix}_part*' in {dir}")
        self._paths = [p for _, p in parts]
        # record spans: times per part (loading only the 'time' key)
        self._starts, times = [], []
        for p in self._paths:
            t = np.atleast_1d(self._read_key(p, "time"))
            self._starts.append(len(times))
            times.extend(t.tolist())
        self.times = np.asarray(times)
        self._cache: OrderedDict[int, np.ndarray] = OrderedDict()

    @staticmethod
    def _read_key(path, name):
        if path.endswith(".nc"):
            from ..data.netcdf import open_netcdf
            with open_netcdf(path) as nc:
                return np.asarray(nc.variables[name][...])
        with np.load(path) as f:
            return np.asarray(f[name])

    def __len__(self):
        return len(self.times)

    # ------------------------------------------------------------- internals
    def _part_of(self, n):
        for i in range(len(self._starts) - 1, -1, -1):
            if n >= self._starts[i]:
                return i
        raise IndexError(n)

    def _snapshots_per_part(self):
        return max(self._starts[1] - self._starts[0], 1) \
            if len(self._starts) > 1 else len(self.times)

    def _max_parts(self):
        if isinstance(self.backend, OnDisk):
            return 1
        if self.backend.n is None:
            return len(self._paths)
        return max(1, int(np.ceil(self.backend.n / self._snapshots_per_part())))

    def _load_part(self, i):
        arr = self._cache.get(i)
        if arr is None:
            arr = self._read_key(self._paths[i], self.name)
            self._cache[i] = arr
            while len(self._cache) > self._max_parts():
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(i)
        return arr

    # ------------------------------------------------------------ public API
    def __getitem__(self, n):
        if isinstance(n, slice):
            return np.stack([self[i] for i in range(*n.indices(len(self)))])
        if n < 0:
            n += len(self)
        i = self._part_of(n)
        return self._load_part(i)[n - self._starts[i]]

    @property
    def resident_snapshots(self):
        return sum(a.shape[0] for a in self._cache.values())
