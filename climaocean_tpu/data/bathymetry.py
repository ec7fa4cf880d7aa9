"""Bathymetry regridding.

TPU-native rebuild of NumericalEarth's `regrid_bathymetry(grid;
minimum_depth, major_basins, interpolation_passes)` (reference call sites:
`latitude_longitude.jl:39-42` (minimum_depth=10, passes=5, major_basins=3),
`one_degree_tripolar.jl` (passes=10, basins=2), `half_degree` (25, 1),
`sixth_degree` (passes=40); SURVEY.md §2b).

Semantics reproduced:
* conservative area remap of the source bathymetry (ETOPO or the analytic
  proxy) onto the model grid;
* ``interpolation_passes`` diffusive smoothing passes;
* cells shallower than ``minimum_depth`` become land;
* ``major_basins = N``: keep the N largest connected ocean basins, fill the
  rest (lakes/seas) to land — connected components via scipy.ndimage with
  x-periodic wraparound handling.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from .metadata import ETOPO, Metadatum, load_native
from .synthetic import synthetic_bathymetry


def _source_bathymetry(grid, dataset=None, dir="."):
    """Bottom height on a native lat/lon grid: file-backed ETOPO when
    present, else the analytic proxy evaluated at ~1/4° resolution."""
    meta = Metadatum("bottom_height", dataset=dataset or ETOPO(), dir=dir)
    try:
        data, z_f, lat_f, lon_f = load_native(meta)
        return data[0] if data.ndim == 3 else data, lat_f, lon_f
    except Exception:
        # no local file / unreadable or mismatched NetCDF -> analytic proxy
        nlat, nlon = 720, 1440
        lat_f = np.linspace(-90, 90, nlat + 1)
        lon_f = np.linspace(-180, 180, nlon + 1)
        lat_c = 0.5 * (lat_f[:-1] + lat_f[1:])
        lon_c = 0.5 * (lon_f[:-1] + lon_f[1:])
        LON, LAT = np.meshgrid(lon_c, lat_c)
        return synthetic_bathymetry(LON, LAT), lat_f, lon_f


def smooth_passes(h, passes, periodic_x=True):
    """Diffusive smoothing, ocean cells only (land stays put)."""
    for _ in range(passes):
        acc = 2.0 * h
        cnt = 2.0
        up = np.vstack([h[:1], h[:-1]])
        dn = np.vstack([h[1:], h[-1:]])
        if periodic_x:
            le, ri = np.roll(h, 1, 1), np.roll(h, -1, 1)
        else:
            le = np.hstack([h[:, :1], h[:, :-1]])
            ri = np.hstack([h[:, 1:], h[:, -1:]])
        h = (acc + up + dn + le + ri) / (cnt + 4.0)
    return h


def keep_major_basins(h, n_basins, periodic_x=True):
    """Fill all but the N largest connected ocean components to land."""
    ocean = h < 0
    labels, n = ndimage.label(ocean)
    if n <= n_basins:
        return h
    if periodic_x:
        # merge components connected across the x seam
        for j in range(labels.shape[0]):
            a, b = labels[j, 0], labels[j, -1]
            if a > 0 and b > 0 and a != b:
                labels[labels == b] = a
    ids, sizes = np.unique(labels[labels > 0], return_counts=True)
    keep = set(ids[np.argsort(sizes)[::-1][:n_basins]])
    fill = ocean & ~np.isin(labels, list(keep))
    out = h.copy()
    out[fill] = 0.1
    return out


def regrid_bathymetry(grid, minimum_depth=0.0, major_basins=None,
                      interpolation_passes=1, dataset=None, dir="."):
    """Return the (Ny, Nx) bottom-height array for `with_bottom_height`."""
    src, lat_f, lon_f = _source_bathymetry(grid, dataset, dir)

    # curvilinear-aware: conservative on constant-latitude rows; on the
    # tripolar cap (rows there are NOT latitude lines — a 1-D ladder would
    # misplace the Arctic bathymetry) an anti-aliased area box remap at the
    # true (lon_cc, lat_cc) — point sampling would alias ridges/straits
    from .regrid import HorizontalRegridPlan
    h = HorizontalRegridPlan(grid, lat_f, lon_f, antialias=True).apply(src)

    if interpolation_passes > 1:
        h = smooth_passes(h, interpolation_passes - 1, grid.periodic_x)
    if minimum_depth > 0:
        h = np.where(h > -minimum_depth, np.maximum(h, 0.1), h)
    if major_basins is not None:
        h = keep_major_basins(h, major_basins, grid.periodic_x)
    return np.minimum(h, 0.0) + np.where(h >= 0, 0.1, 0.0)
