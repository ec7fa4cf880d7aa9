"""Conservative 1-D regridding, composed z→y→x.

TPU-native replacement for the reference's `three_dimensional_regrid!`
(`/root/reference/src/InitialConditions/InitialConditions.jl:33-68`), which
regrids 3-D datasets as three successive 1-D conservative `regrid!` passes
through intermediate grids. Host-side numpy — runs once at setup, feeding
device arrays (SURVEY.md §3.3).
"""

from __future__ import annotations

import numpy as np


def conservative_regrid_1d(src_faces, dst_faces, data, axis=0):
    """First-order conservative remap of cell-averaged ``data`` from source
    cells (edges ``src_faces``) to destination cells (edges ``dst_faces``)
    along ``axis``. Overlap-weighted averaging; destination cells that do
    not overlap the source range copy the nearest source cell."""
    src_faces = np.asarray(src_faces, dtype=np.float64)
    dst_faces = np.asarray(dst_faces, dtype=np.float64)
    ns = src_faces.size - 1
    nd = dst_faces.size - 1

    # overlap matrix (nd, ns) — fine at the sizes we use (<= few thousand)
    lo = np.maximum(dst_faces[:-1, None], src_faces[None, :-1])
    hi = np.minimum(dst_faces[1:, None], src_faces[None, 1:])
    w = np.clip(hi - lo, 0.0, None)
    wsum = w.sum(axis=1, keepdims=True)

    # fallback to nearest source cell where there is no overlap
    src_centers = 0.5 * (src_faces[:-1] + src_faces[1:])
    dst_centers = 0.5 * (dst_faces[:-1] + dst_faces[1:])
    nearest = np.abs(dst_centers[:, None] - src_centers[None, :]).argmin(axis=1)
    w_nearest = np.zeros_like(w)
    w_nearest[np.arange(nd), nearest] = 1.0
    empty = (wsum <= 0)
    w = np.where(empty, w_nearest, w / np.where(wsum > 0, wsum, 1.0))

    data = np.moveaxis(np.asarray(data, dtype=np.float64), axis, 0)
    out = np.tensordot(w, data, axes=(1, 0))
    return np.moveaxis(out, 0, axis)


def regrid_3d(data, src, dst):
    """Regrid ``data`` with cell edges ``src = (z_f, y_f, x_f)`` to
    ``dst = (z_f, y_f, x_f)``, one conservative pass per direction in the
    reference's z→y→x order. ``data`` has shape (nz, ny, nx)."""
    zs, ys, xs = src
    zd, yd, xd = dst
    out = conservative_regrid_1d(zs, zd, data, axis=0)
    out = conservative_regrid_1d(ys, yd, out, axis=1)
    out = conservative_regrid_1d(xs, xd, out, axis=2)
    return out


def fill_ocean_missing(data, wet, passes=3):
    """Diffusive flood-fill of missing (NaN / masked-dry) values from wet
    neighbors — used before regridding observational products with land
    gaps so coastal model cells get sane values."""
    data = np.array(data, dtype=np.float64)
    bad = ~np.isfinite(data)
    data[bad] = 0.0
    good = (~bad).astype(np.float64)
    for _ in range(passes):
        num = np.zeros_like(data)
        den = np.zeros_like(data)
        for ax in range(data.ndim):
            for sh in (1, -1):
                num += np.roll(data * good, sh, axis=ax)
                den += np.roll(good, sh, axis=ax)
        fill = num / np.where(den > 0, den, 1.0)
        newly = bad & (den > 0)
        data[newly] = fill[newly]
        good[newly] = 1.0
        bad = bad & ~newly
    data[bad] = np.nanmean(data[good > 0]) if np.any(good > 0) else 0.0
    return data
