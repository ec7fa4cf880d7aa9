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


class HorizontalRegridPlan:
    """Precomputed horizontal remap from a regular lat-lon source onto a
    model grid's cell centers — curvilinear-aware.

    Rows of the destination grid that are constant-latitude (all lat-lon
    grids; tripolar grids south of the joint) use the conservative 1-D
    lat→lon passes (reference `three_dimensional_regrid!`,
    `InitialConditions.jl:33-68`). Rows that are NOT latitude lines (the
    tripolar bipolar cap, where a 1-D latitude ladder would land data on
    the wrong cells) use per-cell interpolation at the true cell centers
    ``(lon_cc, lat_cc)``:

    * default (``antialias=False``): bilinear point-sampling — exact to
      second order for smooth fields (forcing, tracers, climatologies);
    * ``antialias=True``: area-weighted box remap, averaging the source
      over an axis-aligned lat-lon window matching the cell's physical
      size (``dx_cc``/``dy_cc``) — conservative to first order and
      anti-aliased, for rough fields (bathymetry), where point-sampling
      aliases narrow ridges/straits that the conservative ladder used to
      average away.

    Weights are precomputed once (the box part as a scipy.sparse matrix);
    ``apply`` is two tensordots + a gather/sparse matvec, so repeated
    ingestion (forcing windows: thousands of slabs) is cheap.
    """

    def __init__(self, grid, lat_f_src, lon_f_src, row_tol=0.01,
                 antialias=False):
        H = grid.H
        Ny, Nx = grid.Ny, grid.Nx
        lat_cc = np.asarray(grid.lat_cc, np.float64)[H:H + Ny, H:H + Nx]
        lon_cc = np.asarray(grid.lon_cc, np.float64)[H:H + Ny, H:H + Nx]
        lat_f_src = np.asarray(lat_f_src, np.float64)
        lon_f_src = np.asarray(lon_f_src, np.float64)

        # rows that are genuinely constant-latitude
        spread = lat_cc.max(axis=1) - lat_cc.min(axis=1)
        self.row_is_latline = spread <= row_tol

        # --- conservative ladder (exact for latline rows) ----------------
        lat_dst = np.zeros(Ny + 1)
        lat_dst[:-1] = np.asarray(grid.lat_cf, np.float64)[H:H + Ny, H]
        lat_dst[-1] = 2 * lat_dst[-2] - lat_dst[-3]
        lon_dst = np.zeros(Nx + 1)
        lon_dst[:-1] = np.asarray(grid.lon_ff, np.float64)[H, H:H + Nx]
        lon_dst[-1] = lon_dst[0] + 360.0 if grid.periodic_x else \
            2 * lon_dst[-2] - lon_dst[-3]
        self._lat_dst, self._lon_dst = lat_dst, lon_dst
        self._w_lat = _conservative_weights(lat_f_src, lat_dst)
        self._w_lon = _conservative_weights(lon_f_src, lon_dst)

        # --- per-cell cap interpolation at true cell centers -------------
        self._cap = None
        self._bil = None
        if not self.row_is_latline.all():
            cap_j, cap_i = np.nonzero(~self.row_is_latline[:, None]
                                      & np.ones((1, Nx), bool))
            if antialias:
                dx_m = np.asarray(grid.dx_cc, np.float64)[H:H + Ny, H:H + Nx]
                dy_m = np.asarray(grid.dy_cc, np.float64)[H:H + Ny, H:H + Nx]
                M = _cap_box_weights(
                    lat_cc[cap_j, cap_i], lon_cc[cap_j, cap_i],
                    dx_m[cap_j, cap_i], dy_m[cap_j, cap_i],
                    lat_f_src, lon_f_src)
                self._cap = (cap_j, cap_i, M)
            else:
                lat_c_src = 0.5 * (lat_f_src[:-1] + lat_f_src[1:])
                lon_c_src = 0.5 * (lon_f_src[:-1] + lon_f_src[1:])
                nlat, nlon = lat_c_src.size, lon_c_src.size
                lat_q = lat_cc[cap_j, cap_i]
                lon_q = lon_cc[cap_j, cap_i]
                iy1 = np.clip(np.searchsorted(lat_c_src, lat_q), 1, nlat - 1)
                iy0 = iy1 - 1
                wy = np.clip((lat_q - lat_c_src[iy0])
                             / np.maximum(lat_c_src[iy1] - lat_c_src[iy0],
                                          1e-12), 0.0, 1.0)
                # periodic longitude: bracketing pair may straddle the seam
                span = 360.0
                lon_q = (lon_q - lon_c_src[0]) % span + lon_c_src[0]
                ix1 = np.searchsorted(lon_c_src, lon_q)
                ix0 = (ix1 - 1) % nlon
                ix1 = ix1 % nlon
                dxp = (lon_c_src[ix1] - lon_c_src[ix0]) % span
                dxp = np.where(dxp <= 0, span, dxp)
                wx = np.clip(((lon_q - lon_c_src[ix0]) % span) / dxp,
                             0.0, 1.0)
                self._bil = (cap_j, cap_i, iy0, iy1, ix0, ix1, wy, wx)

    def apply(self, data2d):
        """(nlat_src, nlon_src) cell-averaged source -> (Ny, Nx) interior."""
        data2d = np.asarray(data2d, np.float64)
        cons = np.tensordot(self._w_lat, data2d, axes=(1, 0))
        cons = np.tensordot(self._w_lon, cons, axes=(1, 1)).T
        if self._cap is not None:
            cap_j, cap_i, M = self._cap
            cons[cap_j, cap_i] = M @ data2d.ravel()
        elif self._bil is not None:
            cap_j, cap_i, iy0, iy1, ix0, ix1, wy, wx = self._bil
            cons[cap_j, cap_i] = (
                (1 - wy) * (1 - wx) * data2d[iy0, ix0]
                + (1 - wy) * wx * data2d[iy0, ix1]
                + wy * (1 - wx) * data2d[iy1, ix0]
                + wy * wx * data2d[iy1, ix1])
        return cons


def _cap_box_weights(lat_q, lon_q, dx_m, dy_m, lat_f_src, lon_f_src,
                     narrow_k=64):
    """Sparse (n_cells, nlat*nlon) matrix averaging a regular lat-lon
    source over an axis-aligned window centered at each query point with
    extents matching the cell's physical size. Longitude handled
    periodically (source assumed globally uniform in lon, which holds for
    ETOPO/JRA55/WOA/ECCO lat-lon products); windows wider than the circle
    average the full circle. Cells needing > ``narrow_k`` source columns
    (near the geographic pole, where lon degrees converge) are built in a
    short Python loop; everything else is vectorized."""
    from scipy import sparse

    deg_m = np.pi * 6371.0e3 / 180.0
    lat_f_src = np.asarray(lat_f_src, np.float64)
    lon_f_src = np.asarray(lon_f_src, np.float64)
    nlat = lat_f_src.size - 1
    nlon = lon_f_src.size - 1
    dlon = float(np.mean(np.diff(lon_f_src)))
    n = lat_q.size

    h_lat = np.maximum(0.5 * dy_m / deg_m, 1e-6)
    coslat = np.maximum(np.cos(np.radians(lat_q)), 1e-6)
    h_lon = np.minimum(0.5 * dx_m / (deg_m * coslat), 180.0)

    # ---- latitude: contiguous overlap range ----------------------------
    lat0 = np.clip(lat_q - h_lat, lat_f_src[0], lat_f_src[-1] - 1e-9)
    lat1 = np.clip(lat_q + h_lat, lat_f_src[0] + 1e-9, lat_f_src[-1])
    i0 = np.clip(np.searchsorted(lat_f_src, lat0, "right") - 1, 0, nlat - 1)
    i1 = np.clip(np.searchsorted(lat_f_src, lat1, "left") - 1, 0, nlat - 1)
    kl = int((i1 - i0).max()) + 1
    o = np.arange(kl)
    lat_idx = np.clip(i0[:, None] + o[None, :], 0, nlat - 1)
    w_lat = np.clip(np.minimum(lat1[:, None], lat_f_src[lat_idx + 1])
                    - np.maximum(lat0[:, None], lat_f_src[lat_idx]),
                    0.0, None)
    w_lat *= (i0[:, None] + o[None, :]) <= i1[:, None]

    # ---- longitude: periodic box, uniform source spacing ---------------
    width = np.minimum(2.0 * h_lon, 360.0)
    start = lon_q - h_lon
    s = (start - lon_f_src[0]) % 360.0 + lon_f_src[0]
    j0 = np.clip(np.searchsorted(lon_f_src, s, "right") - 1, 0, nlon - 1)
    off0 = lon_f_src[j0] - s            # in (-dlon, 0]
    k_need = np.minimum(np.ceil(width / dlon).astype(int) + 1, nlon + 1)

    rows_list, cols_list, vals_list = [], [], []

    def _emit(sel, ko):
        oo = np.arange(ko)
        a = off0[sel, None] + oo[None, :] * dlon
        w_lon = np.clip(np.minimum(a + dlon, width[sel, None])
                        - np.maximum(a, 0.0), 0.0, None)
        lon_idx = (j0[sel, None] + oo[None, :]) % nlon
        wl = w_lat[sel]
        li = lat_idx[sel]
        vals = wl[:, :, None] * w_lon[:, None, :]
        cols = li[:, :, None] * nlon + lon_idx[:, None, :]
        rows = np.broadcast_to(np.nonzero(sel)[0][:, None, None], vals.shape)
        nz = vals > 0
        rows_list.append(rows[nz])
        cols_list.append(cols[nz])
        vals_list.append(vals[nz])

    narrow = k_need <= narrow_k
    if narrow.any():
        _emit(narrow, int(k_need[narrow].max()))
    if (~narrow).any():
        # few cells near the pole; chunk to bound the temporary
        wide_idx = np.nonzero(~narrow)[0]
        for c in range(0, wide_idx.size, 256):
            sel = np.zeros(n, bool)
            sel[wide_idx[c:c + 256]] = True
            _emit(sel, int(k_need[sel].max()))

    rows = np.concatenate(rows_list)
    cols = np.concatenate(cols_list)
    vals = np.concatenate(vals_list)
    M = sparse.coo_matrix((vals, (rows, cols)),
                          shape=(n, nlat * nlon)).tocsr()
    rs = np.asarray(M.sum(axis=1)).ravel()
    M = sparse.diags(1.0 / np.where(rs > 0, rs, 1.0)) @ M
    return M


def _conservative_weights(src_faces, dst_faces):
    """(nd, ns) first-order conservative remap matrix (nearest-cell rows
    where the destination does not overlap the source)."""
    src_faces = np.asarray(src_faces, np.float64)
    dst_faces = np.asarray(dst_faces, np.float64)
    nd = dst_faces.size - 1
    lo = np.maximum(dst_faces[:-1, None], src_faces[None, :-1])
    hi = np.minimum(dst_faces[1:, None], src_faces[None, 1:])
    w = np.clip(hi - lo, 0.0, None)
    wsum = w.sum(axis=1, keepdims=True)
    src_centers = 0.5 * (src_faces[:-1] + src_faces[1:])
    dst_centers = 0.5 * (dst_faces[:-1] + dst_faces[1:])
    nearest = np.abs(dst_centers[:, None] - src_centers[None, :]).argmin(axis=1)
    w_nearest = np.zeros_like(w)
    w_nearest[np.arange(nd), nearest] = 1.0
    empty = (wsum <= 0)
    return np.where(empty, w_nearest, w / np.where(wsum > 0, wsum, 1.0))


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
