"""Observational-baseline ingestion: native products → staged ``.npz``.

The reference's figure suite downloads eight observational baselines and
caches them (`visualize/common.jl:463-1059`). This build runs zero-egress,
so the analysis layer reads pre-staged ``<obs_dir>/<name>.npz`` files
(layout: `docs/OBSERVATIONS.md`). This module is the CONVERTER between
natively-downloaded products and that layout: given a directory of native
NetCDF/CSV files (fetched out-of-band on a connected machine), it regrids
the gridded products to a model grid and writes the npz inventory the
loaders consume.

    python -m climaocean_tpu.data.observations --native /path/to/downloads \
        --out <outdir>/obs --config onedegree

Recognized native inputs (searched by filename keywords, read through the
dependency-free NetCDF reader):

  * ECCO SSH       — any file matching ``*ssh*``/``*SSH*`` with an
                     ``SSH``/``zos``/``adt`` variable → time-mean, regrid
  * NCEP stress    — ``*uflx*``/``*vflx*`` (or one file with both) → τx/τy
  * dBM MLD        — ``*mld*`` with an ``mld`` variable → winter-max map
  * HadISST SST    — ``*hadisst*``/``*sst*`` → time-mean °C (auto K→°C)
  * NSIDC extent   — ``*nsidc*.csv`` rows ``month,extent_nh[,extent_sh]``
                     or an ``*extent*`` NetCDF with monthly series
  * PIOMAS volume  — ``*piomas*.csv`` rows ``month,volume_nh`` (10³ km³)
  * RAPID MOC      — ``*rapid*`` / ``*moc*`` NetCDF with ``moc``/``time``
  * SIC March/Sept — ``*siconc*``/``*ice_conc*`` NetCDF with a monthly
                     time axis → the two climatology months

Every converter degrades independently: absent inputs are skipped with a
note, present ones are written — the same graceful-degradation contract
as the loaders.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def _find(native_dir, *keys, ext=(".nc", ".nc4", ".cdf")):
    hits = []
    for p in sorted(glob.glob(os.path.join(native_dir, "*"))):
        base = os.path.basename(p).lower()
        if any(k in base for k in keys) and base.endswith(ext):
            hits.append(p)
    return hits


def _regrid_2d(data, lat_f, lon_f, grid):
    """Conservative-ish regrid of a native (nlat, nlon) field to the model
    interior (Ny, Nx) via the package bilinear sampling plan (adequate for
    smooth observational climatologies)."""
    from ..coupler.atmosphere import bilinear_sample_plan

    lat_c = 0.5 * (np.asarray(lat_f)[:-1] + np.asarray(lat_f)[1:])
    lon_c = 0.5 * (np.asarray(lon_f)[:-1] + np.asarray(lon_f)[1:])
    iy, ix, wy, wx = bilinear_sample_plan(grid, lat_c, lon_c)
    nlat, nlon = data.shape[-2:]
    iyp = np.minimum(iy + 1, nlat - 1)
    ixp = np.remainder(ix + 1, nlon)
    d = np.nan_to_num(np.asarray(data, np.float64), nan=0.0)
    w_ok = np.isfinite(np.asarray(data, np.float64)).astype(np.float64)
    num = ((1 - wy) * (1 - wx) * d[iy, ix] + (1 - wy) * wx * d[iy, ixp]
           + wy * (1 - wx) * d[iyp, ix] + wy * wx * d[iyp, ixp])
    den = ((1 - wy) * (1 - wx) * w_ok[iy, ix] + (1 - wy) * wx * w_ok[iy, ixp]
           + wy * (1 - wx) * w_ok[iyp, ix] + wy * wx * w_ok[iyp, ixp])
    out = np.where(den > 0.2, num / np.maximum(den, 1e-12), np.nan)
    H = grid.H
    return out[H:H + grid.Ny, H:H + grid.Nx].astype(np.float32)


def _load_time_mean(path, names):
    from .netcdf import load_field, open_netcdf

    with open_netcdf(path) as nc:
        var = next((n for n in names if n in nc.variables), None)
        if var is None:
            lower = {k.lower(): k for k in nc.variables}
            var = next((lower[n.lower()] for n in names
                        if n.lower() in lower), None)
        if var is None:
            return None, None, None
        nt = 1
        v = nc.variables[var]
        from .netcdf import classify_dims
        kinds = classify_dims(nc, v)
        if "time" in kinds:
            nt = v.shape[kinds.index("time")]
    acc = None
    for t in range(nt):
        data, _, lat_f, lon_f = load_field(path, var, time_index=t)
        sl = data[-1]
        acc = sl if acc is None else acc + sl
    return acc / max(nt, 1), lat_f, lon_f


def _read_csv_series(path, n_cols):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.replace(";", ",").split(",")
            try:
                vals = [float(p) for p in parts[:n_cols]]
            except ValueError:
                continue                     # header / comment
            if len(vals) == n_cols:
                rows.append(vals)
    return np.asarray(rows, np.float64)


def stage_observations(native_dir, obs_dir, grid):
    """Convert every recognized native product under ``native_dir`` to the
    staged npz layout in ``obs_dir``; returns the list of written names."""
    os.makedirs(obs_dir, exist_ok=True)
    written = []

    def put(name, **arrs):
        np.savez(os.path.join(obs_dir, f"{name}.npz"), **arrs)
        written.append(name)
        print(f"staged {name}.npz")

    # --- ECCO SSH ----------------------------------------------------------
    for p in _find(native_dir, "ssh", "adt", "ecco"):
        mean, lat_f, lon_f = _load_time_mean(p, ("SSH", "zos", "adt", "ssh"))
        if mean is not None:
            put("ecco_ssh", ssh=_regrid_2d(mean, lat_f, lon_f, grid))
            break

    # --- NCEP stress -------------------------------------------------------
    taux = tauy = None
    for p in _find(native_dir, "uflx", "stress", "tau"):
        m, lat_f, lon_f = _load_time_mean(p, ("uflx", "taux", "tauuo"))
        if m is not None:
            taux = _regrid_2d(m, lat_f, lon_f, grid)
        m, lat_f2, lon_f2 = _load_time_mean(p, ("vflx", "tauy", "tauvo"))
        if m is not None:
            tauy = _regrid_2d(m, lat_f2, lon_f2, grid)
    for p in _find(native_dir, "vflx"):
        m, lat_f, lon_f = _load_time_mean(p, ("vflx", "tauy"))
        if m is not None:
            tauy = _regrid_2d(m, lat_f, lon_f, grid)
    if taux is not None and tauy is not None:
        put("ncep_stress", taux=taux, tauy=tauy)

    # --- dBM MLD -----------------------------------------------------------
    for p in _find(native_dir, "mld", "dbm"):
        m, lat_f, lon_f = _load_time_mean(p, ("mld", "MLD", "mld_dr003"))
        if m is not None:
            put("dbm_mld", mld=np.abs(_regrid_2d(m, lat_f, lon_f, grid)))
            break

    # --- HadISST SST -------------------------------------------------------
    for p in _find(native_dir, "hadisst"):
        m, lat_f, lon_f = _load_time_mean(p, ("sst", "tos", "temperature"))
        if m is not None:
            if np.nanmean(m) > 200.0:        # Kelvin → Celsius
                m = m - 273.15
            put("hadisst_sst", sst=_regrid_2d(m, lat_f, lon_f, grid))
            break

    # --- NSIDC extent climatology (CSV) ------------------------------------
    for p in sorted(glob.glob(os.path.join(native_dir, "*nsidc*.csv"))):
        rows = _read_csv_series(p, 3)
        if rows.shape[0] >= 12:
            put("nsidc_extent",
                extent_nh=rows[:12, 1].astype(np.float32),
                extent_sh=rows[:12, 2].astype(np.float32))
            break
        rows = _read_csv_series(p, 2)
        if rows.shape[0] >= 12:
            put("nsidc_extent",
                extent_nh=rows[:12, 1].astype(np.float32),
                extent_sh=np.zeros(12, np.float32))
            break

    # --- PIOMAS volume climatology (CSV) ------------------------------------
    for p in sorted(glob.glob(os.path.join(native_dir, "*piomas*.csv"))):
        rows = _read_csv_series(p, 2)
        if rows.shape[0] >= 12:
            put("piomas_volume", volume_nh=rows[:12, 1].astype(np.float32))
            break

    # --- RAPID MOC ----------------------------------------------------------
    from .netcdf import open_netcdf
    for p in _find(native_dir, "rapid", "moc"):
        try:
            with open_netcdf(p) as nc:
                lower = {k.lower(): k for k in nc.variables}
                mv = lower.get("moc") or lower.get("moc_mar_hc10") \
                    or lower.get("amoc")
                tv = lower.get("time")
                if mv and tv:
                    moc = np.asarray(nc.variables[mv][:], np.float64).ravel()
                    t = np.asarray(nc.variables[tv][:], np.float64).ravel()
                    put("rapid_moc", time=t.astype(np.float64),
                        moc=moc.astype(np.float32))
                    break
        except Exception:
            continue

    # --- SIC March / September climatology ----------------------------------
    from .netcdf import load_field
    for p in _find(native_dir, "siconc", "ice_conc", "icec"):
        try:
            with open_netcdf(p) as nc:
                lower = {k.lower(): k for k in nc.variables}
                var = next((lower[n] for n in ("siconc", "ice_conc", "icec",
                                               "sic") if n in lower), None)
                if var is None:
                    continue
                from .netcdf import classify_dims
                v = nc.variables[var]
                kinds = classify_dims(nc, v)
                nt = v.shape[kinds.index("time")] if "time" in kinds else 1
            for name, m0 in (("siconc_march", 2), ("siconc_september", 8)):
                acc, n_acc = None, 0
                for t in range(m0, nt, 12):
                    data, _, lat_f, lon_f = load_field(p, var, time_index=t)
                    sl = data[-1]
                    acc = sl if acc is None else acc + sl
                    n_acc += 1
                if acc is not None:
                    conc = acc / max(n_acc, 1)
                    if np.nanmax(conc) > 2.0:        # percent → fraction
                        conc = conc / 100.0
                    put(name, siconc=_regrid_2d(conc, lat_f, lon_f, grid))
            break
        except Exception:
            continue

    if not written:
        print(f"no recognized observational products under {native_dir}")
    return written


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--native", required=True,
                    help="directory of natively-downloaded products")
    ap.add_argument("--out", required=True, help="obs_dir to stage into")
    ap.add_argument("--config", default="onedegree",
                    help="model grid the gridded products regrid to")
    args = ap.parse_args(argv)
    from ..configurations.omip import _CONFIG_BUILDERS
    model, _ = _CONFIG_BUILDERS[args.config](initialize=False)
    names = stage_observations(args.native, args.out, model.grid)
    print(f"staged {len(names)} baselines into {args.out}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
