"""Multi-year JRA55-do file backend with bounded device windows.

TPU-native rebuild of NumericalEarth's `JRA55PrescribedAtmosphere(arch; dir,
dataset, start_date, end_date, time_indices_in_memory, prefetch)` with the
`MultiYearJRA55` / `RepeatYearJRA55` datasets (reference
`atmosphere.jl:13-49`, backend sizing note in `launch.sh`: "240 = 30 days of
3-hourly ≈ 2 GB for 11 variables"; staging interplay
`jra55_data_staging.jl:154-247`).

Design: the directory holds per-year NetCDF files (one per JRA55-do
shortname per year). `JRA55FileAtmosphere` indexes every file's CF time
axis once (absolute seconds from the dataset epoch), precomputes one
`HorizontalRegridPlan` per distinct source grid, and serves fixed-length
windows: ``window_for_time(t0, t1) -> (PrescribedAtmosphere, t_ref)`` where
the window's ``times`` are float32 seconds RELATIVE to ``t_ref`` — keeping
on-device time interpolation exact even hundreds of simulated years in
(absolute seconds overflow float32 precision after ~1 year).

File reads re-resolve paths on every window build, so windows read through
the staging symlink farm and pick up freshly staged fast-scratch copies
(`data.staging.JRA55DataStagingCallback`).
"""

from __future__ import annotations

import datetime
import glob
import os
import re

import numpy as np

from .atmosphere import JRA55_FIELD_MAP, JRA55_LAND_VARS, PrescribedAtmosphere

SECONDS_PER_YEAR = 365.0 * 86400.0


def parse_cf_time_units(units):
    """CF time units "``<unit>`` since ``<date>``" -> (scale_seconds,
    datetime epoch). Returns (1.0, None) when unparseable."""
    m = re.match(r"\s*(\w+)\s+since\s+(.+)", str(units), re.IGNORECASE)
    if not m:
        return 1.0, None
    unit = m.group(1).lower()
    scale = {"second": 1.0, "sec": 1.0, "s": 1.0, "minute": 60.0, "min": 60.0,
             "hour": 3600.0, "hr": 3600.0, "h": 3600.0,
             "day": 86400.0, "d": 86400.0}.get(unit.rstrip("s"), 1.0)
    datestr = m.group(2).strip().rstrip("Z").replace("T", " ")
    # tolerate fractional seconds / timezone-less forms
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S",
                "%Y-%m-%d %H:%M", "%Y-%m-%d"):
        try:
            return scale, datetime.datetime.strptime(datestr, fmt)
        except ValueError:
            continue
    return scale, None


def _file_time_axis(path, shortname):
    """(abs_seconds_since_1900, nt) for ``shortname``'s time dim in
    ``path``; times in seconds since 1900-01-01 (a fixed reference so
    multi-file axes concatenate)."""
    from ..data.netcdf import (VAR_ALIASES, _coord_for_dim, classify_dims,
                               decode, open_netcdf)
    base = datetime.datetime(1900, 1, 1)
    with open_netcdf(path) as nc:
        vname = next((a for a in VAR_ALIASES.get(shortname, (shortname,))
                      if a in nc.variables and nc.variables[a].ndim >= 2),
                     None)
        if vname is None:
            return None
        var = nc.variables[vname]
        kinds = classify_dims(nc, var)
        if "time" not in kinds:
            return np.array([0.0])
        dim = var.dims[kinds.index("time")]
        cv = _coord_for_dim(nc, dim, "time")
        if cv is None:
            return np.arange(var.shape[kinds.index("time")], dtype=np.float64)
        t = np.asarray(decode(cv), np.float64)
        scale, epoch = parse_cf_time_units(cv.attrs.get("units", ""))
        off = 0.0 if epoch is None else (epoch - base).total_seconds()
        return t * scale + off


class _NativeFallback(Exception):
    """Raised mid-window-build when native mode hits a grid mismatch."""


class JRA55FileAtmosphere:
    """Index + window server over per-year JRA55-do NetCDF files."""

    def __init__(self, grid, dir, time_indices_in_memory=240,
                 repeat_year=False, dtype=np.float32, smooth_passes=2,
                 year_span=None, native_interpolation=True):
        self.grid = grid
        self.dir = dir
        self.n_window = int(time_indices_in_memory)
        self.repeat_year = bool(repeat_year)
        self.dtype = dtype
        self.smooth_passes = smooth_passes
        self._year_span = year_span
        self._plans = {}
        # native mode: windows stay at FILE resolution and the model-grid
        # interpolation happens ON DEVICE (`InterpolatedAtmosphere`) —
        # ~200× less host work + transfer per slab than regridding each
        # slab to the model grid here. Requires every variable on one
        # shared source grid (true for JRA55-do); verified lazily at the
        # first window build, with automatic fallback to the regrid path.
        self.native = bool(native_interpolation)
        self._native_plan = None        # (iy, ix, wy, wx, lat_c, lon_c)

        # per-shortname file index: [(path, abs_times), ...] sorted by time
        self.index = {}
        shortnames = list(JRA55_FIELD_MAP) + list(JRA55_LAND_VARS)
        for sn in shortnames:
            entries = []
            for p in self._files_for(sn):
                try:
                    t = _file_time_axis(p, sn)
                except Exception:
                    t = None
                if t is not None and len(t):
                    entries.append((p, t))
            entries.sort(key=lambda e: e[1][0])
            if entries:
                self.index[sn] = entries
        missing = [sn for sn in JRA55_FIELD_MAP if sn not in self.index]
        if missing:
            raise FileNotFoundError(
                f"no NetCDF files for JRA55 variables {missing} in {dir}")

        # dataset epoch: first time of the reference variable (tas)
        self.epoch = float(self.index["tas"][0][1][0])
        # common time axis (simulation seconds from epoch)
        self.times = np.concatenate(
            [t for _, t in self.index["tas"]]) - self.epoch
        self.nt = len(self.times)
        cadence = np.median(np.diff(self.times)) if self.nt > 1 else 10800.0
        self.span = float(self.times[-1] - self.times[0] + cadence)
        # RepeatYearJRA55 cycles the dataset with this period (a calendar
        # year for real JRA55-do; overridable for truncated test datasets)
        self.year_span = (self._year_span or SECONDS_PER_YEAR) \
            if self.repeat_year else None

        # Resolve the native sampling plan EAGERLY for every variable: the
        # window pytree type (InterpolatedAtmosphere vs
        # PrescribedAtmosphere) must be fixed before the first jitted step
        # compiles — a lazy mid-run fallback would change the step input's
        # pytree type and force a recompile of the coupled step (ADVICE
        # r4, low).  One slab read per variable, construction-time only.
        if self.native:
            try:
                # ATMOSPHERE variables only: land vars (friver/licalvf)
                # are served by the land loader through the regridding
                # path and must not veto native mode for the atmosphere
                for sn in JRA55_FIELD_MAP:
                    if sn not in self.index:
                        continue
                    a, lat_f, lon_f = self._read_slab_native(sn, 0)
                    if self._resolve_native_plan(lat_f, lon_f,
                                                 a.shape) is None:
                        break           # plan mismatch: native already off
            except Exception:
                self.native = False
                self._native_plan = None

    def _files_for(self, shortname):
        out = []
        for pat in ("*.nc", "*.nc4", "*.cdf"):
            out += glob.glob(os.path.join(self.dir, pat))
        sn = shortname.lower()
        hits = [p for p in sorted(set(out))
                if re.search(rf"(^|[_.-]){sn}([_.-]|$)",
                             os.path.basename(p).lower())]
        if hits:
            return hits
        # fall back to probing every file for the variable
        from ..data.netcdf import VAR_ALIASES, open_netcdf
        aliases = tuple(a.lower() for a in VAR_ALIASES.get(shortname,
                                                           (shortname,)))
        probed = []
        for p in sorted(set(out)):
            try:
                with open_netcdf(p) as nc:
                    lower = {k.lower(): k for k in nc.variables}
                    if any(lower.get(a) is not None
                           and nc.variables[lower[a]].ndim >= 2
                           for a in aliases):
                        probed.append(p)
            except Exception:
                continue
        return probed

    # ------------------------------------------------------------------ #
    def _plan_for(self, lat_f, lon_f):
        from ..data.regrid import HorizontalRegridPlan
        key = (lat_f.tobytes(), lon_f.tobytes())
        plan = self._plans.get(key)
        if plan is None:
            plan = HorizontalRegridPlan(self.grid, lat_f, lon_f)
            self._plans[key] = plan
        return plan

    def _pad(self, a2d):
        """Interior (Ny, Nx) -> padded (Nyp, Nxp) with replicate/wrap
        halos (forcing fields are read pointwise; stencils never reach
        through their halos in a meaningful way)."""
        g = self.grid
        H = g.H
        out = np.zeros((g.Nyp, g.Nxp), np.float64)
        out[H:H + g.Ny, H:H + g.Nx] = a2d
        out[:H] = out[H]
        out[H + g.Ny:] = out[H + g.Ny - 1]
        if g.periodic_x:
            out[:, :H] = out[:, g.Nx:g.Nx + H]
            out[:, H + g.Nx:] = out[:, H:2 * H]
        else:
            out[:, :H] = out[:, H:H + 1]
            out[:, H + g.Nx:] = out[:, H + g.Nx - 1:H + g.Nx]
        return out

    def _read_slab(self, shortname, global_index):
        """One regridded, padded slab of ``shortname`` at its own
        ``global_index`` (index into the concatenation of its files)."""
        from ..data.netcdf import load_field
        from ..data.regrid import fill_ocean_missing
        entries = self.index[shortname]
        gi = int(global_index)
        for path, t in entries:
            if gi < len(t):
                data, _, lat_f, lon_f = load_field(path, shortname,
                                                   time_index=gi)
                a = fill_ocean_missing(data[-1], None,
                                       passes=self.smooth_passes)
                return self._pad(self._plan_for(lat_f, lon_f).apply(a))
            gi -= len(t)
        raise IndexError(f"{shortname}: index {global_index} out of range")

    def _read_slab_native(self, shortname, global_index):
        """One NATIVE-resolution slab (missing values filled) + its
        (lat_faces, lon_faces) — for the on-device interpolation path."""
        from ..data.netcdf import load_field
        from ..data.regrid import fill_ocean_missing
        entries = self.index[shortname]
        gi = int(global_index)
        for path, t in entries:
            if gi < len(t):
                data, _, lat_f, lon_f = load_field(path, shortname,
                                                   time_index=gi)
                a = fill_ocean_missing(data[-1], None,
                                       passes=self.smooth_passes)
                return np.asarray(a), lat_f, lon_f
            gi -= len(t)
        raise IndexError(f"{shortname}: index {global_index} out of range")

    def _resolve_native_plan(self, lat_f, lon_f, shape):
        """Bilinear device-sampling plan for the shared source grid; None
        (and permanent fallback) when a variable's grid disagrees."""
        from .atmosphere import bilinear_sample_plan, separable_sample_matrices
        lat_c = 0.5 * (np.asarray(lat_f)[:-1] + np.asarray(lat_f)[1:])
        lon_c = 0.5 * (np.asarray(lon_f)[:-1] + np.asarray(lon_f)[1:])
        if self._native_plan is None:
            iy, ix, wy, wx = bilinear_sample_plan(self.grid, lat_c, lon_c)
            sep = separable_sample_matrices(iy, ix, wy, wx,
                                            len(lat_c), len(lon_c))
            self._native_plan = {"iy": iy, "ix": ix, "wy": wy, "wx": wx,
                                 "lat_c": lat_c, "lon_c": lon_c,
                                 "shape": shape, "sep": sep}
            return self._native_plan
        p = self._native_plan
        if (p["shape"] != shape or len(p["lat_c"]) != len(lat_c)
                or len(p["lon_c"]) != len(lon_c)
                or not np.allclose(p["lat_c"], lat_c)
                or not np.allclose(p["lon_c"], lon_c)):
            import warnings
            warnings.warn("JRA55 variables live on different source grids "
                          "— falling back to host-side regridding")
            self.native = False
            return None
        return self._native_plan

    def _var_times(self, shortname):
        return np.concatenate(
            [t for _, t in self.index[shortname]]) - self.epoch

    def _read_var_window(self, shortname, t_lo, t_hi, reader=None):
        """(times, slabs) of ``shortname`` covering [t_lo, t_hi] with one
        bracketing index on each side (its OWN cadence)."""
        reader = reader or self._read_slab
        vt = self._var_times(shortname)
        i0 = int(np.searchsorted(vt, t_lo, side="right")) - 1
        i1 = int(np.searchsorted(vt, t_hi, side="left")) + 1
        i0 = max(0, i0)
        i1 = min(len(vt) - 1, i1)
        idx = range(i0, i1 + 1)
        slabs = np.stack([reader(shortname, i) for i in idx])
        return vt[i0:i1 + 1], slabs

    def _var_series(self, sn, t_abs, t_lo, t_hi, native):
        """Window slabs of ``sn`` on the common time axis ``t_abs`` —
        native-resolution (plan-checked; None on grid-mismatch fallback)
        or regridded+padded."""
        if native:
            def reader(s, i):
                a, lat_f, lon_f = self._read_slab_native(s, i)
                if self._resolve_native_plan(lat_f, lon_f, a.shape) is None:
                    raise _NativeFallback()
                return a
        else:
            reader = self._read_slab
        try:
            if self.repeat_year:
                vt = self._var_times(sn)
                return np.stack([
                    reader(sn, int(np.clip(
                        np.searchsorted(vt, ta % self.year_span,
                                        side="right") - 1, 0, len(vt) - 1)))
                    for ta in t_abs])
            vt, slabs = self._read_var_window(sn, t_lo, t_hi, reader=reader)
            return self._interp_onto(vt, slabs, t_abs)
        except _NativeFallback:
            return None

    @staticmethod
    def _interp_onto(t_src, series, t_dst):
        if series.shape[0] == 1:
            return np.repeat(series, len(t_dst), axis=0)
        i1 = np.clip(np.searchsorted(t_src, t_dst), 1, len(t_src) - 1)
        i0 = i1 - 1
        denom = np.maximum(t_src[i1] - t_src[i0], 1e-9)
        w = np.clip((t_dst - t_src[i0]) / denom, 0.0, 1.0)[:, None, None]
        return (1.0 - w) * series[i0] + w * series[i1]

    # ------------------------------------------------------------------ #
    def window_for_time(self, t0, t1=None):
        """Device window covering simulation seconds [t0, t1] →
        ``(PrescribedAtmosphere, t_ref)``; the window's times are relative
        to ``t_ref``. Fixed length `n_window` (stable jit shapes)."""
        import jax.numpy as jnp

        n = min(self.n_window, self.nt)
        if self.repeat_year:
            cycle = np.floor(t0 / self.year_span)
            phase = t0 - cycle * self.year_span
            i0 = int(np.searchsorted(self.times, phase, side="right")) - 1
            i0 = max(0, i0)
            idx = (i0 + np.arange(n)) % self.nt
            wraps = np.cumsum(np.diff(np.concatenate(
                [[i0], idx[1:]])) < 0) if n > 1 else np.zeros(0)
            wraps = np.concatenate([[0], wraps]) if n > 1 else np.array([0])
            t_abs = self.times[idx] + (cycle + wraps) * self.year_span
        else:
            i0 = int(np.searchsorted(self.times, t0, side="right")) - 1
            i0 = int(np.clip(i0, 0, self.nt - n))
            idx = i0 + np.arange(n)
            t_abs = self.times[idx]
        t_ref = float(t_abs[0])
        t_lo, t_hi = float(t_abs[0]), float(t_abs[-1])
        if t1 is not None and t1 > t_hi and not self.repeat_year:
            # caller asked past the dataset end: clamp (constant-extrapolate)
            pass

        for _attempt in (0, 1):           # native mode may fall back once
            native = self.native
            fields = {}
            ok = True
            for sn, key in JRA55_FIELD_MAP.items():
                s = self._var_series(sn, t_abs, t_lo, t_hi, native)
                if s is None:
                    ok = False
                    break
                fields[key] = s
            # friver/licalvf are NOT folded into rain: the land freshwater
            # forcing is its own component (`coupler.land.PrescribedLand`
            # built from this backend's index — reference
            # `JRA55PrescribedLand`, atmosphere.jl:46), applied as a
            # coastal-spread surface salinity flux in the coupled step.
            if ok:
                break

        times_rel = jnp.asarray((t_abs - t_ref).astype(self.dtype))
        dev_fields = {k: jnp.asarray(v.astype(self.dtype))
                      for k, v in fields.items()}
        if native:
            from .atmosphere import InterpolatedAtmosphere
            p = self._native_plan
            sep = p["sep"]
            win = InterpolatedAtmosphere(
                times=times_rel, fields=dev_fields,
                iy=jnp.asarray(p["iy"]), ix=jnp.asarray(p["ix"]),
                wy=jnp.asarray(p["wy"]), wx=jnp.asarray(p["wx"]),
                Ry=None if sep is None else jnp.asarray(sep[0]),
                Cx=None if sep is None else jnp.asarray(sep[1]))
        else:
            win = PrescribedAtmosphere(times=times_rel, fields=dev_fields)
        return win, t_ref

    @property
    def window_span(self):
        """Simulated seconds one window covers (for prefetch sizing)."""
        n = min(self.n_window, self.nt)
        if n < 2:
            return self.span
        cadence = self.span / max(self.nt, 1)
        return n * cadence
