"""Minimal NetCDF reader (NetCDF3 via scipy, NetCDF4/HDF5 via h5py).

The reference ingests every observational product as NetCDF through
NCDatasets.jl (reference: SURVEY.md §3.3 "NetCDF read (NCDatasets; host)";
`download_with_fallback.jl` resolves `Metadatum`s to `.nc` files). This
image has no netCDF4/xarray, but NetCDF4 files ARE HDF5 files, so a thin
reader over ``h5py`` (plus ``scipy.io.netcdf_file`` for classic NetCDF3)
covers both on-disk formats with zero extra dependencies.

Host-side, setup-time only — parsed arrays feed the conservative regrid
pipeline (`data.regrid`) and then device arrays, per the reference's
ingestion call stack.

Exposes:
* ``open_netcdf(path)`` -> :class:`NCFile` (``variables``: name ->
  :class:`NCVar` with ``dims``/``shape``/``attrs``/indexing).
* ``decode(var[, index])`` — CF unpacking: ``scale_factor``/``add_offset``,
  ``_FillValue``/``missing_value``/``valid_range`` -> NaN.
* ``load_field(path, name)`` — locate a geophysical variable by alias,
  return ``(data[nz, nlat, nlon], z_faces, lat_faces, lon_faces)`` in this
  package's native-grid contract (z ascending, data index 0 = deepest).
* ``find_netcdf(dir, name)`` — scan a dataset directory for a file
  containing (an alias of) ``name``.
"""

from __future__ import annotations

import glob
import os

import numpy as np


# --------------------------------------------------------------------------
# format-agnostic containers
# --------------------------------------------------------------------------

class NCVar:
    """A read-only NetCDF variable: ``dims``, ``shape``, ``attrs``, and
    numpy-style indexing returning plain ndarrays (no CF decoding)."""

    def __init__(self, name, dims, shape, attrs, getter, dtype=None):
        self.name = name
        self.dims = tuple(dims)
        self.shape = tuple(int(s) for s in shape)
        self.attrs = dict(attrs)
        self._get = getter
        self.dtype = dtype

    @property
    def ndim(self):
        return len(self.shape)

    def __getitem__(self, idx):
        return np.asarray(self._get(idx))

    def __repr__(self):
        return f"NCVar({self.name}, dims={self.dims}, shape={self.shape})"


class NCFile:
    """A read-only NetCDF file: ``variables``, ``dimensions``, ``attrs``."""

    def __init__(self, path, variables, dimensions, attrs, closer=None):
        self.path = path
        self.variables = variables
        self.dimensions = dimensions
        self.attrs = attrs
        self._closer = closer

    def close(self):
        if self._closer is not None:
            self._closer()
            self._closer = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _decode_attr(v):
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, np.ndarray):
        if v.dtype.kind in "SU" or v.dtype == object:
            return " ".join(x.decode("utf-8", "replace") if isinstance(x, bytes)
                            else str(x) for x in v.ravel())
        if v.size == 1:
            return v.item()
        return v
    return v


# --------------------------------------------------------------------------
# backends
# --------------------------------------------------------------------------

def _open_netcdf3(path):
    from scipy.io import netcdf_file
    # mmap: a slab request touches only the pages it needs. mmap=False
    # makes scipy materialize the ENTIRE variable per access — a single
    # 3-hourly slab read from a year-long file then costs the full
    # ~0.5 GB variable, and a 240-index window build reads ~1 TB
    # (measured: the file-forced year burned 30+ CPU-minutes before its
    # first step). The reader copies every slice immediately
    # (np.array(v[idx])), so no mmap view outlives the file.
    f = netcdf_file(path, "r", mmap=True)
    variables = {}
    for name, var in f.variables.items():
        attrs = {k: _decode_attr(v) for k, v in var._attributes.items()}
        # bind var per-name; copy so arrays survive file close
        variables[name] = NCVar(name, var.dimensions, var.shape, attrs,
                                (lambda v: lambda idx: np.array(v[idx]))(var),
                                dtype=var.data.dtype if hasattr(var, "data") else None)
    dims = dict(f.dimensions)
    attrs = {k: _decode_attr(v) for k, v in f._attributes.items()}

    def _close():
        # the reader copies every slice, but the NCVar closures still hold
        # scipy variable refs at close time, so scipy warns that the mmap
        # cannot be unmapped yet — it is released when the refs drop (GC);
        # nothing dangles because no view escapes uncopied
        import warnings
        with warnings.catch_warnings():
            warnings.filterwarnings("ignore",
                                    message="Cannot close a netcdf_file")
            f.close()

    return NCFile(path, variables, dims, attrs, closer=_close)


def _h5_dims(dset, name):
    """Dimension names of an HDF5 dataset, via attached dimension scales
    (netCDF-4 convention); synthesized ``phony_dim_i`` otherwise."""
    dims = []
    try:
        for i, dim in enumerate(dset.dims):
            keys = list(dim.keys()) if hasattr(dim, "keys") else []
            scale_name = None
            try:
                for j in range(len(dim)):
                    nm = dim[j].name  # absolute HDF5 path of the scale
                    scale_name = nm.rsplit("/", 1)[-1]
                    break
            except Exception:
                pass
            if scale_name is None and keys:
                scale_name = keys[0]
            dims.append(scale_name or f"phony_dim_{i}")
    except Exception:
        dims = [f"phony_dim_{i}" for i in range(dset.ndim)]
    return dims


def _open_netcdf4(path):
    import h5py
    f = h5py.File(path, "r")
    variables = {}
    dimensions = {}

    def walk(group, prefix=""):
        for key, item in group.items():
            if isinstance(item, h5py.Group):
                walk(item, prefix + key + "/")
                continue
            name = prefix + key
            attrs = {k: _decode_attr(v) for k, v in item.attrs.items()
                     if not k.startswith(("DIMENSION_", "CLASS", "NAME",
                                          "REFERENCE_LIST", "_Netcdf4"))}
            if item.attrs.get("CLASS") in (b"DIMENSION_SCALE",
                                           "DIMENSION_SCALE"):
                # a coordinate variable: its single dim is itself
                dims = [key] + [f"phony_dim_{i}"
                                for i in range(1, item.ndim)]
            else:
                dims = _h5_dims(item, name)
            variables[name] = NCVar(
                name, dims, item.shape, attrs,
                (lambda d: lambda idx: d[idx])(item), dtype=item.dtype)
            for d, s in zip(dims, item.shape):
                dimensions.setdefault(d, int(s))

    walk(f)
    attrs = {k: _decode_attr(v) for k, v in f.attrs.items()}
    return NCFile(path, variables, dimensions, attrs, closer=f.close)


def open_netcdf(path) -> NCFile:
    """Open a NetCDF file of either on-disk format (classic CDF magic ->
    scipy; HDF5 magic -> h5py)."""
    with open(path, "rb") as fh:
        magic = fh.read(8)
    if magic[:3] == b"CDF":
        return _open_netcdf3(path)
    if magic[:8] == b"\x89HDF\r\n\x1a\n":
        return _open_netcdf4(path)
    raise ValueError(f"{path}: not a NetCDF file (magic {magic[:4]!r})")


# --------------------------------------------------------------------------
# CF decoding
# --------------------------------------------------------------------------

def decode(var: NCVar, idx=Ellipsis) -> np.ndarray:
    """Read ``var[idx]`` applying CF packing/missing-value conventions:
    float64 output, ``_FillValue``/``missing_value``/``valid_range`` ->
    NaN, then ``scale_factor``/``add_offset``."""
    raw = var[idx]
    a = var.attrs
    data = np.asarray(raw, dtype=np.float64)
    bad = ~np.isfinite(data)
    for key in ("_FillValue", "missing_value"):
        if key in a:
            fv = np.float64(np.asarray(a[key]).ravel()[0])
            bad |= (np.asarray(raw, np.float64) == fv)
            # packed files sometimes compare post-scale
            if abs(fv) > 1e30:
                bad |= np.abs(data) > 1e30
    if "valid_range" in a:
        vr = np.asarray(a["valid_range"], np.float64).ravel()
        if vr.size == 2:
            bad |= (data < vr[0]) | (data > vr[1])
    if "valid_min" in a:
        bad |= data < np.float64(np.asarray(a["valid_min"]).ravel()[0])
    if "valid_max" in a:
        bad |= data > np.float64(np.asarray(a["valid_max"]).ravel()[0])
    scale = np.float64(np.asarray(a.get("scale_factor", 1.0)).ravel()[0])
    offset = np.float64(np.asarray(a.get("add_offset", 0.0)).ravel()[0])
    data = data * scale + offset
    data[bad] = np.nan
    return data


# --------------------------------------------------------------------------
# geophysical-variable discovery
# --------------------------------------------------------------------------

# canonical name -> known aliases across ECCO/WOA/EN4/GLORYS/ETOPO/JRA55
VAR_ALIASES = {
    "temperature": ("THETA", "t_an", "temperature", "thetao", "votemper",
                    "TEMP", "water_temp", "Theta", "ptemp"),
    "salinity": ("SALT", "s_an", "salinity", "so", "vosaline", "PSAL",
                 "Salt", "salt"),
    "sea_ice_thickness": ("SIheff", "sithick", "ice_thickness", "hi",
                          "sit", "heff"),
    "sea_ice_concentration": ("SIarea", "siconc", "ice_concentration",
                              "aice", "sic", "area"),
    "snow_thickness": ("SIhsnow", "snd", "snow_thickness", "hs"),
    "bottom_height": ("z", "elevation", "Band1", "topo", "bathymetry",
                      "deptho", "bedrock", "bed"),
    "u_velocity": ("UVEL", "uo", "vozocrtx", "u", "uvel"),
    "v_velocity": ("VVEL", "vo", "vomecrty", "v", "vvel"),
    "free_surface": ("ETAN", "zos", "sossheig", "ssh", "eta"),
    # JRA55-do shortnames are canonical already
    "tas": ("tas",), "huss": ("huss",), "psl": ("psl",), "uas": ("uas",),
    "vas": ("vas",), "rlds": ("rlds",), "rsds": ("rsds",), "prra": ("prra",),
    "prsn": ("prsn",), "friver": ("friver",), "licalvf": ("licalvf",),
}

_COORD_HINTS = {
    "lat": ("lat", "latitude", "y", "nav_lat", "YC", "yt", "lat_c"),
    "lon": ("lon", "longitude", "x", "nav_lon", "XC", "xt", "lon_c"),
    "z": ("depth", "z", "lev", "deptht", "Z", "zt", "level", "plev"),
    "time": ("time", "t", "time_counter", "date", "MT"),
}


def _is_coord_like(nc, name, kind):
    v = nc.variables[name]
    low = name.lower()
    units = str(v.attrs.get("units", "")).lower()
    std = str(v.attrs.get("standard_name", "")).lower()
    if kind == "lat":
        return ("lat" in low or "degrees_n" in units or std == "latitude")
    if kind == "lon":
        return ("lon" in low or "degrees_e" in units or std == "longitude")
    if kind == "z":
        return (low in _COORD_HINTS["z"] or "depth" in low or std == "depth"
                or units in ("m", "meters", "metres") and "depth" in low)
    if kind == "time":
        return (low in _COORD_HINTS["time"] or "since" in units
                or std == "time")
    return False


def _coord_for_dim(nc, dim, kind):
    """1-D coordinate variable for dimension ``dim`` of the given kind."""
    if dim in nc.variables and nc.variables[dim].dims == (dim,):
        return nc.variables[dim]
    for name, v in nc.variables.items():
        if v.dims == (dim,) and _is_coord_like(nc, name, kind):
            return v
    return None


def classify_dims(nc: NCFile, var: NCVar):
    """Map each dim of ``var`` to one of time/z/lat/lon (None if unknown)."""
    kinds = []
    for dim in var.dims:
        kind = None
        low = dim.lower()
        for k, hints in _COORD_HINTS.items():
            if low in hints or any(low.startswith(h) for h in hints if len(h) > 1):
                kind = k
                break
        if kind is None:
            cv = None
            for k in ("time", "z", "lat", "lon"):
                c = _coord_for_dim(nc, dim, k)
                if c is not None:
                    kind, cv = k, c
                    break
        kinds.append(kind)
    # disambiguate duplicates positionally (time, z, lat, lon order)
    if kinds.count(None) and len(var.dims) >= 2:
        order = ["time", "z", "lat", "lon"][-len(var.dims):]
        for i, k in enumerate(kinds):
            if k is None and order[i] not in kinds:
                kinds[i] = order[i]
    return kinds


def faces_from_centers(c, periodic=False, span=None):
    """Cell faces from 1-D cell centers: interior midpoints, end faces
    extrapolated (or wrapped to ``span`` when periodic)."""
    c = np.asarray(c, np.float64)
    if c.size == 1:
        half = (span or 1.0) / 2.0
        return np.array([c[0] - half, c[0] + half])
    f = np.empty(c.size + 1)
    f[1:-1] = 0.5 * (c[:-1] + c[1:])
    f[0] = c[0] - (f[1] - c[0])
    f[-1] = c[-1] + (c[-1] - f[-2])
    if periodic and span:
        f[-1] = f[0] + span
    return f


def load_field(path, name, time_index=0):
    """Load variable ``name`` (canonical or literal) from ``path`` in the
    package's native-grid contract: ``(data[nz, nlat, nlon], z_faces,
    lat_faces, lon_faces)`` — z faces ascending (bottom -> surface), data
    index 0 = deepest, longitudes in [-180, 180), missing values NaN.

    2-D (surface) variables return ``nz == 1`` with ``z_faces = [-1, 0]``.
    """
    with open_netcdf(path) as nc:
        aliases = VAR_ALIASES.get(name, (name,))

        def usable(v):
            # a geophysical field, not a coordinate variable that happens
            # to share a greedy alias ('z', 'area', ...) — those are 1-D
            return v.ndim >= 2

        var = None
        for a in aliases:
            if a in nc.variables and usable(nc.variables[a]):
                var = nc.variables[a]
                break
        if var is None:
            # case-insensitive fallback
            lower = {k.lower(): k for k in nc.variables}
            for a in aliases:
                key = lower.get(a.lower())
                if key is not None and usable(nc.variables[key]):
                    var = nc.variables[key]
                    break
        if var is None:
            raise KeyError(f"{path}: no variable for '{name}' "
                           f"(aliases {aliases})")

        kinds = classify_dims(nc, var)
        idx = []
        for kind, size in zip(kinds, var.shape):
            idx.append(int(time_index) % size if kind == "time" else slice(None))
        data = decode(var, tuple(idx))

        kept = [k for k in kinds if k != "time"]
        # reorder remaining axes to (z, lat, lon)
        want = [k for k in ("z", "lat", "lon") if k in kept]
        perm = [kept.index(k) for k in want]
        data = np.transpose(data, perm)
        if "z" not in kept:
            data = data[None]

        def coord(kind):
            dim = var.dims[kinds.index(kind)]
            cv = _coord_for_dim(nc, dim, kind)
            return None if cv is None else decode(cv)

        lat_c = coord("lat") if "lat" in kinds else None
        lon_c = coord("lon") if "lon" in kinds else None
        z_c = coord("z") if "z" in kinds else None

        if lat_c is None or lat_c.ndim != 1:
            lat_c = np.linspace(-90, 90, data.shape[1] + 1)[:-1] + 90.0 / data.shape[1]
        if lon_c is None or lon_c.ndim != 1:
            lon_c = np.linspace(-180, 180, data.shape[2] + 1)[:-1] + 180.0 / data.shape[2]

        # latitude ascending
        if lat_c[0] > lat_c[-1]:
            lat_c = lat_c[::-1]
            data = data[:, ::-1]
        # longitudes to [-180, 180), rolled monotone
        lon_c = np.asarray(lon_c, np.float64)
        lon_wrapped = (lon_c + 180.0) % 360.0 - 180.0
        if not np.all(np.diff(lon_wrapped) > 0):
            shift = int(np.argmin(lon_wrapped))
            lon_wrapped = np.roll(lon_wrapped, -shift)
            data = np.roll(data, -shift, axis=2)
        lon_c = lon_wrapped

        if z_c is None:
            z_f = np.array([-1.0, 0.0])
        else:
            z_c = np.asarray(z_c, np.float64)
            units = ""
            dimz = var.dims[kinds.index("z")]
            cv = _coord_for_dim(nc, dimz, "z")
            if cv is not None:
                units = str(cv.attrs.get("units", "")).lower()
                positive = str(cv.attrs.get("positive", "")).lower()
            else:
                positive = ""
            if units.startswith("cm") or units.startswith("centi"):
                z_c = z_c / 100.0
            # depth positive-down (the common convention) -> negative z
            if positive == "down" or (positive != "up" and np.nanmean(z_c) > 0):
                z_c = -z_c
            # ascending z (bottom -> surface), flip data to match
            if z_c.size > 1 and z_c[0] > z_c[-1]:
                z_c = z_c[::-1]
                data = data[::-1]
            z_f = faces_from_centers(z_c)
            z_f[-1] = min(z_f[-1], 0.0)
            if z_f[-1] == 0.0 and z_f.size > 1 and z_f[-2] >= 0.0:
                z_f[-2] = z_c[-1] if z_c[-1] < 0 else 0.5 * z_f[-3]

        lat_f = faces_from_centers(lat_c)
        lat_f = np.clip(lat_f, -90.0, 90.0)
        lon_f = faces_from_centers(lon_c, periodic=True, span=360.0)
        return np.ascontiguousarray(data), z_f, lat_f, lon_f


def find_netcdf(dir, name):
    """Find a NetCDF file in ``dir`` containing (an alias of) ``name``.
    Filename hits are preferred; otherwise every ``.nc`` is probed for a
    matching variable. Returns a path or None."""
    if not os.path.isdir(dir):
        return None
    candidates = sorted(glob.glob(os.path.join(dir, "*.nc"))
                        + glob.glob(os.path.join(dir, "*.nc4"))
                        + glob.glob(os.path.join(dir, "*.cdf")))
    if not candidates:
        return None
    aliases = tuple(a.lower() for a in VAR_ALIASES.get(name, (name,)))
    by_fname = [p for p in candidates
                if any(a in os.path.basename(p).lower() for a in aliases)]
    for p in by_fname + [p for p in candidates if p not in by_fname]:
        try:
            with open_netcdf(p) as nc:
                lower = {k.lower(): k for k in nc.variables}
                for a in aliases:
                    key = lower.get(a)
                    # only count real (>= 2-D) field variables — 1-D
                    # coordinate variables can shadow greedy aliases
                    if key is not None and nc.variables[key].ndim >= 2:
                        return p
        except Exception:
            continue
    return None


# --------------------------------------------------------------------------
# writing (CMOR-style NetCDF output parts)
# --------------------------------------------------------------------------

# CF metadata for the OMIP writer field set (reference surface/3-D writers,
# `omip_diagnostics.jl:115-180` — their CMOR-ish names carried over)
CMOR_ATTRS = {
    "tos": ("sea_surface_temperature", "degC"),
    "sos": ("sea_surface_salinity", "g kg-1"),
    "zos": ("sea_surface_height_above_geoid", "m"),
    "uos": ("surface_sea_water_x_velocity", "m s-1"),
    "vos": ("surface_sea_water_y_velocity", "m s-1"),
    "tossq": ("square_of_sea_surface_temperature", "degC2"),
    "sossq": ("square_of_sea_surface_salinity", "1e-6"),
    "zossq": ("square_of_sea_surface_height_above_geoid", "m2"),
    "mlotst": ("ocean_mixed_layer_thickness_defined_by_sigma_t", "m"),
    "tauuo": ("surface_downward_x_stress", "m2 s-2"),
    "tauvo": ("surface_downward_y_stress", "m2 s-2"),
    "hfds": ("surface_downward_heat_flux_in_sea_water", "K m s-1"),
    "wfo": ("water_flux_into_sea_water", "g kg-1 m s-1"),
    "hfss": ("surface_upward_sensible_heat_flux", "W m-2"),
    "hfls": ("surface_upward_latent_heat_flux", "W m-2"),
    "siconc": ("sea_ice_area_fraction", "1"),
    "sithick": ("sea_ice_thickness", "m"),
    "siu": ("sea_ice_x_velocity", "m s-1"),
    "siv": ("sea_ice_y_velocity", "m s-1"),
    "sitemptop": ("sea_ice_surface_temperature", "degC"),
    "sisnthick": ("surface_snow_thickness", "m"),
    "T": ("sea_water_potential_temperature", "degC"),
    "S": ("sea_water_absolute_salinity", "g kg-1"),
    "u": ("sea_water_x_velocity", "m s-1"),
    "v": ("sea_water_y_velocity", "m s-1"),
    "e": ("specific_turbulent_kinetic_energy", "m2 s-2"),
    "uvol": ("ocean_zonal_volume_transport_per_cell", "m3 s-1"),
    "vvol": ("ocean_meridional_volume_transport_per_cell", "m3 s-1"),
    "zosga": ("global_average_sea_level_change", "m"),
    "tosga": ("global_average_sea_surface_temperature", "degC"),
    "thetaoga": ("global_average_sea_water_potential_temperature", "degC"),
    "soga": ("global_average_sea_water_salinity", "g kg-1"),
}


def write_netcdf_part(path, stacked, grid=None):
    """Write one output part as classic NetCDF (64-bit-offset NetCDF3 via
    scipy — readable by xarray/netCDF4/NCO with no extra deps; the
    interoperable alternative to the npz parts, reference
    `omip_diagnostics.jl:152-158` JLD2 feeding its Julia ecosystem).

    ``stacked``: dict of time-stacked arrays — ``time`` (nt,),
    ``iteration`` (nt,), fields (nt[, Nz], Ny, Nx) or scalars (nt,).
    ``grid`` adds coordinate variables (2-D lat/lon at centers, z centers).
    Writes atomically (tmp + rename) like the reference's staging."""
    from scipy.io import netcdf_file

    nt = len(np.atleast_1d(stacked["time"]))
    tmp = path + ".tmp"
    f = netcdf_file(tmp, "w", version=2)
    try:
        f.createDimension("time", nt)
        dims = {}     # size -> dim name, for the trailing space dimensions

        def dim_for(size, hint):
            key = (size, hint)
            if key not in dims:
                name = hint if not any(h == hint for (_, h) in dims) \
                    else f"{hint}{size}"
                f.createDimension(name, size)
                dims[key] = name
            return dims[key]

        def space_dims(shape):
            if len(shape) == 0:
                return ()
            if len(shape) == 1:
                return (dim_for(shape[0], "z"),)
            named = [dim_for(shape[-2], "y"), dim_for(shape[-1], "x")]
            if len(shape) == 3:
                named.insert(0, dim_for(shape[0], "z"))
            return tuple(named)

        def put(name, arr, dim_names, attrs=()):
            v = f.createVariable(name, arr.dtype, dim_names)
            v[:] = arr
            for k, val in attrs:
                setattr(v, k, val)

        # epoch 1900 + explicit calendar: year 0 does not exist in the
        # standard (udunits/proleptic-Gregorian) calendar and makes
        # xarray/cftime decoding raise or silently mis-date (ADVICE r4,
        # low); simulation time is seconds-from-start, so any valid epoch
        # works — the calendar attribute makes decoding deterministic
        put("time", np.asarray(stacked["time"], np.float64).reshape(nt),
            ("time",), [("units", b"seconds since 1900-01-01 00:00:00"),
                        ("calendar", b"proleptic_gregorian"),
                        ("axis", b"T")])
        if "iteration" in stacked:
            put("iteration", np.asarray(stacked["iteration"],
                                        np.int32).reshape(nt), ("time",))
        if grid is not None:
            H = grid.H
            cut = np.s_[H:H + grid.Ny, H:H + grid.Nx]
            put("lat", np.asarray(grid.lat_cc)[cut].astype(np.float64),
                space_dims((grid.Ny, grid.Nx)),
                [("units", b"degrees_north"),
                 ("standard_name", b"latitude")])
            put("lon", np.asarray(grid.lon_cc)[cut].astype(np.float64),
                space_dims((grid.Ny, grid.Nx)),
                [("units", b"degrees_east"),
                 ("standard_name", b"longitude")])
            put("z", np.asarray(grid.z_c).astype(np.float64),
                space_dims((grid.Nz,)),
                [("units", b"m"), ("positive", b"up"), ("axis", b"Z")])
        for name, arr in stacked.items():
            if name in ("time", "iteration"):
                continue
            arr = np.asarray(arr)
            attrs = []
            if name in CMOR_ATTRS:
                std, units = CMOR_ATTRS[name]
                attrs = [("standard_name", std.encode()),
                         ("units", units.encode())]
            if arr.ndim >= 3:
                attrs.append(("coordinates", b"lat lon"))
            put(name, arr.astype(np.float32),
                ("time",) + space_dims(arr.shape[1:]), attrs)
    finally:
        f.close()
    os.replace(tmp, path)


def read_netcdf_part(path):
    """Read an output part written by `write_netcdf_part` back into the
    npz-part dict contract (data variables + time + iteration; coordinate
    variables excluded)."""
    out = {}
    with open_netcdf(path) as nc:
        for name, var in nc.variables.items():
            if name in ("lat", "lon", "z"):
                continue
            out[name] = np.asarray(var[...])
    return out
