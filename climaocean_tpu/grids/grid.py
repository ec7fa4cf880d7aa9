"""The unified staggered-grid container.

TPU-native replacement for Oceananigans' ``RectilinearGrid`` /
``LatitudeLongitudeGrid`` / ``TripolarGrid`` + ``ImmersedBoundaryGrid``
family (capability table: SURVEY.md §2b; reference call sites
`/root/reference/src/OceanConfigurations/latitude_longitude.jl:32-42`,
`one_degree_tripolar.jl:48-59`).

Design
------
One pytree dataclass covers every horizontal geometry: the operators only
ever see 2-D metric arrays ``(dx|dy|az)_{cc,fc,cf,ff}`` of shape
``(Ny + 2H, Nx + 2H)`` plus 1-D vertical arrays, so curvilinear (tripolar)
grids differ only in how the metrics are built. The immersed boundary
(`GridFittedBottom` + ``minimum_depth`` semantics) is carried as wet-cell
masks at all four staggerings — *branchless masking replaces the reference's
``active_cells_map`` sparse iteration* (SURVEY.md §7 hard part (e): start
dense + masked).

Layout: all 3-D fields are ``(Nz, Ny + 2H, Nx + 2H)`` (w: ``Nz + 1``), halos
only in the horizontal. Bounded-direction halo cells are *dry* in the masks,
which enforces no-normal-flow / no-flux walls through the same masking path
as the immersed bathymetry.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import default_float
from . import vertical as vgrid

R_EARTH = 6371.0e3  # m, mean Earth radius (matches Oceananigans' default R_Earth)
DEG2RAD = np.pi / 180.0


def fold_center_map(kind: str, Nx: int, H: int):
    """Tripolar grids encode the pole face-column index p in their kind
    string ("tripolar:<p>"); return the padded center-column mirror map for
    the northern fold, or None for non-folded grids."""
    if not kind.startswith("tripolar:"):
        return None
    p = int(kind.split(":")[1])
    ii = np.arange(Nx + 2 * H)
    interior = (ii - H) % Nx
    return ((2 * p - 1 - interior) % Nx) + H


def fold_face_map(kind: str, Nx: int, H: int):
    if not kind.startswith("tripolar:"):
        return None
    p = int(kind.split(":")[1])
    ii = np.arange(Nx + 2 * H)
    interior = (ii - H) % Nx
    return ((2 * p - interior) % Nx) + H


@partial(jax.tree_util.register_dataclass,
         data_fields=["lon_cc", "lat_cc", "lon_ff", "lat_ff", "lat_fc", "lat_cf",
                      "dx_cc", "dx_fc", "dx_cf", "dx_ff",
                      "dy_cc", "dy_fc", "dy_cf", "dy_ff",
                      "az_cc", "az_fc", "az_cf", "az_ff",
                      "z_f", "z_c", "dz_c", "dz_f",
                      "bottom_height",
                      "wet_c", "wet_u", "wet_v", "wet_w",
                      "rot_cos", "rot_sin"],
         meta_fields=["Nx", "Ny", "Nz", "H", "periodic_x", "periodic_y", "kind"])
@dataclass(frozen=True)
class Grid:
    # --- static metadata -----------------------------------------------------
    Nx: int
    Ny: int
    Nz: int
    H: int                      # horizontal halo width
    periodic_x: bool
    periodic_y: bool
    kind: str                   # "rectilinear" | "latlon" | "tripolar"

    # --- geographic node positions (degrees; zeros for rectilinear) ---------
    lon_cc: jnp.ndarray         # (Nyp, Nxp)
    lat_cc: jnp.ndarray
    lon_ff: jnp.ndarray
    lat_ff: jnp.ndarray
    lat_fc: jnp.ndarray
    lat_cf: jnp.ndarray

    # --- horizontal metrics (m / m²), shape (Nyp, Nxp) -----------------------
    dx_cc: jnp.ndarray
    dx_fc: jnp.ndarray
    dx_cf: jnp.ndarray
    dx_ff: jnp.ndarray
    dy_cc: jnp.ndarray
    dy_fc: jnp.ndarray
    dy_cf: jnp.ndarray
    dy_ff: jnp.ndarray
    az_cc: jnp.ndarray
    az_fc: jnp.ndarray
    az_cf: jnp.ndarray
    az_ff: jnp.ndarray

    # --- vertical (static reference; z★ scaling applied in the model) --------
    z_f: jnp.ndarray            # (Nz+1,) face positions, z_f[0] = bottom
    z_c: jnp.ndarray            # (Nz,)   center positions
    dz_c: jnp.ndarray           # (Nz,)   cell thickness
    dz_f: jnp.ndarray           # (Nz+1,) center-to-center distance (half cells at ends)

    # --- immersed boundary ---------------------------------------------------
    bottom_height: jnp.ndarray  # (Nyp, Nxp), <= 0; > z_c[0] means shoaling
    wet_c: jnp.ndarray          # (Nz,  Nyp, Nxp) 1.0 wet / 0.0 dry
    wet_u: jnp.ndarray          # (Nz,  Nyp, Nxp)
    wet_v: jnp.ndarray          # (Nz,  Nyp, Nxp)
    wet_w: jnp.ndarray          # (Nz+1,Nyp, Nxp)

    # --- local grid-x orientation vs geographic east (curvilinear grids) ----
    rot_cos: jnp.ndarray        # (Nyp, Nxp); 1 for lat-lon/rectilinear
    rot_sin: jnp.ndarray        # (Nyp, Nxp); 0 for lat-lon/rectilinear

    # --- convenience ---------------------------------------------------------
    @property
    def Nxp(self) -> int:
        return self.Nx + 2 * self.H

    @property
    def Nyp(self) -> int:
        return self.Ny + 2 * self.H

    @property
    def shape(self):
        """Interior (Nz, Ny, Nx)."""
        return (self.Nz, self.Ny, self.Nx)

    @property
    def padded_shape(self):
        return (self.Nz, self.Nyp, self.Nxp)

    def interior(self, a):
        """Strip horizontal halos from a padded field (any z extent)."""
        H = self.H
        return a[..., H:H + self.Ny, H:H + self.Nx]

    def new_field(self, z_extent: int | None = None, dtype=None):
        nz = self.Nz if z_extent is None else z_extent
        return jnp.zeros((nz, self.Nyp, self.Nxp), dtype or default_float())

    def new_surface_field(self, dtype=None):
        return jnp.zeros((self.Nyp, self.Nxp), dtype or default_float())

    def pad_surface(self, a_interior):
        """Embed an interior (Ny, Nx) array into the padded surface shape."""
        H = self.H
        out = np.zeros((self.Nyp, self.Nxp), dtype=np.asarray(a_interior).dtype)
        out[H:H + self.Ny, H:H + self.Nx] = a_interior
        return out

    @property
    def column_depth(self):
        """Static wet-column depth at centers, (Nyp, Nxp); 0 on land."""
        return jnp.sum(self.wet_c * self.dz_c[:, None, None], axis=0)


# ---------------------------------------------------------------------------
# metric construction helpers (host-side numpy; runs once per grid)
# ---------------------------------------------------------------------------

def _pad_1d(interior, H, periodic, spacing_like=False):
    """Extend a 1-D coordinate/spacing array into halos.

    Periodic: wrap with the domain period. Bounded: linear extrapolation for
    coordinates, edge replication for spacings.
    """
    n = interior.shape[0]
    out = np.empty(n + 2 * H, dtype=np.float64)
    out[H:H + n] = interior
    if periodic:
        period = interior[-1] - interior[0] + (interior[1] - interior[0]) if not spacing_like else None
        if spacing_like:
            out[:H] = interior[-H:]
            out[H + n:] = interior[:H]
        else:
            # assumes uniform spacing at the wrap (true for our periodic grids)
            d = interior[1] - interior[0]
            period = n * d
            out[:H] = interior[-H:] - period
            out[H + n:] = interior[:H] + period
    else:
        if spacing_like:
            out[:H] = interior[0]
            out[H + n:] = interior[-1]
        else:
            d0 = interior[1] - interior[0]
            d1 = interior[-1] - interior[-2]
            out[:H] = interior[0] - d0 * np.arange(H, 0, -1)
            out[H + n:] = interior[-1] + d1 * np.arange(1, H + 1)
    return out


def _vertical_arrays(z_faces):
    z_f = np.asarray(z_faces, dtype=np.float64)
    Nz = z_f.shape[0] - 1
    z_c = 0.5 * (z_f[:-1] + z_f[1:])
    dz_c = np.diff(z_f)
    dz_f = np.empty(Nz + 1)
    dz_f[1:Nz] = z_c[1:] - z_c[:-1]
    dz_f[0] = z_c[0] - z_f[0]          # half cell below the bottom-most center
    dz_f[Nz] = z_f[Nz] - z_c[-1]       # half cell above the top-most center
    return z_f, z_c, dz_c, dz_f


def _build_masks(z_c, dz_c, bottom_height, H, Ny, Nx, periodic_x, periodic_y,
                 fold_c_map=None):
    """GridFittedBottom wet masks. A center cell is wet iff its center sits
    above the bottom height (reference `GridFittedBottom` semantics,
    `one_degree_tripolar.jl:58`). ``fold_c_map``: tripolar northern fold —
    the northern halo mirrors interior rows instead of drying."""
    Nz = z_c.shape[0]
    wet_c = (z_c[:, None, None] > bottom_height[None, :, :]).astype(np.float32)

    # Dry out bounded-direction halos so walls act like land.
    if not periodic_x:
        wet_c[:, :, :H] = 0.0
        wet_c[:, :, H + Nx:] = 0.0
    if not periodic_y:
        wet_c[:, :H, :] = 0.0
        if fold_c_map is None:
            wet_c[:, H + Ny:, :] = 0.0
        else:
            for k in range(H):
                wet_c[:, H + Ny + k, :] = wet_c[:, H + Ny - 1 - k, fold_c_map]

    wm_x = np.roll(wet_c, 1, axis=2)
    wm_y = np.roll(wet_c, 1, axis=1)
    wet_u = wet_c * wm_x
    wet_v = wet_c * wm_y

    wet_w = np.zeros((Nz + 1,) + wet_c.shape[1:], dtype=np.float32)
    wet_w[1:Nz] = wet_c[1:] * wet_c[:-1]
    wet_w[Nz] = wet_c[-1]          # surface face wet where the top cell is wet
    # bottom face (k=0) stays dry
    return wet_c, wet_u, wet_v, wet_w


def _finalize(kind, Nx, Ny, Nz, H, periodic_x, periodic_y,
              lon_cc, lat_cc, lon_ff, lat_ff, lat_fc, lat_cf,
              dx, dy, az, z_faces, bottom_height, rot=None):
    z_f, z_c, dz_c, dz_f = _vertical_arrays(z_faces)
    if bottom_height is None:
        bottom_height = np.full((Ny + 2 * H, Nx + 2 * H), z_f[0] - 1.0)
    wet_c, wet_u, wet_v, wet_w = _build_masks(
        z_c, dz_c, bottom_height, H, Ny, Nx, periodic_x, periodic_y,
        fold_c_map=fold_center_map(kind, Nx, H))
    if rot is None:
        rot = (np.ones((Ny + 2 * H, Nx + 2 * H)),
               np.zeros((Ny + 2 * H, Nx + 2 * H)))

    ft = default_float()
    j = lambda a: jnp.asarray(a, dtype=ft)
    return Grid(
        rot_cos=j(rot[0]), rot_sin=j(rot[1]),
        Nx=Nx, Ny=Ny, Nz=Nz, H=H,
        periodic_x=periodic_x, periodic_y=periodic_y, kind=kind,
        lon_cc=j(lon_cc), lat_cc=j(lat_cc), lon_ff=j(lon_ff), lat_ff=j(lat_ff),
        lat_fc=j(lat_fc), lat_cf=j(lat_cf),
        dx_cc=j(dx["cc"]), dx_fc=j(dx["fc"]), dx_cf=j(dx["cf"]), dx_ff=j(dx["ff"]),
        dy_cc=j(dy["cc"]), dy_fc=j(dy["fc"]), dy_cf=j(dy["cf"]), dy_ff=j(dy["ff"]),
        az_cc=j(az["cc"]), az_fc=j(az["fc"]), az_cf=j(az["cf"]), az_ff=j(az["ff"]),
        z_f=j(z_f), z_c=j(z_c), dz_c=j(dz_c), dz_f=j(dz_f),
        bottom_height=j(bottom_height),
        wet_c=j(wet_c), wet_u=j(wet_u), wet_v=j(wet_v), wet_w=j(wet_w),
    )


def rectilinear_grid(size, x=(0.0, 1.0), y=(0.0, 1.0), z=(-1.0, 0.0),
                     halo: int = 4, topology=("periodic", "periodic", "bounded"),
                     bottom_height=None) -> Grid:
    """Uniform-spacing Cartesian grid (reference `RectilinearGrid` surface,
    used for tests/regridding: SURVEY.md §2b)."""
    Nx, Ny, Nz = size
    H = halo
    periodic_x = topology[0] == "periodic"
    periodic_y = topology[1] == "periodic"
    dx0 = (x[1] - x[0]) / Nx
    dy0 = (y[1] - y[0]) / Ny
    Nxp, Nyp = Nx + 2 * H, Ny + 2 * H
    ones = np.ones((Nyp, Nxp))
    dx = {k: dx0 * ones for k in ("cc", "fc", "cf", "ff")}
    dy = {k: dy0 * ones for k in ("cc", "fc", "cf", "ff")}
    az = {k: dx0 * dy0 * ones for k in ("cc", "fc", "cf", "ff")}
    zeros = np.zeros((Nyp, Nxp))
    z_faces = vgrid.resolve_z_faces(z, Nz)
    return _finalize("rectilinear", Nx, Ny, Nz, H, periodic_x, periodic_y,
                     zeros, zeros, zeros, zeros, zeros, zeros,
                     dx, dy, az, z_faces, bottom_height)


def latitude_longitude_grid(size, longitude=(-180.0, 180.0), latitude=(-75.0, 75.0),
                            z=(-6000.0, 0.0), halo: int = 4, radius: float = R_EARTH,
                            bottom_height=None) -> Grid:
    """Uniform-in-degrees spherical grid (reference `LatitudeLongitudeGrid`,
    `latitude_longitude.jl:32-37`). x is periodic iff longitude spans 360°."""
    Nx, Ny, Nz = size
    H = halo
    lon_span = longitude[1] - longitude[0]
    periodic_x = abs(lon_span - 360.0) < 1e-9

    dlam = lon_span / Nx
    dphi = (latitude[1] - latitude[0]) / Ny

    lam_f_i = longitude[0] + dlam * np.arange(Nx)          # interior face coords
    lam_c_i = lam_f_i + 0.5 * dlam
    phi_f_i = latitude[0] + dphi * np.arange(Ny)
    phi_c_i = phi_f_i + 0.5 * dphi

    lam_f = _pad_1d(lam_f_i, H, periodic_x)
    lam_c = _pad_1d(lam_c_i, H, periodic_x)
    phi_f = _pad_1d(phi_f_i, H, False)
    phi_c = _pad_1d(phi_c_i, H, False)

    Nxp, Nyp = Nx + 2 * H, Ny + 2 * H
    lon_cc = np.broadcast_to(lam_c[None, :], (Nyp, Nxp)).copy()
    lon_ff = np.broadcast_to(lam_f[None, :], (Nyp, Nxp)).copy()
    lat_cc = np.broadcast_to(phi_c[:, None], (Nyp, Nxp)).copy()
    lat_ff = np.broadcast_to(phi_f[:, None], (Nyp, Nxp)).copy()
    lat_fc = lat_cc
    lat_cf = lat_ff

    dlam_m = radius * DEG2RAD * dlam
    dphi_m = radius * DEG2RAD * dphi
    # Halo rows of bounded-y grids can extrapolate past the poles; they are
    # dry in the masks, but metrics must stay finite and positive (branchless
    # masking divides by them). Clamp the latitude used for metrics.
    phi_c_m = np.clip(phi_c, -89.9, 89.9)
    phi_f_m = np.clip(phi_f, -89.9, 89.9)
    cos_c = np.cos(DEG2RAD * phi_c_m)[:, None]
    cos_f = np.cos(DEG2RAD * phi_f_m)[:, None]
    onesx = np.ones((1, Nxp))

    dx = {"cc": dlam_m * cos_c * onesx, "fc": dlam_m * cos_c * onesx,
          "cf": dlam_m * cos_f * onesx, "ff": dlam_m * cos_f * onesx}
    dy = {k: dphi_m * np.ones((Nyp, Nxp)) for k in ("cc", "fc", "cf", "ff")}

    # Exact spherical cell areas: Az = R² Δλ (sin φ⁺ − sin φ⁻), floored so
    # past-pole halo rows stay positive.
    min_area = (0.05 * dlam_m * dphi_m)

    def band_area(phi_lo, phi_hi):
        a = radius ** 2 * DEG2RAD * dlam * (
            np.sin(DEG2RAD * np.clip(phi_hi, -90, 90))
            - np.sin(DEG2RAD * np.clip(phi_lo, -90, 90)))
        return np.maximum(a, min_area)

    phi_f_hi = phi_f + dphi                       # next face up
    az_c_band = band_area(phi_f, phi_f_hi)[:, None]          # centered at phi_c
    az_f_band = band_area(phi_c - dphi, phi_c)[:, None]      # centered at phi_f
    az = {"cc": az_c_band * onesx, "fc": az_c_band * onesx,
          "cf": az_f_band * onesx, "ff": az_f_band * onesx}

    z_faces = vgrid.resolve_z_faces(z, Nz)
    return _finalize("latlon", Nx, Ny, Nz, H, periodic_x, False,
                     lon_cc, lat_cc, lon_ff, lat_ff, lat_fc, lat_cf,
                     dx, dy, az, z_faces, bottom_height)


def with_bottom_height(grid: Grid, bottom_interior, minimum_depth: float = 0.0) -> Grid:
    """Immerse a grid with `GridFittedBottom` semantics.

    ``bottom_interior`` is an (Ny, Nx) array of bottom heights (<= 0).
    Columns shallower than ``minimum_depth`` become land (reference
    `regrid_bathymetry(minimum_depth=...)` behavior,
    `latitude_longitude.jl:39-42`).
    """
    hb = np.asarray(bottom_interior, dtype=np.float64)
    if minimum_depth > 0:
        hb = np.where(hb > -minimum_depth, 0.0, hb)
    hb = np.minimum(hb, 0.0)
    hb_p = np.full((grid.Nyp, grid.Nxp), 1.0)   # land in halos by default
    H = grid.H
    hb_p[H:H + grid.Ny, H:H + grid.Nx] = hb
    if grid.kind.startswith("tripolar"):
        # Force near-pole cells dry regardless of the bathymetry: cells
        # shrink without bound approaching the grid poles, and a real
        # tripolar mesh guarantees its poles sit on land. Metric-based
        # criterion: dry wherever dx or dy < 15% of the interior median.
        dx = np.asarray(grid.dx_cc)
        dy = np.asarray(grid.dy_cc)
        med = np.median(dx[H:H + grid.Ny, H:H + grid.Nx])
        tiny = (dx < 0.15 * med) | (dy < 0.15 * med)
        hb_p[tiny[: hb_p.shape[0], : hb_p.shape[1]]] = 0.0
    if grid.periodic_x:
        hb_p[:, :H] = hb_p[:, grid.Nx:grid.Nx + H]
        hb_p[:, H + grid.Nx:] = hb_p[:, H:2 * H]
    c_map = fold_center_map(grid.kind, grid.Nx, H)
    if c_map is not None:
        for k in range(H):
            hb_p[H + grid.Ny + k, :] = hb_p[H + grid.Ny - 1 - k, c_map]

    z_c = np.asarray(grid.z_c)
    wet_c, wet_u, wet_v, wet_w = _build_masks(
        z_c, np.asarray(grid.dz_c), hb_p, H, grid.Ny, grid.Nx,
        grid.periodic_x, grid.periodic_y, fold_c_map=c_map)

    ft = default_float()
    return dataclasses.replace(
        grid,
        bottom_height=jnp.asarray(hb_p, dtype=ft),
        wet_c=jnp.asarray(wet_c, dtype=ft), wet_u=jnp.asarray(wet_u, dtype=ft),
        wet_v=jnp.asarray(wet_v, dtype=ft), wet_w=jnp.asarray(wet_w, dtype=ft),
    )
