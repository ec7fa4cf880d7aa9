"""Tripolar (Arctic-fold) grid.

TPU-native rebuild of Oceananigans' `TripolarGrid` (reference call sites:
`one_degree_tripolar.jl:48-51` — 360×180 tripolar; `half_degree`,
`sixth_degree`, `tenth_degree`; fold/`RightFaceFolded` v-faces noted at
SURVEY.md §2b). ORCA-family topology: regular latitude-longitude south of a
transition ("joint") latitude; north of it an orthogonal bipolar patch
whose two poles sit over land, built from the conformal map

    z = a · sin(u + i v)

in the north-polar stereographic plane. Constant-|v| curves are confocal
ellipses around the two poles (grid "parallels"); constant-u curves are the
orthogonal confocal hyperbolae ("meridians"); v = 0 is the seam segment
joining the poles — the grid's folded northern boundary. Conformality
gives orthogonality, so C-grid metrics are exact great-circle distances
between adjacent nodes of a 2×-refined node lattice.

Fold topology: the seam lies along a face row; ghost cell row Ny+k mirrors
interior row Ny−1−k with the column map i ↦ (2p − 1 − i) mod Nx (centers) /
i ↦ (2p − i) mod Nx (x-faces), where p is the pole's face-column index —
the mirror axis λ' = 0 must coincide with a face column, which requires
(first_pole_longitude + 180) to be a multiple of the grid spacing (we
snap it). Velocity components flip sign across the fold.
"""

from __future__ import annotations

import numpy as np

from . import vertical as vgrid
from .grid import DEG2RAD, R_EARTH, _finalize


def _great_circle(lon1, lat1, lon2, lat2, radius=R_EARTH):
    p1, p2 = np.deg2rad(lat1), np.deg2rad(lat2)
    dl = np.deg2rad(lon2 - lon1)
    h = (np.sin((p2 - p1) / 2) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2)
    return 2 * radius * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def tripolar_grid(size, southernmost_latitude=-80.0, halo=4,
                  z=(-6000.0, 0.0), north_poles_latitude=55.0,
                  first_pole_longitude=70.0, joint_latitude=None,
                  radius=R_EARTH, fold_alignment_px=None,
                  _return_lattice=False):
    """Build a tripolar `Grid` (see module docstring).

    ``size = (Nx, Ny, Nz)``; defaults mirror Oceananigans' TripolarGrid.

    ``fold_alignment_px``: if set, additionally snap the pole face column p
    so the distributed fold exchange works on an x-mesh of that many
    devices (`parallel.shard` needs (Nx/px) | 2p — the mirror of one tile's
    padded range must be exactly one tile's padded range). The pole moves
    by at most half the alignment granularity in longitude.
    """
    Nx, Ny, Nz = size
    H = halo
    Nxp = Nx + 2 * H
    Nyp = Ny + 2 * H
    dlam = 360.0 / Nx

    # snap the pole longitude to a face column so the fold mirror maps
    # centers to centers
    p = int(round((first_pole_longitude + 180.0) / dlam))
    if fold_alignment_px:
        nx_loc = Nx // int(fold_alignment_px)
        # smallest granularity g with g | p and (Nx/px) | 2p: 2p = k·nx_loc
        # → p multiple of nx_loc/2 (nx_loc even) or nx_loc (odd)
        g = nx_loc // 2 if nx_loc % 2 == 0 else nx_loc
        p = int(round(p / g)) * g
    first_pole_longitude = -180.0 + p * dlam

    a = np.tan(np.deg2rad(90.0 - north_poles_latitude) / 2.0)
    if joint_latitude is None:
        joint_latitude = north_poles_latitude - 10.0

    span_south = joint_latitude - southernmost_latitude
    span_north = 90.0 - joint_latitude
    n_north = max(4, int(round(Ny * span_north / (span_south + span_north))))
    n_south = Ny - n_north
    dphi = span_south / n_south

    # --- refined lattice over ONE x-period (2Nx columns), then pad ----------
    nq = 2 * Nx                                   # refined columns per period
    nfy = 2 * Nyp + 1
    lam_ref = -180.0 + np.arange(nq) * dlam / 2.0
    lon_p = np.zeros((nfy, nq))
    lat_p = np.zeros((nfy, nq))

    m_joint = 2 * (H + n_south)
    m_top = 2 * (H + Ny)                          # seam lattice row

    # southern latitude ladder (clipped for below-pole halo rows)
    for m in range(0, min(m_joint, nfy)):
        lat_p[m, :] = np.clip(
            southernmost_latitude + (m - 2 * H) * dphi / 2.0, -89.95, 89.95)
        lon_p[m, :] = lam_ref

    # bipolar cap rows m_joint .. m_top
    r_joint = np.tan(np.deg2rad(90.0 - joint_latitude) / 2.0)

    lamp_r = np.deg2rad(lam_ref - first_pole_longitude)
    u = np.pi / 2.0 - lamp_r
    u_wrapped = (u + np.pi / 2.0) % (2.0 * np.pi) - np.pi / 2.0
    branch = np.where(u_wrapped <= np.pi / 2.0, 1.0, -1.0)
    u_eff = np.where(branch > 0, u_wrapped, np.pi - u_wrapped)
    u_eff = (u_eff + np.pi) % (2 * np.pi) - np.pi

    # Column-dependent v_joint so the FIRST cap row coincides exactly with
    # the joint circle (a constant-v ellipse is eccentric relative to the
    # circle and would fold cells near its minor axis):
    #   |a sin(u+iv)|² = a²(sin²u + sinh²v) = r_joint²
    s_joint_col = np.sqrt(np.maximum((r_joint / a) ** 2
                                     - np.sin(u_eff) ** 2, 1e-12))
    n_vrows = m_top - m_joint
    # Ladder linear in sinh(v) per column: uniform row spacing in the
    # stereographic plane (linear-in-v bunches rows quadratically at the
    # seam and shrinks near-fold cells ~50x below nominal).
    for k, m in enumerate(range(m_joint, min(m_top + 1, nfy))):
        v_col = np.arcsinh(s_joint_col * (1.0 - k / n_vrows))
        zc = a * np.sin(u_eff + 1j * v_col * branch)
        r = np.abs(zc)
        lat_p[m, :] = np.clip(90.0 - 2.0 * np.rad2deg(np.arctan(r)), -89.95, 89.95)
        lon_p[m, :] = np.rad2deg(np.angle(zc)) + first_pole_longitude

    # ghost lattice rows above the seam: mirror about the seam row and the
    # fold axis (refined column q -> (2*2p - q) mod nq; 2p = refined index
    # of the pole face column)
    q_mirror = (2 * (2 * p) - np.arange(nq)) % nq
    for m in range(m_top + 1, nfy):
        msrc = 2 * m_top - m
        lon_p[m, :] = lon_p[msrc, q_mirror]
        lat_p[m, :] = lat_p[msrc, q_mirror]

    if _return_lattice:
        # the one-period refined lattice + pole column — the supergrid
        # export used to synthesize ORCA-style .npz mesh files
        return lon_p, lat_p, p
    return _grid_from_refined_lattice(lon_p, lat_p, p, Nx, Ny, Nz, H, z,
                                      radius)


def _grid_from_refined_lattice(lon_p, lat_p, p, Nx, Ny, Nz, H, z, radius):
    """Finish a tripolar grid from the halo-extended one-period refined
    lattice ``lon_p/lat_p`` of shape (2(Ny+2H)+1, 2Nx): pad columns, slice
    the four staggered coordinate sets, and build metrics as great-circle
    distances between neighboring lattice points. Shared by the analytic
    `tripolar_grid` and the file-backed `tripolar_grid_from_supergrid`."""
    Nxp = Nx + 2 * H
    Nyp = Ny + 2 * H
    nq = 2 * Nx
    nfy = 2 * Nyp + 1
    dlam = 360.0 / Nx
    assert lon_p.shape == (nfy, nq), (lon_p.shape, (nfy, nq))

    # pad to the halo-extended refined array (periodic wrap, q offset -2H)
    nfx = 2 * Nxp + 1
    qpad = (np.arange(nfx) - 2 * H) % nq
    wraps = (np.arange(nfx) - 2 * H) // nq        # how many +360 wraps
    lon = lon_p[:, qpad] + 360.0 * wraps[None, :]
    lat = lat_p[:, qpad]

    # --- coordinate / metric arrays -----------------------------------------
    jj = np.arange(Nyp)
    ii = np.arange(Nxp)
    Mj_c = 2 * jj + 1
    Mj_f = 2 * jj
    Mi_c = 2 * ii + 1
    Mi_f = 2 * ii

    lon_cc = lon[np.ix_(Mj_c, Mi_c)]
    lat_cc = lat[np.ix_(Mj_c, Mi_c)]
    lon_ff = lon[np.ix_(Mj_f, Mi_f)]
    lat_ff = lat[np.ix_(Mj_f, Mi_f)]
    lat_fc = lat[np.ix_(Mj_c, Mi_f)]
    lat_cf = lat[np.ix_(Mj_f, Mi_c)]

    def dist(mja, mia, mjb, mib):
        mja = np.clip(mja, 0, nfy - 1)
        mjb = np.clip(mjb, 0, nfy - 1)
        mia = np.clip(mia, 0, nfx - 1)
        mib = np.clip(mib, 0, nfx - 1)
        return _great_circle(lon[np.ix_(mja, mia)], lat[np.ix_(mja, mia)],
                             lon[np.ix_(mjb, mib)], lat[np.ix_(mjb, mib)],
                             radius)

    dx_cc = dist(Mj_c, Mi_f, Mj_c, Mi_f + 2)
    dx_fc = dist(Mj_c, Mi_c - 2, Mj_c, Mi_c)
    dx_cf = dist(Mj_f, Mi_f, Mj_f, Mi_f + 2)
    dx_ff = dist(Mj_f, Mi_c - 2, Mj_f, Mi_c)
    dy_cc = dist(Mj_f, Mi_c, Mj_f + 2, Mi_c)
    dy_fc = dist(Mj_f, Mi_f, Mj_f + 2, Mi_f)
    dy_cf = dist(Mj_c - 2, Mi_c, Mj_c, Mi_c)
    dy_ff = dist(Mj_c - 2, Mi_f, Mj_c, Mi_f)

    floor = 1e-3 * radius * DEG2RAD * dlam
    for arr in (dx_cc, dx_fc, dx_cf, dx_ff, dy_cc, dy_fc, dy_cf, dy_ff):
        np.maximum(arr, floor, out=arr)

    az = {"cc": dx_cc * dy_cc, "fc": dx_fc * dy_fc,
          "cf": dx_cf * dy_cf, "ff": dx_ff * dy_ff}
    dx = {"cc": dx_cc, "fc": dx_fc, "cf": dx_cf, "ff": dx_ff}
    dy = {"cc": dy_cc, "fc": dy_fc, "cf": dy_cf, "ff": dy_ff}

    # local grid-x orientation vs geographic east (centers)
    dlon = lon[np.ix_(Mj_c, np.clip(Mi_c + 1, 0, nfx - 1))] \
        - lon[np.ix_(Mj_c, np.clip(Mi_c - 1, 0, nfx - 1))]
    dlon = (dlon + 180.0) % 360.0 - 180.0
    dlat = lat[np.ix_(Mj_c, np.clip(Mi_c + 1, 0, nfx - 1))] \
        - lat[np.ix_(Mj_c, np.clip(Mi_c - 1, 0, nfx - 1))]
    ex = dlon * np.cos(np.deg2rad(lat_cc))
    ey = dlat
    norm = np.sqrt(ex ** 2 + ey ** 2) + 1e-12
    rot = (ex / norm, ey / norm)

    z_faces = vgrid.resolve_z_faces(z, Nz)
    return _finalize(f"tripolar:{p}", Nx, Ny, Nz, H, True, False,
                     lon_cc, lat_cc, lon_ff, lat_ff, lat_fc, lat_cf,
                     dx, dy, az, z_faces, None, rot=rot)


def infer_pole_column(lon_seam, lat_seam):
    """Infer the pole face-column index p from the seam row of a supergrid:
    the fold maps refined column q to (2·2p − q) mod 2Nx onto the SAME
    physical point, so the true p minimizes the great-circle mismatch of
    the seam with its mirrored self."""
    nq = lon_seam.shape[0]
    best, best_err = 0, np.inf
    for p in range(nq // 2):
        qm = (2 * (2 * p) - np.arange(nq)) % nq
        err = float(np.sum(_great_circle(lon_seam, lat_seam,
                                         lon_seam[qm], lat_seam[qm], 1.0)))
        if err < best_err:
            best, best_err = p, err
    return best


def tripolar_grid_from_supergrid(lon_sg, lat_sg, Nz, z=(-6000.0, 0.0),
                                 halo=4, p=None, radius=R_EARTH):
    """Build a tripolar `Grid` from a file-provided supergrid — the
    NEMO/eORCA mesh convention: node coordinates on the refined lattice
    covering every face AND center, shape (2·Ny+1, 2·Nx) with periodic x
    (column q ↔ longitude index q/2) and row 2·Ny the northern fold seam.
    This is the TPU-native substitute for the reference's ORCA mesh
    artifact ingestion (`orca.jl` ORCAGrid(dataset=ORCA1())): metrics are
    recomputed as great-circle distances from the node coordinates.

    ``p``: pole face-column index; inferred from the seam's fold symmetry
    when omitted. South halo rows extrapolate the ladder; north ghost rows
    mirror across the seam exactly like the analytic constructor."""
    lon_sg = np.asarray(lon_sg, dtype=np.float64)
    lat_sg = np.asarray(lat_sg, dtype=np.float64)
    ny2, nq = lon_sg.shape
    assert ny2 % 2 == 1 and nq % 2 == 0, \
        "supergrid must be (2Ny+1, 2Nx) with the seam as the last row"
    Ny, Nx = (ny2 - 1) // 2, nq // 2
    H = halo
    Nyp = Ny + 2 * H
    nfy = 2 * Nyp + 1
    m_top = 2 * (H + Ny)

    if p is None:
        p = infer_pole_column(lon_sg[-1], lat_sg[-1])

    lon_p = np.zeros((nfy, nq))
    lat_p = np.zeros((nfy, nq))
    lon_p[2 * H:2 * H + ny2] = lon_sg
    lat_p[2 * H:2 * H + ny2] = lat_sg

    # south ghost rows: reflect the ladder about the southern boundary row
    for m in range(2 * H):
        msrc = 4 * H - m
        lat_p[m, :] = np.clip(2 * lat_p[2 * H, :] - lat_p[msrc, :],
                              -89.95, 89.95)
        lon_p[m, :] = lon_p[msrc, :]

    # north ghost rows: mirror about the seam and the fold axis
    q_mirror = (2 * (2 * p) - np.arange(nq)) % nq
    for m in range(m_top + 1, nfy):
        msrc = 2 * m_top - m
        lon_p[m, :] = lon_p[msrc, q_mirror]
        lat_p[m, :] = lat_p[msrc, q_mirror]

    return _grid_from_refined_lattice(lon_p, lat_p, p, Nx, Ny, Nz, H, z,
                                      radius)


# --------------------------------------------------------------------------
# fold halo exchange
# --------------------------------------------------------------------------

def dry_unresolvable_cells(grid, bottom, fraction=0.35):
    """Force land wherever the horizontal cell size collapses below
    ``fraction`` of what a regular latitude-longitude grid would have at
    that latitude — the disks around the two northern poles, where
    constant-u curves converge.

    The reference guarantees this by construction: eORCA's poles "sit over
    land" (both default poles are inside real continents) so the real
    bathymetry masks the shrunken cells. The synthetic bathymetry has no
    such guarantee, and wet pole-cap cells are dynamically unresolvable:
    measured at 1°/Δt=20 min, a wet rim at the −110°E pole develops a
    2.5 m/s jet and unbounded cooling ocean-only, and a 7.8 m/s jet with
    the ice-ocean stress feedback — the pole caps must be land like the
    reference's are. The cos(lat) normalization keeps every regular
    high-latitude row (Antarctic shelf included) wet at any fraction < 1.
    ``bottom``: interior (Ny, Nx) array; returns a copy with the
    unresolvable cells set to land (+0.1)."""
    H = grid.H
    nominal = R_EARTH * DEG2RAD * (360.0 / grid.Nx)
    lat = np.asarray(grid.lat_cc)[H:H + grid.Ny, H:H + grid.Nx]
    coslat = np.maximum(np.cos(np.deg2rad(lat)), 0.05)
    dx = np.asarray(grid.dx_cc)[H:H + grid.Ny, H:H + grid.Nx]
    dy = np.asarray(grid.dy_cc)[H:H + grid.Ny, H:H + grid.Nx]
    small = np.minimum(dx / coslat, dy) < fraction * nominal
    out = np.array(bottom, copy=True)
    out[small] = 0.1
    return out


def fill_halos_tripolar(a, grid, location="c", fold_sign=1.0):
    """Halo fill for tripolar fields: periodic x, zero-gradient south,
    fold north. ``location``: "c" | "u" | "v"; ``fold_sign``: −1 for
    velocity components. The fold maps are static (computed from grid
    metadata at trace time)."""
    import jax.numpy as jnp

    from .grid import fold_center_map, fold_face_map

    H, Nx, Ny = grid.H, grid.Nx, grid.Ny
    a = a.at[..., :H].set(a[..., Nx:Nx + H])
    a = a.at[..., H + Nx:].set(a[..., H:2 * H])
    a = a.at[..., :H, :].set(a[..., H:H + 1, :])

    c_map = jnp.asarray(fold_center_map(grid.kind, Nx, H))
    f_map = jnp.asarray(fold_face_map(grid.kind, Nx, H))

    if location == "v":
        # y-faces reflect about the seam face row H+Ny:
        #   ghost face H+Ny+k ← −v[H+Ny−k, mirror_c]
        for k in range(1, H):
            a = a.at[..., H + Ny + k, :].set(
                fold_sign * jnp.take(a[..., H + Ny - k, :], c_map, axis=-1))
        # seam face: antisymmetric average with its mirror partner
        seam = a[..., H + Ny, :]
        seam_m = jnp.take(seam, c_map, axis=-1)
        a = a.at[..., H + Ny, :].set(0.5 * (seam + fold_sign * seam_m))
    else:
        idx = f_map if location == "u" else c_map
        for k in range(H):
            a = a.at[..., H + Ny + k, :].set(
                fold_sign * jnp.take(a[..., H + Ny - 1 - k, :], idx, axis=-1))
    return a


def supergrid_from_nemo(glamt, gphit, glamu, gphiu, glamv, gphiv,
                        glamf, gphif):
    """Assemble the (2Ny+1, 2Nx) supergrid lattice from NEMO-convention
    mesh arrays (each (Ny, Nx)): t at cell centers, u at east faces of t,
    v at north faces, f at north-east corners — the layout of NEMO
    ``coordinates.nc`` / ``mesh_mask.nc`` files (the reference's ORCA1
    artifact, `orca.jl` ORCAGrid; SURVEY.md §2b "ORCAGrid" row).

    Supergrid convention (see `tripolar_grid_from_supergrid`): column
    2i = west face of cell i, column 2i+1 = center i; row 0 = southern
    boundary face row (extrapolated — NEMO files don't carry it), row
    2Ny = the northern fold seam.
    """
    glamt, gphit = np.asarray(glamt), np.asarray(gphit)
    Ny, Nx = glamt.shape
    lon = np.zeros((2 * Ny + 1, 2 * Nx))
    lat = np.zeros((2 * Ny + 1, 2 * Nx))
    j = np.arange(Ny)
    iw = (np.arange(Nx) - 1) % Nx           # west face of cell i = u/f col i-1
    lon[2 * j[:, None] + 1, 2 * np.arange(Nx)[None, :] + 1] = glamt
    lat[2 * j[:, None] + 1, 2 * np.arange(Nx)[None, :] + 1] = gphit
    lon[2 * j[:, None] + 1, 2 * np.arange(Nx)[None, :]] = np.asarray(glamu)[:, iw]
    lat[2 * j[:, None] + 1, 2 * np.arange(Nx)[None, :]] = np.asarray(gphiu)[:, iw]
    lon[2 * j[:, None] + 2, 2 * np.arange(Nx)[None, :] + 1] = np.asarray(glamv)
    lat[2 * j[:, None] + 2, 2 * np.arange(Nx)[None, :] + 1] = np.asarray(gphiv)
    lon[2 * j[:, None] + 2, 2 * np.arange(Nx)[None, :]] = np.asarray(glamf)[:, iw]
    lat[2 * j[:, None] + 2, 2 * np.arange(Nx)[None, :]] = np.asarray(gphif)[:, iw]
    # southern boundary face row: linear ladder extrapolation
    lat[0] = 2.0 * lat[1] - lat[2]
    lon[0] = lon[2]
    return lon, lat


def supergrid_from_netcdf_mesh(path):
    """Read an ORCA mesh NetCDF file: either a direct supergrid (`lon`,
    `lat` arrays of shape (2Ny+1, 2Nx)) or NEMO coordinates/mesh_mask
    style (glamt/gphit/glamu/gphiu/glamv/gphiv/glamf/gphif). Returns
    (lon_sg, lat_sg, bottom_height_or_None)."""
    from ..data.netcdf import decode, open_netcdf
    with open_netcdf(path) as nc:
        v = nc.variables

        def get(name):
            if name not in v:
                return None
            a = decode(v[name])
            while a.ndim > 2:                   # squeeze NEMO's time axis
                a = a[0]
            return a

        bottom = None
        for bname in ("bottom_height", "bathy_metry", "bathymetry", "deptho"):
            b = get(bname)
            if b is not None:
                bottom = -np.abs(b)             # depths -> bottom height
                break
        if "lon" in v and "lat" in v:
            return get("lon"), get("lat"), bottom
        names = ("glamt", "gphit", "glamu", "gphiu",
                 "glamv", "gphiv", "glamf", "gphif")
        arrs = [get(n) for n in names]
        if any(a is None for a in arrs):
            missing = [n for n, a in zip(names, arrs) if a is None]
            raise KeyError(f"{path}: mesh variables missing: {missing}")
        lon, lat = supergrid_from_nemo(*arrs)
        return lon, lat, bottom
