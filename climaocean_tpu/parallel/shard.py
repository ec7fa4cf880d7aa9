"""Explicit shard_map domain decomposition with ppermute halo exchange.

The north-star distribution strategy (BASELINE.json: "halo exchange as ICI
collectives under shard_map"; reference equivalent: Oceananigans
`Distributed(arch; partition=Partition(Rx, Ry))` MPI halo exchange,
SURVEY.md §2d item 1).

Layout: every rank owns a LOCAL padded tile ``(Nz, ny_loc + 2H, nx_loc +
2H)`` — the single-device halo-carrying layout, replicated per device and
stacked on a leading device axis that `shard_map` splits. The numerics are
unchanged (roll-based stencils are interior-correct within a tile);
`halo_exchange` replaces the single-device `fill_halos`: one
`lax.ppermute` pair per direction moves H-wide edge strips to neighbor
halos over ICI. Physical boundaries keep their single-device treatment:
bounded-direction global halos stay dry in the masks, and the exchanged
strip that wraps around the ring at a physical edge is overwritten by the
local zero-gradient fill.

Decomposition: mesh axes ('y', 'x') with Py × Px = n_devices; the global
interior (Ny, Nx) must divide evenly (pad the grid otherwise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


# --------------------------------------------------------------------------
# partitioning: global padded arrays -> stacked local tiles
# --------------------------------------------------------------------------

def _tile_slices(N, parts, H):
    """Global padded index ranges (including each tile's halos) per part."""
    n_loc = N // parts
    return [(p * n_loc, p * n_loc + n_loc + 2 * H) for p in range(parts)]


def partition_array(a, grid, py, px):
    """Split a global padded field into a (py*px, ..., ny_loc+2H, nx_loc+2H)
    stack (device-major: y outer, x inner)."""
    H = grid.H
    ys = _tile_slices(grid.Ny, py, H)
    xs = _tile_slices(grid.Nx, px, H)
    tiles = []
    for y0, y1 in ys:
        for x0, x1 in xs:
            tiles.append(a[..., y0:y1, x0:x1])
    return jnp.stack(tiles)


def unpartition_array(stack, grid, py, px):
    """Inverse of partition_array (interior union; halos from tile data)."""
    H = grid.H
    ny_loc = grid.Ny // py
    nx_loc = grid.Nx // px
    out = None
    idx = 0
    rows = []
    for j in range(py):
        cols = []
        for i in range(px):
            t = stack[idx]
            cols.append(t[..., H:H + ny_loc, H:H + nx_loc])
            idx += 1
        rows.append(jnp.concatenate(cols, axis=-1))
    interior = jnp.concatenate(rows, axis=-2)
    pad = [(0, 0)] * (interior.ndim - 2) + [(H, H), (H, H)]
    return jnp.pad(interior, pad)


def _strip_separable_interp(tree):
    """Remove `InterpolatedAtmosphere.Ry`/`Cx` before partitioning: the
    separable matmul matrices ((Nyp, nlat) / (nlon, Nxp)) cannot be tiled
    by the last-two-axes rule — per-tile `at_time` falls back to the
    gather form, whose (Nyp, Nxp) index/weight arrays partition cleanly."""
    import dataclasses

    from ..coupler.atmosphere import InterpolatedAtmosphere

    def fix(obj):
        if isinstance(obj, InterpolatedAtmosphere) and obj.Ry is not None:
            return dataclasses.replace(obj, Ry=None, Cx=None)
        return obj

    return jax.tree_util.tree_map(fix, tree,
                                  is_leaf=lambda o: isinstance(
                                      o, InterpolatedAtmosphere))


def partition_tree(tree, grid, py, px):
    tree = _strip_separable_interp(tree)

    def f(a):
        if hasattr(a, "ndim") and a.ndim >= 2 and a.shape[-1] == grid.Nxp:
            return partition_array(a, grid, py, px)
        return a
    return jax.tree_util.tree_map(f, tree)


def local_grid(grid, py, px):
    """A Grid pytree whose 2-D/3-D arrays are stacked local tiles. The
    static metadata describes the LOCAL tile (the numerics only use Nx/Ny
    via halo fills, which shard.halo_exchange replaces)."""
    import dataclasses
    parts = partition_tree(
        {f.name: getattr(grid, f.name) for f in dataclasses.fields(grid)
         if f.name not in ("Nx", "Ny", "Nz", "H", "periodic_x", "periodic_y",
                           "kind")},
        grid, py, px)
    return dataclasses.replace(grid, Nx=grid.Nx // px, Ny=grid.Ny // py,
                               **parts)


# --------------------------------------------------------------------------
# halo exchange inside shard_map
# --------------------------------------------------------------------------

def halo_exchange(a, H, mesh_axes=("y", "x"), periodic_x=True,
                  periodic_y=False, fold=None, location="c", fold_sign=1.0):
    """Exchange H-wide halo strips with mesh neighbors via ppermute.

    ``a``: local padded tile (..., ny+2H, nx+2H) inside shard_map.
    x exchange runs first, then y INCLUDING the x-halos, so corner halos are
    correct after two passes.

    ``fold=(p, nx_loc)`` enables the tripolar northern fold (p = pole
    face-column index from the grid kind): the mirror of a top tile's
    padded column range is EXACTLY the padded range of tile
    (2p/nx_loc − 1 − ix) mod px (requires nx_loc | 2p, true for the
    standard p = Nx/2 pole), so the fold is one ppermute along x among the
    top device row + a local column flip (u-faces shift by one) — the
    distributed image of `grids.tripolar.fill_halos_tripolar`. A second x
    pass afterwards repairs the fold rows' x-halo corners.
    """
    ay, ax = mesh_axes

    def recv_from(vals, axis_name, offset):
        """Each device receives ``vals`` from device (i + offset);
        ppermute perm pairs are (source, destination)."""
        n = jax.lax.axis_size(axis_name)
        perm = [((i + offset) % n, i) for i in range(n)]
        return jax.lax.ppermute(vals, axis_name, perm)

    def x_pass(a):
        nx = a.shape[-1]
        left_edge = a[..., H:2 * H]
        right_edge = a[..., nx - 2 * H:nx - H]
        from_left = recv_from(right_edge, ax, -1)
        from_right = recv_from(left_edge, ax, +1)
        a = a.at[..., :H].set(from_left)
        a = a.at[..., nx - H:].set(from_right)
        return a

    # --- x direction ------------------------------------------------------
    nx = a.shape[-1]
    a = x_pass(a)
    if not periodic_x:
        ix = jax.lax.axis_index(ax)
        npx = jax.lax.axis_size(ax)
        a = jnp.where(ix == 0,
                      a.at[..., :H].set(a[..., H:H + 1]), a)
        a = jnp.where(ix == npx - 1,
                      a.at[..., nx - H:].set(a[..., nx - H - 1:nx - H]), a)

    # --- y direction (strips include x halos -> corners correct) ----------
    ny = a.shape[-2]
    # the v seam row (padded row ny−H) is PROGNOSTIC on tripolar grids and
    # must survive into the fold symmetrization — capture it before the y
    # exchange / north clamp overwrite it (single-device fills never touch
    # it; the distributed y pass does)
    pre_seam = a[..., ny - H:ny - H + 1, :] if fold is not None else None
    bot_edge = a[..., H:2 * H, :]
    top_edge = a[..., ny - 2 * H:ny - H, :]
    from_bot = recv_from(top_edge, ay, -1)    # south neighbor's top edge
    from_top = recv_from(bot_edge, ay, +1)
    a = a.at[..., :H, :].set(from_bot)
    a = a.at[..., ny - H:, :].set(from_top)
    if not periodic_y:
        iy = jax.lax.axis_index(ay)
        npy = jax.lax.axis_size(ay)
        a = jnp.where(iy == 0,
                      a.at[..., :H, :].set(a[..., H:H + 1, :]), a)
        a = jnp.where(iy == npy - 1,
                      a.at[..., ny - H:, :].set(a[..., ny - H - 1:ny - H, :]),
                      a)

    # --- northern tripolar fold (top device row only) ----------------------
    if fold is not None:
        p, nx_loc = fold
        px = jax.lax.axis_size(ax)
        q = (2 * p) // nx_loc
        # every device ships padded rows [ny-2H, ny-H]: its top H interior
        # rows plus the (pre-y-pass) seam row itself (H+1 rows)
        strip = jnp.concatenate([a[..., ny - 2 * H:ny - H, :], pre_seam],
                                axis=-2)
        perm = [((q - 1 - i) % px, i) for i in range(px)]
        strip = jax.lax.ppermute(strip, ax, perm)
        flip = strip[..., ::-1]                         # center mirror
        if location == "u":
            # face mirror is the center mirror shifted by one; column 0
            # wraps off-tile and is repaired by the second x pass below
            flip = jnp.roll(flip, 1, axis=-1)
        s = fold_sign
        if location == "v":
            # ghost faces reflect about the seam row; the seam face itself
            # is the antisymmetric average with its mirror partner
            seam = 0.5 * (pre_seam + s * flip[..., H:H + 1, :])
            ghosts = s * flip[..., H - 1:0:-1, :]       # rows H-1..1
            north = jnp.concatenate([seam, ghosts], axis=-2)
        else:
            north = s * flip[..., H - 1::-1, :]         # rows H-1..0
        iy = jax.lax.axis_index(ay)
        npy = jax.lax.axis_size(ay)
        a = jnp.where(iy == npy - 1,
                      a.at[..., ny - H:, :].set(north), a)
        a = x_pass(a)                                   # repair fold corners
    return a


# --------------------------------------------------------------------------
# sharded step
# --------------------------------------------------------------------------

def _is_stacked(a, nxp_loc):
    return (hasattr(a, "ndim") and a.ndim >= 3
            and a.shape[-1] == nxp_loc)


def _fold_params(grid, px):
    """(pole_face_index, nx_loc) for tripolar grids, else None. The
    distributed fold requires the mirror of each tile's padded range to be
    exactly one tile's padded range: nx_loc must divide 2p."""
    if not grid.kind.startswith("tripolar:"):
        return None
    p = int(grid.kind.split(":")[1])
    nx_loc = grid.Nx // px
    assert (2 * p) % nx_loc == 0, \
        (f"tripolar fold under shard_map needs nx_loc | 2p "
         f"(p={p}, nx_loc={nx_loc}); choose a mesh with px dividing "
         f"2p/nx_loc alignment")
    return (p, nx_loc)


def make_sharded_step_fn(model, mesh: Mesh, donate=False):
    """Jitted ocean step running under `shard_map` with explicit ppermute
    halo exchange. Returns (step_fn, partition_fn, unpartition_fn):

        state_stacked = partition_fn(state)        # (P, ...) tiles
        new = step_fn(state_stacked, fluxes_stacked, dt)
        state = unpartition_fn(new)                # global padded arrays

    Inside the mapped body the model's grid is the shard-local tile and
    `core.halo.fill_halos` is overridden (via `halo_override`) with the
    ppermute exchange — so the per-substep barotropic fills, the tendency
    fills, and every other halo touchpoint ride ICI collectives.
    """
    import dataclasses

    from ..utils.compat import shard_map

    from ..core.halo import halo_override
    from ..models import hydrostatic as hyd

    py, px = mesh.devices.shape
    grid = model.grid
    assert grid.Ny % py == 0 and grid.Nx % px == 0, \
        f"(Ny={grid.Ny}, Nx={grid.Nx}) must divide the mesh {py}x{px}"
    lgrid_stacked = local_grid(grid, py, px)
    nxp_loc = grid.Nx // px + 2 * grid.H

    def spec_for(a):
        return P(("y", "x")) if _is_stacked(a, nxp_loc) else P()

    fold = _fold_params(grid, px)

    def sharded_fill(a, g, location="c", vector=False):
        return halo_exchange(a, g.H, periodic_x=grid.periodic_x,
                             periodic_y=grid.periodic_y, fold=fold,
                             location=location,
                             fold_sign=-1.0 if vector else 1.0)

    def unstack(tree):
        return jax.tree_util.tree_map(
            lambda a: a[0] if _is_stacked(a, nxp_loc) else a, tree)

    def step_local(lgrid_tile, state_tile, fluxes_tile, dt):
        g = unstack(lgrid_tile)
        s = unstack(state_tile)
        f = unstack(fluxes_tile)
        m = dataclasses.replace(model, grid=g)
        with halo_override(sharded_fill):
            out = hyd.step(m, s, f, dt)
        return jax.tree_util.tree_map(lambda a: a[None], out)

    def run(lgrid_s, state_s, fluxes_s, dt):
        in_specs = (jax.tree_util.tree_map(spec_for, lgrid_s),
                    jax.tree_util.tree_map(spec_for, state_s),
                    jax.tree_util.tree_map(spec_for, fluxes_s),
                    P())
        out_specs = jax.tree_util.tree_map(lambda a: P(("y", "x")), state_s)
        return shard_map(step_local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)(
            lgrid_s, state_s, fluxes_s, dt)

    jitted = jax.jit(run, donate_argnums=(1,) if donate else ())

    def partition(tree):
        return partition_tree(tree, grid, py, px)

    def unpartition(tree):
        return jax.tree_util.tree_map(
            lambda a: unpartition_array(a, grid, py, px)
            if _is_stacked(a, nxp_loc) else a, tree)

    def step_fn(state_stacked, fluxes_stacked, dt):
        return jitted(lgrid_stacked, state_stacked, fluxes_stacked, dt)

    return step_fn, partition, unpartition


def _coupled_shard_builder(model, mesh: Mesh, donate=False, prefetcher=None):
    """Shared machinery for the sharded coupled step: returns
    ``(run_for(n_steps) -> jitted, resolve_model(t, t_end) ->
    (model_stacked, t_rel), partition, unpartition)``.

    Everything inside `coupled_step` is either pointwise (flux solvers,
    radiation, thermodynamics, time interpolation) or reaches halos through
    `core.halo.fill_halos` (ocean tendencies/barotropic substeps; the
    sea-ice step's entry/per-EVP-substep fills), so overriding the fill
    with the ppermute exchange distributes the whole step — every EVP and
    barotropic substep does one ICI halo exchange, like the reference's
    MPI `fill_halo_regions!` inside its substep loops.

    With a ``prefetcher``, the atmosphere window is swapped per dispatch —
    partitioned into tiles on swap (a host-side cost paid once per window
    rotation, ~monthly) — and time runs window-relative with the absolute
    offset threaded through `coupled_step(t_offset=...)`, exactly like the
    single-device `make_batched_step_fn`.
    """
    import dataclasses

    from ..utils.compat import shard_map

    from ..core.halo import halo_override
    from ..models import coupled as cm

    py, px = mesh.devices.shape
    grid = model.ocean.grid
    assert grid.Ny % py == 0 and grid.Nx % px == 0, \
        f"(Ny={grid.Ny}, Nx={grid.Nx}) must divide the mesh {py}x{px}"
    nx_loc, ny_loc = grid.Nx // px, grid.Ny // py
    nxp_loc = nx_loc + 2 * grid.H
    fold = _fold_params(grid, px)

    model_stacked = partition_tree(model, grid, py, px)
    window_cache = {"id": None, "stacked": model_stacked, "t_ref": 0.0,
                    "closures": getattr(model.ocean, "closures", ()),
                    "land": model.land}

    def resolve_model(t, t_end):
        """(model_stacked, t_relative) with the prefetcher window covering
        [t, t_end] swapped in, and any time-varying restoring/land windows
        rotated (both re-partitioned into tiles on swap; same shapes every
        window → jit cache hits)."""
        from ..models.coupled import rotate_restoring

        stacked = window_cache["stacked"]
        rotated = rotate_restoring(window_cache["closures"], t)
        if rotated is not window_cache["closures"]:
            window_cache["closures"] = rotated
            stacked = dataclasses.replace(
                stacked, ocean=dataclasses.replace(
                    stacked.ocean,
                    closures=partition_tree(rotated, grid, py, px)))
            window_cache["stacked"] = stacked
        land = window_cache["land"]
        if land is not None and hasattr(land, "refreshed"):
            new_land = land.refreshed(t)
            if new_land is not land:
                window_cache["land"] = new_land
                window_cache["stacked"] = stacked = dataclasses.replace(
                    stacked, land=partition_tree(new_land, grid, py, px))
        if prefetcher is None:
            return stacked, t
        win, t_ref = prefetcher.window_for(t, t_end)
        if window_cache["id"] != id(win):
            win_stacked = partition_tree(win, grid, py, px)
            window_cache["id"] = id(win)
            window_cache["stacked"] = stacked = dataclasses.replace(
                stacked, atmosphere=win_stacked)
            window_cache["t_ref"] = t_ref
        return stacked, t - window_cache["t_ref"]

    def spec_for(a):
        return P(("y", "x")) if _is_stacked(a, nxp_loc) else P()

    def unstack(tree):
        return jax.tree_util.tree_map(
            lambda a: a[0] if _is_stacked(a, nxp_loc) else a, tree)

    def localize_grids(m):
        """Fix the static Nx/Ny metadata of every component grid to the
        local tile (array leaves are already local after unstack)."""
        def fix(component):
            return dataclasses.replace(
                component, grid=dataclasses.replace(component.grid,
                                                    Nx=nx_loc, Ny=ny_loc))
        m = dataclasses.replace(m, ocean=fix(m.ocean))
        if m.sea_ice is not None:
            m = dataclasses.replace(m, sea_ice=fix(m.sea_ice))
        return m

    def sharded_fill(a, g, location="c", vector=False):
        return halo_exchange(a, g.H, periodic_x=grid.periodic_x,
                             periodic_y=grid.periodic_y, fold=fold,
                             location=location,
                             fold_sign=-1.0 if vector else 1.0)

    def _restack(a):
        return a[None] if (a.ndim >= 2 and a.shape[-1] == nxp_loc) else a

    def _tile_sds(tree):
        """Per-tile ShapeDtypeStructs (device axis stripped) — coupled_step
        indexes leading axes positionally (T[-1] is the surface), so shape
        inference must see tile-rank arrays, not stacked ones."""
        def f(a):
            if not hasattr(a, "shape"):
                return a
            shape = a.shape[1:] if _is_stacked(a, nxp_loc) else a.shape
            return jax.ShapeDtypeStruct(shape, a.dtype)
        return jax.tree_util.tree_map(f, tree)

    def run_for(n_steps):
        """Jitted ``(model_s, state_s, t, dt, t_offset) -> state_s``
        advancing ``n_steps`` coupled steps in ONE shard_map dispatch (a
        `lax.scan` inside the mapped body — dispatch batching composes with
        the explicit halo exchange)."""

        def step_local(model_tile, state_tile, t, dt, t_offset):
            from ..core.halo import sum_override

            m = localize_grids(unstack(model_tile))
            s = unstack(state_tile)
            with halo_override(sharded_fill), \
                    sum_override(lambda x: jax.lax.psum(jnp.sum(x),
                                                        ("y", "x"))):
                # first step outside the scan: it adds the net-flux
                # diagnostics, and the scan carry needs a fixed structure
                s = cm.coupled_step(m, s, t, dt, t_offset)
                if n_steps > 1:
                    def body(carry, i):
                        return cm.coupled_step(m, carry, t + i * dt, dt,
                                               t_offset), None
                    s, _ = jax.lax.scan(
                        body, s, jnp.arange(1, n_steps, dtype=jnp.float32))
            return jax.tree_util.tree_map(_restack, s)

        def run(model_s, state_s, t, dt, t_offset):
            in_specs = (jax.tree_util.tree_map(spec_for, model_s),
                        jax.tree_util.tree_map(spec_for, state_s),
                        P(), P(), P())
            # the output adds `net_fluxes` to the state on the first step —
            # derive its structure abstractly (shapes only; the halo-fill
            # indices seen by eval_shape are meaningless but shape-preserving)
            out_sd = jax.eval_shape(
                lambda m, s: cm.coupled_step(localize_grids(m), s, 0.0, 1.0),
                _tile_sds(model_s), _tile_sds(state_s))
            out_specs = jax.tree_util.tree_map(
                lambda sd: P(("y", "x")) if (len(sd.shape) >= 2
                                             and sd.shape[-1] == nxp_loc)
                else P(), out_sd)
            return shard_map(step_local, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs)(model_s, state_s, t, dt,
                                                  t_offset)

        return jax.jit(run, donate_argnums=(1,) if donate else ())

    def partition(tree):
        return partition_tree(tree, grid, py, px)

    def unpartition(tree):
        return jax.tree_util.tree_map(
            lambda a: unpartition_array(a, grid, py, px)
            if _is_stacked(a, nxp_loc) else a, tree)

    return run_for, resolve_model, partition, unpartition


def make_sharded_coupled_step_fn(model, mesh: Mesh, donate=False,
                                 prefetcher=None):
    """Jitted FULL coupled step (atmosphere time-interp → bulk fluxes → EVP
    sea ice → ocean) under `shard_map` with ppermute halo exchange.

    Returns (step_fn, partition_fn, unpartition_fn) with
    ``step_fn(state_stacked, t, dt) -> state_stacked``. Tripolar grids ride
    the fold ppermute in `halo_exchange` (see `_fold_params`).
    """
    run_for, resolve_model, partition, unpartition = _coupled_shard_builder(
        model, mesh, donate, prefetcher)
    jitted = run_for(1)

    def step_fn(state_stacked, t, dt):
        m, t_eff = resolve_model(t, t + dt)
        return jitted(m, state_stacked, t_eff, dt, t - t_eff)

    return step_fn, partition, unpartition


def make_sharded_batched_step_fn(model, mesh: Mesh, donate=False,
                                 prefetcher=None):
    """``(state_stacked, t, dt, n) -> state_stacked`` — the distributed
    counterpart of `models.coupled.make_batched_step_fn`: ``n`` coupled
    steps per device dispatch as a `lax.scan` INSIDE the shard_map body,
    jitted once per distinct ``n``. This is what lets the FULL OMIP
    protocol (writers, checkpointing, prefetched forcing) run distributed
    with the single-device dispatch amortization (reference: the
    production launchers run `omip_simulation` under
    `Distributed(GPU(), partition=Partition(Rx,Ry))`, `launch.sh:165`,
    `pbs_launch.sh:51,71`)."""
    run_for, resolve_model, partition, unpartition = _coupled_shard_builder(
        model, mesh, donate, prefetcher)
    cache = {}

    def batched(state_stacked, t, dt, n):
        fn = cache.get(n)
        if fn is None:
            fn = cache.setdefault(n, run_for(n))
        m, t_eff = resolve_model(t, t + n * dt)
        return fn(m, state_stacked, t_eff, dt, t - t_eff)

    return batched, partition, unpartition
