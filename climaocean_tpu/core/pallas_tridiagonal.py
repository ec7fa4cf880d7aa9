"""Pallas VMEM-resident batched tridiagonal (Thomas) solver.

The XLA unrolled solver (`core/tridiagonal.py`) processes full (Ny, Nx)
planes per level, so the forward/backward sweeps materialize ~4·Nz
intermediate planes in HBM; at 1/4° the three implicit solves (T/S
batch, u, v) cost ~4.4 ms per RK3 stage. Here the whole column block
lives in VMEM: one y-slab of (a, b, c, d) streams in (standard Pallas
block pipelining — no stencil margins, so no manual DMA is needed), both
sweeps run on-chip, and one x slab streams out. Algorithm and operation
order match `tridiagonal.solve_tridiagonal` exactly (same eps clamp), so
results agree to FMA-contraction roundoff.

System convention (z-leading, k = 0 bottom), as in `core/tridiagonal.py`:

    a[k] x[k-1] + b[k] x[k] + c[k] x[k+1] = d[k]

Shapes: a, b, c: (Nz, Ny, Nx) shared across the field batch; d: (Nf, Nz,
Ny, Nx) (or (Nz, Ny, Nx) for a single field).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, c_ref, d_ref, x_ref, *, nz, nf):
    a = a_ref[...]
    b = b_ref[...]
    c = c_ref[...]
    d = d_ref[...]
    eps = jnp.asarray(1e-30, dtype=b.dtype)

    # Forward sweep (shared c' across the batch; per-field d')
    cp, dp = [], []
    cp_k = jnp.zeros_like(b[0])
    dp_k = jnp.zeros_like(d[:, 0])
    for k in range(nz):
        denom = b[k] - a[k] * cp_k
        denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
        cp_k = c[k] / denom
        dp_k = (d[:, k] - a[k] * dp_k) / denom
        cp.append(cp_k)
        dp.append(dp_k)

    # Back substitution
    x = dp[nz - 1]
    xs = [x]
    for k in range(nz - 2, -1, -1):
        x = dp[k] - cp[k] * x
        xs.append(x)
    x_ref[...] = jnp.stack(xs[::-1], axis=1)


_VMEM_LIMIT = 110 * 1024 * 1024


def block_vmem_bytes(nf, nz, nx, by, itemsize=4):
    """Live-VMEM estimate for one grid step: double-buffered in/out blocks
    (Pallas pipelining) + the forward sweep's retained cp/dp levels."""
    nx_t = -(-nx // 128) * 128
    pipelined = 2 * (3 * nz + 2 * nf * nz)       # a,b,c,d in + x out, ×2
    sweeps = nz * (1 + nf)                       # cp[k] and dp[k] kept live
    return (pipelined + sweeps) * by * nx_t * itemsize


def choose_block(nf, nz, nx, budget=None):
    """Largest y-slab whose live VMEM fits, or None (→ XLA fallback)."""
    if budget is None:
        budget = int(0.7 * _VMEM_LIMIT)
    for by in (16, 8, 4, 2):
        if block_vmem_bytes(nf, nz, nx, by) <= budget:
            return by
    return None


def _impl_kernel(inv_dzc_ref, inv_dzf_ref, dt_ref,
                 nu_ref, kap_ref, u_ref, v_ref, T_ref, S_ref,
                 wc_ref, wu_ref, wv_ref, ww_ref, isg2_ref, out_ref, *, nz):
    """Matrix build + Thomas for (u | ν-matrix, wet_u), (v | ν, wet_v),
    (T, S | κ-matrix, wet_c) — everything VMEM-resident per y-slab.
    Semantics = `tridiagonal.implicit_vertical_diffusion_matrix` +
    `solve_tridiagonal` exactly (same eps clamp and operation order)."""
    dt = dt_ref[0]
    nu = nu_ref[...]
    kap = kap_ref[...]
    wc = wc_ref[...]
    wu = wu_ref[...]
    wv = wv_ref[...]
    ww = ww_ref[...]
    isg2 = isg2_ref[...]
    eps = jnp.asarray(1e-30, dtype=nu.dtype)

    def lams(kw, k):
        """(lam_lo, lam_hi) at level k for face diffusivity kw (premasked
        by wet_w)."""
        lo = dt * kw[k] * (inv_dzc_ref[k] * inv_dzf_ref[k]) * isg2
        if k == nz - 1:
            hi = jnp.zeros_like(lo)      # no implicit flux through the top
        else:
            hi = dt * kw[k + 1] * (inv_dzc_ref[k] * inv_dzf_ref[k + 1]) * isg2
        return lo, hi

    def sweep(kw, wet, ds):
        """Forward-eliminate + back-substitute for fields ``ds`` sharing
        the (kw, wet) matrix; build a/b/c rows on the fly."""
        cp, dps = [], [[] for _ in ds]
        cp_k = jnp.zeros_like(wet[0])
        dp_k = [jnp.zeros_like(wet[0]) for _ in ds]
        for k in range(nz):
            lo, hi = lams(kw, k)
            ak = -lo * wet[k]
            ck = -hi * wet[k]
            bk = jnp.where(wet[k] > 0, 1.0 + lo + hi, 1.0)
            denom = bk - ak * cp_k
            denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
            cp_k = ck / denom
            cp.append(cp_k)
            for i, d in enumerate(ds):
                dp_k[i] = (d[k] * wet[k] - ak * dp_k[i]) / denom
                dps[i].append(dp_k[i])
        outs = []
        for dp in dps:
            x = dp[nz - 1]
            xs = [x]
            for k in range(nz - 2, -1, -1):
                x = dp[k] - cp[k] * x
                xs.append(x)
            outs.append(jnp.stack(xs[::-1]))
        return outs

    kwn = nu * ww
    kwk = kap * ww
    u_out, = sweep(kwn, wu, [u_ref[...]])
    v_out, = sweep(kwn, wv, [v_ref[...]])
    T_out, S_out = sweep(kwk, wc, [T_ref[...], S_ref[...]])
    out_ref[...] = jnp.stack([u_out, v_out, T_out, S_out])


def impl_block_vmem_bytes(nz, nx, by, itemsize=4):
    nx_t = -(-nx // 128) * 128
    pipelined = 2 * (10 * nz + 4 + 2 + 4 * nz)   # ins (+2 nz+1 extras) + out
    sweeps = 3 * nz + 4 * nz                     # cp chains + dp chains
    return (pipelined + sweeps) * by * nx_t * itemsize


def impl_choose_block(nz, nx, budget=None):
    if budget is None:
        budget = int(0.7 * _VMEM_LIMIT)
    for by in (16, 8, 4, 2):
        if impl_block_vmem_bytes(nz, nx, by) <= budget:
            return by
    return None


def implicit_vertical_solve_pallas(nu_w, kap_w, u, v, T, S, grid, dt,
                                   inv_sig2=None, by=8):
    """Fused implicit vertical diffusion of u, v, T, S: coefficient build
    and all four Thomas solves in ONE kernel (the XLA path materializes
    ~9 full coefficient fields in HBM — measured 4.3 ms/stage at 1/4° vs
    a ~0.6 ms roofline).

    nu_w, kap_w: (Nz+1, Ny, Nx) face diffusivities (NOT premasked; the
    kernel applies wet_w). inv_sig2: 2-D 1/σ² for z★ thickness scaling
    (None -> ones). Returns (u, v, T, S)."""
    nz, ny, nx = u.shape
    ny_t = -(-ny // by) * by
    nx_t = -(-nx // 128) * 128
    ft = u.dtype
    if inv_sig2 is None:
        inv_sig2 = jnp.ones((ny, nx), ft)

    def pad(arr):
        pads = [(0, 0)] * arr.ndim
        pads[-2] = (0, ny_t - ny)
        pads[-1] = (0, nx_t - nx)
        return jnp.pad(arr, pads)

    inv_dzc = jnp.where(grid.dz_c != 0, 1.0 / grid.dz_c, 0.0).astype(ft)
    inv_dzf = jnp.where(grid.dz_f != 0, 1.0 / grid.dz_f, 0.0).astype(ft)
    dt_arr = jnp.asarray([dt], ft)

    bs3 = lambda z: pl.BlockSpec((z, by, nx_t), lambda j: (0, j, 0))
    bs2 = pl.BlockSpec((by, nx_t), lambda j: (j, 0))
    n_tiles = ny_t // by
    x = pl.pallas_call(
        partial(_impl_kernel, nz=nz),
        out_shape=jax.ShapeDtypeStruct((4, nz, ny_t, nx_t), ft),
        grid=(n_tiles,),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [bs3(nz + 1), bs3(nz + 1), bs3(nz), bs3(nz), bs3(nz), bs3(nz),
           bs3(nz), bs3(nz), bs3(nz), bs3(nz + 1), bs2],
        out_specs=pl.BlockSpec((4, nz, by, nx_t), lambda j: (0, 0, j, 0)),
    )(inv_dzc, inv_dzf, dt_arr, pad(nu_w), pad(kap_w), pad(u), pad(v),
      pad(T), pad(S), pad(grid.wet_c), pad(grid.wet_u), pad(grid.wet_v),
      pad(grid.wet_w), pad(inv_sig2))
    x = x[:, :, :ny, :nx]
    return x[0], x[1], x[2], x[3]


def solve_tridiagonal_pallas(a, b, c, d, by=16):
    """Solve the batch of column systems with a fused Pallas kernel.

    a, b, c: (Nz, Ny, Nx); d: (Nf, Nz, Ny, Nx) or (Nz, Ny, Nx).
    Returns x with d's shape.
    """
    single = d.ndim == 3
    if single:
        d = d[None]
    nf, nz, ny, nx = d.shape
    ny_t = -(-ny // by) * by
    nx_t = -(-nx // 128) * 128

    def pad(arr):
        pads = [(0, 0)] * arr.ndim
        pads[-2] = (0, ny_t - ny)
        pads[-1] = (0, nx_t - nx)
        return jnp.pad(arr, pads)

    ft = d.dtype
    n_tiles = ny_t // by
    x = pl.pallas_call(
        partial(_kernel, nz=nz, nf=nf),
        out_shape=jax.ShapeDtypeStruct((nf, nz, ny_t, nx_t), ft),
        grid=(n_tiles,),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[
            pl.BlockSpec((nz, by, nx_t), lambda j: (0, j, 0)),
            pl.BlockSpec((nz, by, nx_t), lambda j: (0, j, 0)),
            pl.BlockSpec((nz, by, nx_t), lambda j: (0, j, 0)),
            pl.BlockSpec((nf, nz, by, nx_t), lambda j: (0, 0, j, 0)),
        ],
        out_specs=pl.BlockSpec((nf, nz, by, nx_t), lambda j: (0, 0, j, 0)),
    )(pad(a), pad(b), pad(c), pad(d))
    x = x[:, :, :ny, :nx]
    return x[0] if single else x


# --------------------------------------------------------------------------
# fused implicit solves + CATKE (diffusivities, TKE production/dissipation
# and the prognostic-e solve all in ONE kernel)
# --------------------------------------------------------------------------

_VON_KARMAN = 0.4


def _impl_catke_kernel(inv_dzc_ref, inv_dzf_ref, dt_ref, zf_ref, zc_ref,
                       e_ref, N2_ref, S2_ref, u_ref, v_ref, T_ref, S_ref,
                       ustar_ref, Jb_ref, nubg_ref, kapbg_ref,
                       wc_ref, wu_ref, wv_ref, ww_ref, isg2_ref,
                       out_ref, *, nz, cat):
    """`_impl_kernel` extended with CATKE (`closures/catke.py`): the
    mixing lengths / eddy coefficients (incl. the round-4 Deardorff
    convective + penetrative-entrainment branches), shear+buoyancy TKE
    production, linearized dissipation, and the implicit TKE solve run
    VMEM-resident alongside the u/v/T/S solves, eliminating the separate
    XLA `step_prognostics` pass. Semantics match
    `CATKEVerticalDiffusivity.{_lengths,diffusivities,step_prognostics}`
    (same clamps and endpoint handling, σ-free TKE matrix); ``cat`` is the
    (static, frozen) closure dataclass; ``nubg``/``kapbg`` are the summed
    NON-CATKE face diffusivities (background/Ri-based/etc, built in XLA)."""
    dt = dt_ref[0]
    e = e_ref[...]
    N2 = N2_ref[...]
    S2 = S2_ref[...]
    wc = wc_ref[...]
    wu = wu_ref[...]
    wv = wv_ref[...]
    ww = ww_ref[...]
    isg2 = isg2_ref[...]
    ustar = ustar_ref[...]
    Jb = Jb_ref[...]
    ft = e.dtype
    eps = jnp.asarray(1e-30, ft)
    VK = jnp.asarray(_VON_KARMAN, ft)

    # ---- CATKE face coefficients + production term ----------------------
    # clamp-then-interpolate, exactly like `_lengths` (e is clamped per
    # cell BEFORE the face mean)
    ec = [jnp.maximum(e[k], cat.minimum_tke) for k in range(nz)]
    nu_f, kap_f, kape_f, X = [], [], [], []
    for k in range(nz + 1):
        if k == 0:
            ew = ec[0]
        elif k == nz:
            ew = ec[nz - 1]
        else:
            ew = 0.5 * (ec[k - 1] + ec[k])
        sqrt_2e = jnp.sqrt(2.0 * ew)
        N = jnp.sqrt(jnp.maximum(N2[k], 1e-12))
        l_b = cat.Cb * sqrt_2e / N
        d = jnp.maximum(-zf_ref[k], 1e-2)
        l_wall = VK * d
        Ri = N2[k] / jnp.maximum(S2[k], 1e-12)
        sig = cat.sigma_minus + (1.0 - cat.sigma_minus) * 0.5 * (
            1.0 - jnp.tanh((Ri - cat.Ri_zero) / cat.Ri_width))
        # convective / entrainment branches (closures/catke.py `_lengths`)
        w_star = jnp.sqrt(ew)
        N2_above = N2[k + 1] if k < nz else N2[nz]
        convecting = (N2[k] < 0.0) & (Jb > 0.0)
        entraining = (N2[k] > 0.0) & (N2_above < 0.0) & (Jb > 0.0)
        l_deardorff = w_star ** 3 / jnp.maximum(Jb, 1e-12)
        l_entrain = Jb / (jnp.maximum(w_star, 1e-6)
                          * jnp.maximum(N2[k], 1e-12))

        def length(C_shear, C_conv, C_ent):
            l_st = jnp.minimum(C_shear * sig * l_b, l_wall)
            l_h = jnp.where(convecting, C_conv * l_deardorff,
                            jnp.where(entraining, C_ent * l_entrain, 0.0))
            return jnp.maximum(l_st, jnp.minimum(l_h, d))

        sqrt_e = w_star
        nu_k = jnp.minimum(length(cat.Clu, cat.Cconv_u, cat.Cent_u)
                           * sqrt_e, cat.maximum_viscosity)
        kap_k = jnp.minimum(length(cat.Clc, cat.Cconv_c, cat.Cent_c)
                            * sqrt_e, cat.maximum_tracer_diffusivity)
        kape_k = jnp.minimum(length(cat.Cle, cat.Cconv_e, cat.Cent_e)
                             * sqrt_e, cat.maximum_tke_diffusivity)
        nu_f.append(nu_k)
        kap_f.append(kap_k)
        kape_f.append(kape_k)
        # production uses the CATKE-only (masked) coefficients, exactly
        # like step_prognostics' own nu_w/kap_w
        X.append((nu_k * S2[k] - kap_k * N2[k]) * ww[k])

    def lams(kw, k, isg):
        lo = dt * kw[k] * ww[k] * (inv_dzc_ref[k] * inv_dzf_ref[k]) * isg
        if k == nz - 1:
            hi = jnp.zeros_like(lo)
        else:
            hi = dt * kw[k + 1] * ww[k + 1] \
                * (inv_dzc_ref[k] * inv_dzf_ref[k + 1]) * isg
        return lo, hi

    def sweep(kw, wet, ds, isg, extra=None):
        cp, dps = [], [[] for _ in ds]
        cp_k = jnp.zeros_like(wet[0])
        dp_k = [jnp.zeros_like(wet[0]) for _ in ds]
        for k in range(nz):
            lo, hi = lams(kw, k, isg)
            ak = -lo * wet[k]
            ck = -hi * wet[k]
            bk = jnp.where(wet[k] > 0, 1.0 + lo + hi, 1.0)
            if extra is not None:
                bk = bk + extra[k] * wet[k]
            denom = bk - ak * cp_k
            denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
            cp_k = ck / denom
            cp.append(cp_k)
            for i, d in enumerate(ds):
                dp_k[i] = (d[k] - ak * dp_k[i]) / denom
                dps[i].append(dp_k[i])
        outs = []
        for dp in dps:
            x = dp[nz - 1]
            xs = [x]
            for k in range(nz - 2, -1, -1):
                x = dp[k] - cp[k] * x
                xs.append(x)
            outs.append(jnp.stack(xs[::-1]))
        return outs

    nubg = nubg_ref[...]
    kapbg = kapbg_ref[...]
    nu_tot = [nu_f[k] + nubg[k] for k in range(nz + 1)]
    kap_tot = [kap_f[k] + kapbg[k] for k in range(nz + 1)]
    u_out, = sweep(nu_tot, wu, [[u_ref[k] * wu[k] for k in range(nz)]],
                   isg2)
    v_out, = sweep(nu_tot, wv, [[v_ref[k] * wv[k] for k in range(nz)]],
                   isg2)
    T_out, S_out = sweep(kap_tot, wc,
                         [[T_ref[k] * wc[k] for k in range(nz)],
                          [S_ref[k] * wc[k] for k in range(nz)]], isg2)

    # ---- TKE right-hand side + implicit solve ---------------------------
    one = jnp.ones_like(isg2)
    rhs_sfc = cat.CWu * ustar ** 3 * inv_dzc_ref[nz - 1]
    rhs, extra = [], []
    for k in range(nz):
        prod_k = X[nz - 1] if k == nz - 1 else 0.5 * (X[k] + X[k + 1])
        r = e[k] + dt * prod_k
        if k == nz - 1:
            r = r + dt * rhs_sfc
        rhs.append(r * wc[k])
        e_c = jnp.maximum(e[k], cat.minimum_tke)
        N_c2 = N2[nz - 1] if k == nz - 1 else 0.5 * (N2[k] + N2[k + 1])
        N_c = jnp.sqrt(jnp.maximum(N_c2, 1e-12))
        d_c = jnp.maximum(-zc_ref[k], 1e-2)
        l_D = jnp.minimum(cat.Cb * jnp.sqrt(2.0 * e_c) / N_c, VK * d_c)
        l_D = jnp.maximum(l_D, 1e-2)
        diss = dt * cat.Cd * jnp.sqrt(e_c) / l_D
        damp = dt / cat.negative_tke_damping_time_scale * (e[k] < 0)
        extra.append(diss + damp)
    e_out, = sweep(kape_f, wc, [rhs], one, extra=extra)
    e_out = e_out * wc

    out_ref[...] = jnp.stack([u_out, v_out, T_out, S_out, e_out])


def catke_block_vmem_bytes(nz, nx, by, itemsize=4):
    nx_t = -(-nx // 128) * 128
    pipelined = 2 * (14 * nz + 10 + 5 * nz)      # ins + (5, nz) out
    lists = 5 * (nz + 1) + 3 * nz                # face coeffs + rhs/extra
    sweeps = 4 * nz + 5 * nz                     # cp + dp chains
    return (pipelined + lists + sweeps) * by * nx_t * itemsize


def catke_choose_block(nz, nx, budget=None):
    if budget is None:
        budget = int(0.7 * _VMEM_LIMIT)
    for by in (16, 8, 4, 2):
        if catke_block_vmem_bytes(nz, nx, by) <= budget:
            return by
    return None


def implicit_vertical_catke_pallas(cat, nu_bg, kap_bg, state, aux, grid, dt,
                                   inv_sig2=None, by=8):
    """Fused implicit vertical step for a CATKE closure stack: CATKE
    diffusivities (round-4 convective/entrainment lengths), TKE
    production/dissipation, and all FIVE implicit solves (u, v, T, S, e)
    in one kernel. ``nu_bg``/``kap_bg``: summed face diffusivities of the
    NON-CATKE closures ((Nz+1, Nyp, Nxp), built in XLA — background,
    Henyey, Ri-based, ...). Returns (u, v, T, S, e)."""
    u = state["u"]
    nz, ny, nx = u.shape
    ny_t = -(-ny // by) * by
    nx_t = -(-nx // 128) * 128
    ft = u.dtype
    if inv_sig2 is None:
        inv_sig2 = jnp.ones((ny, nx), ft)

    def pad(arr):
        pads = [(0, 0)] * arr.ndim
        pads[-2] = (0, ny_t - ny)
        pads[-1] = (0, nx_t - nx)
        return jnp.pad(arr, pads)

    inv_dzc = jnp.where(grid.dz_c != 0, 1.0 / grid.dz_c, 0.0).astype(ft)
    inv_dzf = jnp.where(grid.dz_f != 0, 1.0 / grid.dz_f, 0.0).astype(ft)
    dt_arr = jnp.asarray([dt], ft)
    Jb = jnp.maximum(-aux.Qb, 0.0).astype(ft)

    bs3 = lambda z: pl.BlockSpec((z, by, nx_t), lambda j: (0, j, 0))
    bs2 = pl.BlockSpec((by, nx_t), lambda j: (j, 0))
    n_tiles = ny_t // by
    x = pl.pallas_call(
        partial(_impl_catke_kernel, nz=nz, cat=cat),
        out_shape=jax.ShapeDtypeStruct((5, nz, ny_t, nx_t), ft),
        grid=(n_tiles,),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
        + [bs3(nz), bs3(nz + 1), bs3(nz + 1), bs3(nz), bs3(nz), bs3(nz),
           bs3(nz), bs2, bs2, bs3(nz + 1), bs3(nz + 1),
           bs3(nz), bs3(nz), bs3(nz), bs3(nz + 1), bs2],
        out_specs=pl.BlockSpec((5, nz, by, nx_t), lambda j: (0, 0, j, 0)),
    )(inv_dzc, inv_dzf, dt_arr, grid.z_f.astype(ft), grid.z_c.astype(ft),
      pad(state["e"]), pad(aux.N2), pad(aux.S2), pad(u), pad(state["v"]),
      pad(state["T"]), pad(state["S"]), pad(aux.u_star), pad(Jb),
      pad(nu_bg), pad(kap_bg), pad(grid.wet_c),
      pad(grid.wet_u), pad(grid.wet_v), pad(grid.wet_w), pad(inv_sig2))
    x = x[:, :, :ny, :nx]
    return x[0], x[1], x[2], x[3], x[4]
