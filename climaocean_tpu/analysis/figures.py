"""Core figure suite rendered from a finished run's output directory.

Counterpart of the reference's offline visualization scripts
(`visualize/cache.jl` figNN products; SURVEY.md §3.5): SST/SSS bias vs the
ingested climatology, AMOC ψ(y,z) + 26.5°N series, sea-ice extent, MLD,
strait transports, and the scalar budget series (zosga mass check).

Chart conventions: one axis per panel; diverging two-hue+neutral colormaps
only for signed fields (bias, ψ); single-hue sequential ramps for
magnitudes; colorblind-safe Okabe–Ito categorical order for series lines,
fixed (never cycled); 2px lines; recessive grids; legends only for ≥2
series.
"""

from __future__ import annotations

import os

import numpy as np

# fixed categorical order (Okabe–Ito, CVD-safe) — never cycled
SERIES_COLORS = ("#0072B2", "#E69F00", "#009E73", "#CC79A7")
DIVERGING = "RdBu_r"          # two hues + neutral midpoint
SEQUENTIAL = "Blues"          # one hue, light -> dark


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.rcParams.update({
        "axes.spines.top": False, "axes.spines.right": False,
        "axes.grid": True, "grid.alpha": 0.25, "grid.linewidth": 0.5,
        "font.size": 10, "figure.dpi": 110,
    })
    return plt


def _save(fig, figdir, name):
    path = os.path.join(figdir, name + ".png")
    fig.savefig(path, bbox_inches="tight")
    import matplotlib.pyplot as plt
    plt.close(fig)
    return path


def _sym_limits(a, q=99.0):
    m = np.nanpercentile(np.abs(a), q)
    return (-m, m) if np.isfinite(m) and m > 0 else (-1, 1)


def fig_bias(cache, figdir, which="sst"):
    plt = _mpl()
    prod = cache.get(f"{which}_bias")
    bias, rms = prod["bias"], float(prod["rms"])
    unit = "°C" if which == "sst" else "g/kg"
    fig, ax = plt.subplots(figsize=(9, 4))
    lo, hi = _sym_limits(bias)
    im = ax.imshow(bias, origin="lower", cmap=DIVERGING, vmin=lo, vmax=hi,
                   aspect="auto", interpolation="nearest")
    fig.colorbar(im, ax=ax, label=f"{which.upper()} bias [{unit}]")
    ax.set_title(f"{which.upper()} bias vs climatology — RMS {rms:.2f} {unit}")
    ax.set_xlabel("i")
    ax.set_ylabel("j")
    ax.grid(False)
    return _save(fig, figdir, f"{which}_bias")


def fig_amoc(cache, figdir):
    plt = _mpl()
    prod = cache.get("amoc")
    psi = prod["psi"]                    # (Nz, Ny)
    fig, ax = plt.subplots(figsize=(8, 4))
    lo, hi = _sym_limits(psi)
    lat = prod.get("lat")
    x = lat if lat is not None and np.isfinite(lat).all() else \
        np.arange(psi.shape[1])
    im = ax.pcolormesh(x, np.arange(psi.shape[0]), psi, cmap=DIVERGING,
                       vmin=lo, vmax=hi)
    fig.colorbar(im, ax=ax, label="ψ [Sv]")
    ax.set_title("Atlantic meridional overturning streamfunction (time mean)")
    ax.set_xlabel("latitude" if lat is not None else "j")
    ax.set_ylabel("level k (0 = bottom)")
    ax.grid(False)
    paths = [_save(fig, figdir, "amoc_psi")]

    if "amoc_26n" in prod:
        fig, ax = plt.subplots(figsize=(8, 3))
        tyr = prod["time"] / (365.0 * 86400.0)
        ax.plot(tyr, prod["amoc_26n"], color=SERIES_COLORS[0], linewidth=2)
        ax.set_title("AMOC at 26.5°N (RAPID-comparable)")
        ax.set_xlabel("simulated years")
        ax.set_ylabel("max ψ [Sv]")
        paths.append(_save(fig, figdir, "amoc_26n"))
    return paths


def fig_ice(cache, figdir):
    plt = _mpl()
    prod = cache.get("ice")
    if "area_nh" not in prod:
        return []
    tyr = prod["time"] / (365.0 * 86400.0)
    paths = []
    for qty, unit in (("extent", "10⁶ km²"), ("volume", "10³ km³")):
        fig, ax = plt.subplots(figsize=(8, 3))
        for hemi, color, label in (("nh", SERIES_COLORS[0], "Arctic"),
                                   ("sh", SERIES_COLORS[1], "Antarctic")):
            ax.plot(tyr, prod[f"{qty}_{hemi}"], color=color, linewidth=2,
                    label=label)
        ax.set_title(f"Sea-ice {qty}")
        ax.set_xlabel("simulated years")
        ax.set_ylabel(f"{qty} [{unit}]")
        ax.legend(frameon=False)
        paths.append(_save(fig, figdir, f"ice_{qty}"))
    return paths


def fig_mld(cache, figdir):
    plt = _mpl()
    s = cache.get("surface")
    if "mlotst" not in s:
        return []
    mld = s["mlotst"].mean(axis=0)
    fig, ax = plt.subplots(figsize=(9, 4))
    im = ax.imshow(mld, origin="lower", cmap=SEQUENTIAL, aspect="auto",
                   vmin=0.0, vmax=max(np.nanpercentile(mld, 99), 1.0),
                   interpolation="nearest")
    fig.colorbar(im, ax=ax, label="MLD [m]")
    ax.set_title("Mixed-layer depth (time mean)")
    ax.set_xlabel("i")
    ax.set_ylabel("j")
    ax.grid(False)
    return [_save(fig, figdir, "mld")]


def fig_straits(cache, figdir):
    plt = _mpl()
    try:
        prod = cache.get("straits")
    except Exception:
        return []
    tyr = prod["time"] / (365.0 * 86400.0)
    fig, ax = plt.subplots(figsize=(8, 3))
    names = [k for k in ("drake", "bering", "itf") if k in prod]
    for name, color in zip(names, SERIES_COLORS):
        ax.plot(tyr, prod[name], color=color, linewidth=2,
                label=name.capitalize())
    ax.set_title("Strait volume transports")
    ax.set_xlabel("simulated years")
    ax.set_ylabel("transport [Sv]")
    if len(names) > 1:
        ax.legend(frameon=False)
    return [_save(fig, figdir, "strait_transports")]


def fig_scalars(cache, figdir):
    plt = _mpl()
    s = cache.get("scalars")
    tyr = s["time"] / (365.0 * 86400.0)
    panels = [("zosga", "global-mean SSH [m] (Boussinesq mass check)"),
              ("thetaoga", "volume-mean Θ [°C]"),
              ("soga", "volume-mean S_A [g/kg]"),
              ("ke", "volume-mean KE [m²/s²]")]
    panels = [(k, l) for k, l in panels if k in s]
    fig, axes = plt.subplots(len(panels), 1, figsize=(8, 2.2 * len(panels)),
                             sharex=True)
    axes = np.atleast_1d(axes)
    for ax, (k, label) in zip(axes, panels):
        ax.plot(tyr, s[k], color=SERIES_COLORS[0], linewidth=2)
        ax.set_ylabel(label, fontsize=8)
    axes[-1].set_xlabel("simulated years")
    fig.suptitle("Scalar budgets")
    return [_save(fig, figdir, "scalars")]


def render_all(outdir, grid=None, prefix="omip", figdir=None):
    """Render every figure whose inputs exist; returns the file list."""
    from ..simulation.analysis import CaseCache

    cache = CaseCache(outdir, grid=grid, prefix=prefix)
    figdir = figdir or os.path.join(outdir, "figures")
    os.makedirs(figdir, exist_ok=True)
    paths = []

    def attempt(fn, *a):
        try:
            out = fn(cache, figdir, *a)
            paths.extend(out if isinstance(out, list) else [out])
        except (FileNotFoundError, KeyError) as e:
            print(f"skip {fn.__name__}: {e}")

    attempt(fig_scalars)
    attempt(fig_mld)
    if grid is not None:
        attempt(fig_ice)          # area integrals need the grid metrics
        attempt(fig_bias, "sst")
        attempt(fig_bias, "sss")
        attempt(fig_amoc)
        attempt(fig_straits)
    return paths
