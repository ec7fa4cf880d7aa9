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
    for qty, unit in (("extent", "10⁶ km²"), ("area", "10⁶ km²"),
                      ("volume", "10³ km³")):
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



def fig_ke(cache, figdir):
    """Reference fig15_ke: global-mean kinetic energy time series (also a
    panel of fig_scalars; kept as its own product for 1:1 figure parity)."""
    plt = _mpl()
    s = cache.get("scalars")
    if "ke" not in s:
        return []
    fig, ax = plt.subplots(figsize=(8, 3))
    ax.plot(s["time"] / (365.0 * 86400.0), s["ke"], color=SERIES_COLORS[0],
            linewidth=2)
    ax.set_xlabel("simulated years")
    ax.set_ylabel("KE [m²/s²]")
    ax.set_title("Global-mean kinetic energy")
    return [_save(fig, figdir, "ke")]


def _map(ax, fig, data, label, cmap, signed=False, vmax_q=99.0):
    if signed:
        lo, hi = _sym_limits(data)
    else:
        lo, hi = 0.0, max(float(np.nanpercentile(data, vmax_q)), 1e-12)
    im = ax.imshow(data, origin="lower", cmap=cmap, vmin=lo, vmax=hi,
                   aspect="auto", interpolation="nearest")
    fig.colorbar(im, ax=ax, label=label)
    ax.set_xlabel("i")
    ax.set_ylabel("j")
    ax.grid(False)


def fig_ssh(cache, figdir):
    """Reference fig03_ssh + fig09_ssh_variance: time-mean SSH, SSH RMS,
    and the demeaned difference vs ECCO when the baseline is staged."""
    plt = _mpl()
    prod = cache.get("ssh")
    paths = []
    fig, ax = plt.subplots(figsize=(9, 4))
    lo, hi = _sym_limits(prod["mean"])
    im = ax.imshow(prod["mean"], origin="lower", cmap=DIVERGING, vmin=lo,
                   vmax=hi, aspect="auto", interpolation="nearest")
    fig.colorbar(im, ax=ax, label="SSH [m]")
    ax.set_title("Time-mean SSH")
    ax.grid(False)
    paths.append(_save(fig, figdir, "ssh_mean"))

    fig, ax = plt.subplots(figsize=(9, 4))
    _map(ax, fig, prod["rms"], "SSH RMS [m]", SEQUENTIAL)
    ax.set_title("SSH variability (RMS)")
    paths.append(_save(fig, figdir, "ssh_rms"))

    if "vs_ecco" in prod:
        fig, ax = plt.subplots(figsize=(9, 4))
        _map(ax, fig, prod["vs_ecco"], "ΔSSH [m]", DIVERGING, signed=True)
        ax.set_title("SSH − ECCO (demeaned)")
        paths.append(_save(fig, figdir, "ssh_vs_ecco"))
    return paths


def fig_wind_stress(cache, figdir):
    """Reference fig08_wind_stress: stress maps, zonal means, NCEP diff."""
    plt = _mpl()
    prod = cache.get("wind_stress")
    paths = []
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    for ax, comp, title in ((axes[0], "taux", "Zonal wind stress"),
                            (axes[1], "tauy", "Meridional wind stress")):
        _map(ax, fig, prod[comp], "τ [N/m²]", DIVERGING, signed=True)
        ax.set_title(title)
    paths.append(_save(fig, figdir, "wind_stress"))

    fig, ax = plt.subplots(figsize=(6, 4))
    y = prod.get("lat", np.arange(prod["taux_zonal"].shape[0]))
    ax.plot(prod["taux_zonal"], y, color=SERIES_COLORS[0], linewidth=2,
            label="τx")
    ax.plot(prod["tauy_zonal"], y, color=SERIES_COLORS[1], linewidth=2,
            label="τy")
    ax.set_xlabel("stress [N/m²]")
    ax.set_ylabel("latitude")
    ax.set_title("Zonal-mean wind stress")
    ax.legend(frameon=False)
    paths.append(_save(fig, figdir, "wind_stress_zonal"))

    if "taux_vs_ncep" in prod:
        fig, ax = plt.subplots(figsize=(9, 4))
        _map(ax, fig, prod["taux_vs_ncep"], "Δτx [N/m²]", DIVERGING,
             signed=True)
        ax.set_title("τx − NCEP")
        paths.append(_save(fig, figdir, "wind_stress_vs_ncep"))
    return paths


def fig_fluxes(cache, figdir):
    """Reference fig07_surface_fluxes: net heat and freshwater fluxes."""
    plt = _mpl()
    prod = cache.get("fluxes")
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    _map(axes[0], fig, prod["heat"], "Q [W/m²]", DIVERGING, signed=True)
    axes[0].set_title("Net heat flux")
    _map(axes[1], fig, prod["fresh"], "E−P−R [m/yr]", DIVERGING, signed=True)
    axes[1].set_title("Net freshwater flux")
    return [_save(fig, figdir, "surface_fluxes")]


def fig_currents(cache, figdir):
    """Reference fig24_near_surface_currents."""
    plt = _mpl()
    prod = cache.get("currents")
    fig, ax = plt.subplots(figsize=(9, 4))
    _map(ax, fig, prod["speed"], "|u| [m/s]", SEQUENTIAL)
    ax.set_title("Near-surface current speed (time mean)")
    return [_save(fig, figdir, "surface_currents")]


def fig_drift(cache, figdir):
    """Reference fig16_drift: global-mean T and S drift series from the
    volume-weighted profiles."""
    plt = _mpl()
    prod = cache.get("profiles")
    tyr = prod["time"] / (365.0 * 86400.0)
    # depth-weighted global means relative to the first snapshot
    fig, axes = plt.subplots(2, 1, figsize=(8, 5), sharex=True)
    for ax, var, label in ((axes[0], "T", "ΔΘ [°C]"),
                           (axes[1], "S", "ΔS_A [g/kg]")):
        series = prod[var].mean(axis=1)
        ax.plot(tyr, series - series[0], color=SERIES_COLORS[0], linewidth=2)
        ax.set_ylabel(label)
    axes[0].set_title("Global-mean drift")
    axes[-1].set_xlabel("simulated years")
    return [_save(fig, figdir, "drift")]


def fig_profiles(cache, figdir):
    """Reference fig17_profiles: horizontal-mean T/S vs depth (first and
    last snapshots)."""
    plt = _mpl()
    prod = cache.get("profiles")
    z = prod["z"]
    fig, axes = plt.subplots(1, 2, figsize=(9, 4), sharey=True)
    for ax, var, unit in ((axes[0], "T", "°C"), (axes[1], "S", "g/kg")):
        ax.plot(prod[var][0], z, color=SERIES_COLORS[0], linewidth=2,
                label="initial")
        ax.plot(prod[var][-1], z, color=SERIES_COLORS[1], linewidth=2,
                label="final")
        ax.set_xlabel(f"{var} [{unit}]")
        ax.set_title(f"Horizontal-mean {var}")
    axes[0].set_ylabel("z [m]")
    axes[0].legend(frameon=False)
    return [_save(fig, figdir, "profiles")]


def fig_ts_drift_heatmap(cache, figdir):
    """Reference fig21_TS_drift_heatmap: horizontal-mean T/S anomaly vs
    (time, depth)."""
    plt = _mpl()
    prod = cache.get("profiles")
    tyr = prod["time"] / (365.0 * 86400.0)
    z = prod["z"]
    fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    for ax, var, unit in ((axes[0], "T", "°C"), (axes[1], "S", "g/kg")):
        anom = (prod[var] - prod[var][0]).T       # (Nz, nt)
        lo, hi = _sym_limits(anom)
        im = ax.pcolormesh(tyr, z, anom, cmap=DIVERGING, vmin=lo, vmax=hi)
        fig.colorbar(im, ax=ax, label=f"Δ{var} [{unit}]")
        ax.set_ylabel("z [m]")
        ax.grid(False)
    axes[0].set_title("Horizontal-mean drift")
    axes[-1].set_xlabel("simulated years")
    return [_save(fig, figdir, "ts_drift_heatmap")]


def fig_zonal_mean(cache, figdir):
    """Reference fig18_zonal_mean (+fig19 drift vs WOA when staged) and
    fig20_mld_zonal_mean."""
    plt = _mpl()
    prod = cache.get("zonal_mean")
    z, lat = prod["z"], prod["lat"]
    paths = []
    fig, axes = plt.subplots(1, 2, figsize=(12, 4), sharey=True)
    for ax, var, cmap, unit in ((axes[0], "T", "RdYlBu_r", "°C"),
                                (axes[1], "S", "viridis", "g/kg")):
        im = ax.pcolormesh(lat, z, prod[var], cmap=cmap)
        fig.colorbar(im, ax=ax, label=f"{var} [{unit}]")
        ax.set_xlabel("latitude")
        ax.set_title(f"Zonal-mean {var}")
        ax.grid(False)
    axes[0].set_ylabel("z [m]")
    paths.append(_save(fig, figdir, "zonal_mean"))

    if "T_vs_woa" in prod:
        fig, axes = plt.subplots(1, 2, figsize=(12, 4), sharey=True)
        for ax, var, unit in ((axes[0], "T", "°C"), (axes[1], "S", "g/kg")):
            d = prod[f"{var}_vs_woa"]
            lo, hi = _sym_limits(d)
            im = ax.pcolormesh(lat, z, d, cmap=DIVERGING, vmin=lo, vmax=hi)
            fig.colorbar(im, ax=ax, label=f"Δ{var} [{unit}]")
            ax.set_xlabel("latitude")
            ax.set_title(f"Zonal {var} − WOA")
            ax.grid(False)
        axes[0].set_ylabel("z [m]")
        paths.append(_save(fig, figdir, "zonal_mean_vs_woa"))

    if "mld_zonal" in prod:
        fig, ax = plt.subplots(figsize=(8, 3))
        ax.plot(lat, prod["mld_zonal"], color=SERIES_COLORS[0], linewidth=2)
        ax.set_xlabel("latitude")
        ax.set_ylabel("MLD [m]")
        ax.set_title("Zonal-mean mixed-layer depth")
        ax.invert_yaxis()
        paths.append(_save(fig, figdir, "mld_zonal_mean"))

    if "b_drift" in prod:
        # reference fig19_zonal_drift third panel: zonal buoyancy drift
        fig, ax = plt.subplots(figsize=(7, 4))
        d = prod["b_drift"]
        lo, hi = _sym_limits(d)
        im = ax.pcolormesh(lat, z, d, cmap=DIVERGING, vmin=lo, vmax=hi)
        fig.colorbar(im, ax=ax, label="Δb [m/s²]")
        ax.set_xlabel("latitude")
        ax.set_ylabel("z [m]")
        ax.set_title("Zonal-mean buoyancy drift (end − start)")
        ax.grid(False)
        paths.append(_save(fig, figdir, "zonal_buoyancy_drift"))
    return paths


def fig_ice_clim(cache, figdir):
    """Reference fig10/fig11/fig12 monthly climatologies with NSIDC and
    PIOMAS overlays when staged."""
    plt = _mpl()
    prod = cache.get("ice_clim")
    if "extent_nh" not in prod:
        return []
    months = prod["months"] + 1
    paths = []
    for qty, unit, obskey in (("extent", "10⁶ km²", "nsidc_extent"),
                              ("area", "10⁶ km²", None),
                              ("volume", "10³ km³", "piomas_volume")):
        fig, ax = plt.subplots(figsize=(7, 3.5))
        for hemi, color, label in (("nh", SERIES_COLORS[0], "Arctic"),
                                   ("sh", SERIES_COLORS[1], "Antarctic")):
            ax.plot(months, prod[f"{qty}_{hemi}"], color=color, linewidth=2,
                    marker="o", markersize=3, label=label)
            ok = f"{obskey}_{qty}_{hemi}" if obskey else None
            if ok and ok in prod:
                ax.plot(months, prod[ok], color=color, linewidth=1.5,
                        linestyle="--", label=f"{label} obs")
        ax.set_xlabel("month")
        ax.set_ylabel(f"{qty} [{unit}]")
        ax.set_title(f"Sea-ice {qty} climatology")
        ax.legend(frameon=False, fontsize=8)
        paths.append(_save(fig, figdir, f"ice_{qty}_climatology"))
    return paths


def fig_siconc(cache, figdir):
    """Reference fig05_seaice_conc (+fig06 bias when obs staged)."""
    plt = _mpl()
    prod = cache.get("siconc_maps")
    if not int(prod.get("available", 0)):
        return []
    paths = []
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    for ax, season in ((axes[0], "march"), (axes[1], "september")):
        _map(ax, fig, prod[season], "concentration", "Blues_r")
        ax.set_title(f"Sea-ice concentration — {season.capitalize()}")
    paths.append(_save(fig, figdir, "siconc_seasonal"))
    for season in ("march", "september"):
        if f"{season}_bias" in prod:
            fig, ax = plt.subplots(figsize=(9, 4))
            _map(ax, fig, prod[f"{season}_bias"], "Δconcentration",
                 DIVERGING, signed=True)
            ax.set_title(f"SIC bias — {season.capitalize()}")
            paths.append(_save(fig, figdir, f"siconc_bias_{season}"))
    return paths


def fig_mld_seasonal(cache, figdir):
    """Reference fig04_mld: winter-max and summer-min MLD maps."""
    plt = _mpl()
    prod = cache.get("mld_seasonal")
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    for ax, key, title in ((axes[0], "winter_max", "Max MLD (winter)"),
                           (axes[1], "summer_min", "Min MLD (summer)")):
        _map(ax, fig, prod[key], "MLD [m]", SEQUENTIAL)
        ax.set_title(title)
    paths = [_save(fig, figdir, "mld_seasonal")]

    if "winter_max_zonal" in prod:
        # reference fig20_mld_zonal_mean: seasonal zonal-mean MLD curves
        fig, axes = plt.subplots(1, 2, figsize=(11, 3.2), sharex=True)
        for ax, key, title in (
                (axes[0], "summer_min_zonal", "Zonal-mean MLD (summer min)"),
                (axes[1], "winter_max_zonal", "Zonal-mean MLD (winter max)")):
            ax.plot(prod["lat"], np.abs(prod[key]), color=SERIES_COLORS[0],
                    linewidth=2)
            ax.set_xlabel("latitude")
            ax.set_ylabel("MLD [m]")
            ax.set_title(title, fontsize=9)
        paths.append(_save(fig, figdir, "mld_zonal_seasonal"))
    return paths


def fig_euc(cache, figdir):
    """Reference fig25_equatorial_undercurrent."""
    plt = _mpl()
    prod = cache.get("euc")
    fig, ax = plt.subplots(figsize=(9, 4))
    lo, hi = _sym_limits(prod["u"])
    im = ax.pcolormesh(prod["lon"], prod["z"], prod["u"], cmap=DIVERGING,
                       vmin=lo, vmax=hi)
    fig.colorbar(im, ax=ax, label="u [m/s]")
    ax.set_xlabel("longitude [°E]")
    ax.set_ylabel("z [m]")
    ax.set_title(f"Zonal current at {prod['lat_section']:.1f}°N")
    ax.grid(False)
    return [_save(fig, figdir, "equatorial_undercurrent")]


def fig_amoc_rapid(cache, figdir):
    """Reference fig26_amoc_rapid: the 26.5°N index (vs RAPID when staged)
    and ψ(z) at 26.5°N."""
    plt = _mpl()
    prod = cache.get("amoc_rapid")
    if "index" not in prod:
        return []
    paths = []
    fig, ax = plt.subplots(figsize=(8, 3))
    tyr = prod["time"] / (365.0 * 86400.0)
    ax.plot(tyr, prod["index"], color=SERIES_COLORS[0], linewidth=2,
            label="model")
    if "rapid_moc" in prod:
        ax.plot(prod["rapid_time"] / (365.0 * 86400.0), prod["rapid_moc"],
                color=SERIES_COLORS[1], linewidth=1.5, label="RAPID")
        ax.legend(frameon=False)
    ax.set_title("AMOC index at 26.5°N")
    ax.set_xlabel("simulated years")
    ax.set_ylabel("ψ max [Sv]")
    paths.append(_save(fig, figdir, "amoc_rapid_index"))

    if "psi_z" in prod and "z" in prod:
        fig, ax = plt.subplots(figsize=(4, 4))
        ax.plot(prod["psi_z"], prod["z"], color=SERIES_COLORS[0], linewidth=2)
        ax.set_xlabel("ψ [Sv]")
        ax.set_ylabel("z [m]")
        ax.set_title("AMOC ψ(z) at 26.5°N")
        paths.append(_save(fig, figdir, "amoc_psi_z_26n"))
    return paths


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
    attempt(fig_ke)
    attempt(fig_mld)
    attempt(fig_siconc)
    if grid is not None:
        attempt(fig_ice)          # area integrals need the grid metrics
        attempt(fig_ice_clim)
        attempt(fig_bias, "sst")
        attempt(fig_bias, "sss")
        attempt(fig_ssh)
        attempt(fig_wind_stress)
        attempt(fig_fluxes)
        attempt(fig_currents)
        attempt(fig_mld_seasonal)
        attempt(fig_amoc)
        attempt(fig_amoc_rapid)
        attempt(fig_straits)
        attempt(fig_drift)
        attempt(fig_profiles)
        attempt(fig_ts_drift_heatmap)
        attempt(fig_zonal_mean)
        attempt(fig_euc)
    return paths
