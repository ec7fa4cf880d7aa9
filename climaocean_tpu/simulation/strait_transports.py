"""Offline strait volume transports.

TPU-native rebuild of `src/OMIPConfigurations/strait_transports.jl` (108
LoC; SURVEY.md §2a): volume transports (Sv) through Bering / Drake / ITF
sections computed from saved 3-D output, with hard-coded index sections per
grid configuration and `section_volume_flux` = Σ v·Δx·Δz (or u·Δy·Δz).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

SVERDRUP = 1e6


@dataclass(frozen=True)
class StraitSection:
    """An index-space section: ``orientation`` is "u" (zonal-normal: sum
    u·Δy·Δz over j_range at fixed i) or "v" (sum v·Δx·Δz over i_range at
    fixed j). Indices are interior (halo-free) and inclusive."""
    name: str
    orientation: str
    index: int                 # the fixed i (for "u") or j (for "v")
    span: tuple                # (start, stop) inclusive along the section


def strait_sections(grid):
    """Reference `strait_sections` (`strait_transports.jl:26-36`):
    hard-coded per-configuration sections, here derived from the grid's
    geographic coordinates (nearest row/column to the real straits)."""
    H = grid.H
    lat = np.asarray(grid.lat_cc)[H:H + grid.Ny, H:H + grid.Nx]
    lon = np.asarray(grid.lon_cc)[H:H + grid.Ny, H:H + grid.Nx]
    lonw = ((lon + 180.0) % 360.0) - 180.0

    def nearest_j(target_lat, lon_lo, lon_hi):
        j = np.abs(lat[:, 0] - target_lat).argmin()
        ii = np.where((lonw[j] >= lon_lo) & (lonw[j] <= lon_hi))[0]
        return int(j), (int(ii.min()), int(ii.max())) if ii.size else (0, 0)

    def nearest_i(target_lon, lat_lo, lat_hi):
        i = np.abs(lonw[0] - target_lon).argmin()
        jj = np.where((lat[:, i] >= lat_lo) & (lat[:, i] <= lat_hi))[0]
        return int(i), (int(jj.min()), int(jj.max())) if jj.size else (0, 0)

    j_ber, span_ber = nearest_j(66.0, -173.0, -166.0)
    i_dra, span_dra = nearest_i(-68.0, -68.0, -54.0)
    j_itf, span_itf = nearest_j(-5.0, 105.0, 135.0)
    return {
        "bering": StraitSection("bering", "v", j_ber, span_ber),
        "drake": StraitSection("drake", "u", i_dra, span_dra),
        "itf": StraitSection("itf", "v", j_itf, span_itf),
    }


def section_volume_flux(section, grid, u=None, v=None):
    """Volume transport through a section [Sv] from interior (halo-free)
    velocity arrays of shape (Nz, Ny, Nx)."""
    H = grid.H
    dz = np.asarray(grid.dz_c)[:, None]
    lo, hi = section.span
    if section.orientation == "v":
        dx = np.asarray(grid.dx_cf)[H + section.index, H + lo:H + hi + 1][None, :]
        wet = np.asarray(grid.wet_v)[:, H + section.index, H + lo:H + hi + 1]
        vel = np.asarray(v)[:, section.index, lo:hi + 1]
        return float((vel * wet * dx * dz).sum() / SVERDRUP)
    dy = np.asarray(grid.dy_fc)[H + lo:H + hi + 1, H + section.index][None, :]
    wet = np.asarray(grid.wet_u)[:, H + lo:H + hi + 1, H + section.index]
    vel = np.asarray(u)[:, lo:hi + 1, section.index]
    return float((vel * wet * dy * dz).sum() / SVERDRUP)


def strait_transports(grid, u, v):
    """All standard strait transports [Sv] from interior u, v arrays."""
    out = {}
    for name, sec in strait_sections(grid).items():
        out[name] = section_volume_flux(sec, grid, u=u, v=v)
    return out
