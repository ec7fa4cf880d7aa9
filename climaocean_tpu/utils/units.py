"""Time units and pretty-printing (reference: `Oceananigans.Units`,
`prettytime` — used throughout, e.g. `src/ClimaOcean.jl:59-83`)."""

from __future__ import annotations

second = seconds = 1.0
minute = minutes = 60.0
hour = hours = 3600.0
day = days = 86400.0
year = years = 365.0 * day


def prettytime(t: float) -> str:
    t = float(t)
    if t < 1e-6:
        return f"{t * 1e9:.3g} ns"
    if t < 1e-3:
        return f"{t * 1e6:.3g} µs"
    if t < 1.0:
        return f"{t * 1e3:.3g} ms"
    if t < minute:
        return f"{t:.3g} s"
    if t < hour:
        return f"{t / minute:.3g} min"
    if t < day:
        return f"{t / hour:.3g} hr"
    if t < year:
        return f"{t / day:.5g} days"
    return f"{t / year:.5g} yr"
