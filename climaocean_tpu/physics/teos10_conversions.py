"""In-situ / practical → TEOS-10 conversions for dataset ingestion.

TPU-native rebuild of the reference's WOA → TEOS-10 conversion utilities
(reference `omip_simulation.jl:408-417`): WOA's ``t_an`` is in-situ
temperature (°C) and ``s_an`` is practical salinity (PSS-78), while the
model's TEOS-10 equation of state (`physics.eos`) expects Conservative
Temperature Θ and Absolute Salinity S_A. The reference converts with
SeawaterPolynomials host-side at setup; we do the same with numpy — these
run once at ingestion, never inside jit.

Algorithms:

- ``potential_temperature``: EOS-80 adiabatic lapse-rate polynomial of
  Bryden (1973) integrated with the 4th-order Runge-Kutta scheme of
  Fofonoff & Millard (1983, UNESCO Tech. Paper 44). Check value (UNESCO
  44, p. 45): θ(S=40, T=40 °C, p=10000 dbar, p_ref=0) = 36.89073 °C.
- ``ct_from_pt``: the TEOS-10 polynomial for Conservative Temperature
  from potential temperature (potential enthalpy / cp0; McDougall 2003,
  as implemented in GSW ``gsw_CT_from_pt``).
- ``sa_from_sp``: reference-composition scaling S_A = (35.16504/35)·S_P.
  The Absolute Salinity Anomaly Ratio atlas correction (≤ 0.027 g/kg in
  the open ocean; IOC et al. 2010 §A.5) is omitted — no SAAR atlas in
  this zero-egress environment; the resulting density error is below the
  climatology's own uncertainty.

The inverse pieces needed to round-trip model output for analysis
(pt from CT) are provided too.
"""

from __future__ import annotations

import numpy as np

SSO = 35.16504          # g/kg, standard-ocean Absolute Salinity
CP0 = 3991.86795711963  # J/(kg K), TEOS-10 fixed heat capacity


def sa_from_sp(SP):
    """Absolute Salinity [g/kg] from Practical Salinity (PSS-78),
    reference-composition scaling (no SAAR correction)."""
    return np.asarray(SP, np.float64) * (SSO / 35.0)


def _adiabatic_lapse_rate(S, T, p):
    """ATG [°C/dbar] — Bryden (1973) polynomial (EOS-80), S in PSS-78,
    T in °C (IPTS-68 scale assumed — the difference is far below WOA
    uncertainty), p in dbar."""
    ds = S - 35.0
    atg = (((-2.1687e-16 * T + 1.8676e-14) * T - 4.6206e-13) * p
           + ((2.7759e-12 * T - 1.1351e-10) * ds
              + ((-5.4481e-14 * T + 8.733e-12) * T - 6.7795e-10) * T
              + 1.8741e-8)) * p \
        + (-4.2393e-8 * T + 1.8932e-6) * ds \
        + ((6.6228e-10 * T - 6.836e-8) * T + 8.5258e-6) * T + 3.5803e-5
    return atg


def potential_temperature(S, T, p, p_ref=0.0):
    """Potential temperature θ [°C] of seawater (S PSS-78, in-situ T °C,
    pressure p dbar) referenced to ``p_ref`` — Fofonoff & Millard (1983)
    RK4 integration of the Bryden lapse rate."""
    S = np.asarray(S, np.float64)
    T = np.asarray(T, np.float64)
    p = np.asarray(p, np.float64)
    h = np.asarray(p_ref, np.float64) - p
    xk = h * _adiabatic_lapse_rate(S, T, p)
    T = T + 0.5 * xk
    q = xk
    pp = p + 0.5 * h
    xk = h * _adiabatic_lapse_rate(S, T, pp)
    T = T + 0.29289322 * (xk - q)
    q = 0.58578644 * xk + 0.121320344 * q
    xk = h * _adiabatic_lapse_rate(S, T, pp)
    T = T + 1.707106781 * (xk - q)
    q = 3.414213562 * xk - 4.121320344 * q
    pp = pp + 0.5 * h
    xk = h * _adiabatic_lapse_rate(S, T, pp)
    return T + (xk - 2.0 * q) / 6.0


def ct_from_pt(SA, pt):
    """Conservative Temperature Θ [°C] from potential temperature pt [°C]
    (referenced to 0 dbar) and Absolute Salinity SA [g/kg] — the TEOS-10
    potential-enthalpy polynomial (McDougall 2003; GSW ``gsw_CT_from_pt``)."""
    SA = np.maximum(np.asarray(SA, np.float64), 0.0)
    pt = np.asarray(pt, np.float64)
    sfac = 0.0248826675584615           # 1/(40*(SSO/35))
    x2 = sfac * SA
    x = np.sqrt(x2)
    y = pt * 0.025
    pot_enthalpy = (
        61.01362420681071 + y * (168776.46138048015 + y * (
            -2735.2785605119625 + y * (2574.2164453821433 + y * (
                -1536.6644434977543 + y * (545.7340497931629 + (
                    -50.91091728474331 - 18.30489878927802 * y) * y)))))
        + x2 * (268.5520265845071 + y * (-12019.028203559312 + y * (
            3734.858026725145 + y * (-2046.7671145057618 + y * (
                465.28655623826234 + (-0.6370820302376359
                                      - 10.650848542359153 * y) * y))))
            + x * (937.2099110620707 + y * (588.1802812170108 + y * (
                248.39476522971285 + (-3.871557904936333
                                      - 2.6268019854268356 * y) * y))
                + x * (-1687.914374187449 + x * (246.9598888781377 + x * (
                    123.59576582457964 - 48.5891069025409 * x))
                    + y * (936.3206544460336 + y * (-942.7827304544439
                        + y * (369.4389437509002 + (-33.83664947895248
                            - 9.987880382780322 * y) * y)))))))
    return pot_enthalpy / CP0


def pressure_from_depth(z):
    """Approximate hydrostatic pressure [dbar] from depth z [m, ≤ 0 in the
    ocean] — the reference's ``approx_pressure_dbar``
    (`omip_simulation.jl:420`): p ≈ −z (1 dbar per meter)."""
    z = np.asarray(z, np.float64)
    return np.maximum(0.0, -z)


def teos10_from_insitu(T_insitu, SP, z):
    """(Θ, S_A) from in-situ temperature [°C], practical salinity, and
    depth z [m ≤ 0] — the full WOA/EN4 ingestion conversion
    (`omip_simulation.jl:408-417`). Broadcasts over any shapes."""
    p = pressure_from_depth(z)
    SA = sa_from_sp(SP)
    pt = potential_temperature(SP, T_insitu, p, 0.0)
    return ct_from_pt(SA, pt), SA
