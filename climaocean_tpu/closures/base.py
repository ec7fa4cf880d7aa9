"""Closure protocol.

TPU-native mirror of Oceananigans' closure extension points
(`build_closure_fields` / `compute_closure_fields!` /
`step_closure_prognostics!` / implicit `diffusive_flux_z`; reference:
`/root/reference/src/OMIPConfigurations/KPP/KPP.jl:29-35`,
`NEMOTKE/NEMOTKE.jl:23-27`, SURVEY.md §2b "Closure extension protocol").

A closure is a pytree-of-parameters dataclass with three functional hooks:

* ``initial_prognostics(grid) -> dict``  — extra prognostic fields (e.g.
  CATKE's TKE ``e``). Empty for diagnostic closures.
* ``diffusivities(grid, fields, aux) -> (nu_w, kappa_w)`` — vertical eddy
  viscosity/diffusivity at w-faces ``(Nz+1, Nyp, Nxp)``, consumed by the
  shared implicit tridiagonal solve (`VerticallyImplicitTimeDiscretization`).
* ``horizontal_tendencies(grid, fields, aux) -> dict`` — explicit tendency
  contributions (horizontal Laplacian/biharmonic mixing, GM/Redi, nonlocal
  fluxes).
* ``step_prognostics(grid, fields, aux, dt) -> dict`` — advance closure
  prognostics (TKE equations).

``aux`` is a NamedTuple of shared diagnostics (buoyancy, N², shear², surface
fluxes) computed once per stage by the model — the analogue of the
reference's cached closure fields.

Closure *tuples* compose by summing diffusivities and tendencies, matching
the reference's closure-tuple semantics (`omip_closure`,
`omip_simulation.jl:442-496`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ClosureAux(NamedTuple):
    """Shared per-stage diagnostics handed to closures."""
    b: jnp.ndarray          # buoyancy at centers (Nz, Nyp, Nxp)
    N2: jnp.ndarray         # buoyancy frequency² at w-faces (Nz+1, ...)
    S2: jnp.ndarray         # vertical shear² at w-faces (Nz+1, ...)
    u_star: jnp.ndarray     # surface friction velocity (Nyp, Nxp)
    Qb: jnp.ndarray         # surface buoyancy flux (m²/s³), + = buoyancy gain
                            # (stabilizing); cooling/evaporation make it < 0
    fluxes: object          # the SurfaceFluxes named tuple (into-ocean signs)
    alpha: jnp.ndarray      # surface thermal expansion (Nyp, Nxp)
    beta: jnp.ndarray       # surface haline contraction (Nyp, Nxp)
    # absolute model time [s] at the START of the step (stages reuse it —
    # restoring/forcing targets vary on monthly scales, a Δt is immaterial).
    # Enables time-dependent forcings (`DatasetRestoring` toward a monthly
    # series, reference `DatasetRestoring(metadata; rate,
    # time_indices_in_memory)`).
    t: object = 0.0


def sum_diffusivities(closures, grid, fields, aux):
    nu = kap = None
    for cl in closures:
        out = cl.diffusivities(grid, fields, aux)
        if out is None:
            continue
        nu_i, kap_i = out
        nu = nu_i if nu is None else nu + nu_i
        kap = kap_i if kap is None else kap + kap_i
    if nu is None:
        z = grid.new_field(grid.Nz + 1)
        return z, z
    return nu, kap


def sum_horizontal_tendencies(closures, grid, fields, aux):
    total = {}
    for cl in closures:
        h = getattr(cl, "horizontal_tendencies", None)
        if h is None:
            continue
        out = h(grid, fields, aux)
        for k, v in out.items():
            total[k] = total.get(k, 0.0) + v
    return total
