"""Vertical coordinates.

Reproduces the reference's vertical-coordinate semantics:

* ``ExponentialDiscretization(Nz, -depth, 0; scale)`` — exponentially refined
  spacing toward the surface (reference behavior defined by
  `/root/reference/src/OceanConfigurations/OceanConfigurations.jl:58-60` and
  the top-spacing relation in
  `/root/reference/src/OMIPConfigurations/omip_simulation.jl:529-549`:
  ``Δz_top = depth * expm1(Δz_uniform / h) / expm1(depth / h)``).
* ``find_exponential_scale`` — bisection for the scale ``h`` that produces a
  target top spacing (same tolerance/bracket semantics as the reference).

Faces are returned bottom-up: ``z[0] = -depth``, ``z[Nz] = 0``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

DEFAULT_EXPONENTIAL_SCALE = 1300.0  # reference: omip_simulation.jl:551


def find_exponential_scale(Nz: int, depth: float, dz_top: float,
                           tolerance: float = 1e-7, maxiter: int = 200) -> float:
    """Bisect for the e-folding scale giving top spacing ``dz_top``."""
    dz_uniform = depth / Nz
    if not (0.0 < dz_top < dz_uniform):
        raise ValueError(f"dz_top={dz_top} must be in (0, depth/Nz={dz_uniform})")

    def dz_at_scale(h):
        return depth * math.expm1(dz_uniform / h) / math.expm1(depth / h)

    lo, hi = dz_uniform / 1000.0, 1000.0 * depth
    for _ in range(maxiter):
        h = 0.5 * (lo + hi)
        dz = dz_at_scale(h)
        if abs(dz - dz_top) <= tolerance * dz_top:
            return h
        if dz < dz_top:
            lo = h
        else:
            hi = h
    raise RuntimeError(f"exponential-scale bisection did not converge for dz_top={dz_top}")


def exponential_z_faces(Nz: int, depth: float, scale: float | None = None,
                        dz_top: float | None = None) -> np.ndarray:
    """Exponentially spaced faces on ``[-depth, 0]``, finest at the surface.

    Depth below the surface of face m (m = 0 at the surface) is
    ``d_m = depth * expm1(m * Δzᵁ / h) / expm1(depth / h)``; returned
    bottom-up (index k = Nz - m).
    """
    if scale is None:
        scale = DEFAULT_EXPONENTIAL_SCALE if dz_top is None else \
            find_exponential_scale(Nz, depth, dz_top)
    dz_uniform = depth / Nz
    m = np.arange(Nz + 1)
    d = depth * np.expm1(m * dz_uniform / scale) / np.expm1(depth / scale)
    z = -d[::-1]
    z[0], z[-1] = -depth, 0.0
    return z


def uniform_z_faces(Nz: int, z_bottom: float, z_top: float = 0.0) -> np.ndarray:
    return np.linspace(z_bottom, z_top, Nz + 1)


@dataclass(frozen=True)
class ExponentialDiscretization:
    """Marker object mirroring the reference constructor signature.

    ``mutable=True`` requests the z★ moving vertical coordinate (threaded
    through the free-surface solver; see models.free_surface).
    """
    Nz: int
    z_bottom: float
    z_top: float = 0.0
    scale: float | None = None
    dz_top: float | None = None
    mutable: bool = False

    def faces(self) -> np.ndarray:
        depth = self.z_top - self.z_bottom
        return self.z_top + exponential_z_faces(self.Nz, depth, self.scale, self.dz_top) \
            - 0.0


@dataclass(frozen=True)
class UniformDiscretization:
    Nz: int
    z_bottom: float
    z_top: float = 0.0
    mutable: bool = False

    def faces(self) -> np.ndarray:
        return uniform_z_faces(self.Nz, self.z_bottom, self.z_top)


def resolve_z_faces(z, Nz: int | None = None) -> np.ndarray:
    """Accept a faces array, a (z_bottom, z_top) tuple (uniform), or a
    discretization object, and return a float64 numpy faces array."""
    if isinstance(z, (ExponentialDiscretization, UniformDiscretization)):
        return np.asarray(z.faces(), dtype=np.float64)
    if isinstance(z, tuple) and len(z) == 2:
        if Nz is None:
            raise ValueError("Nz required when z is an extent tuple")
        return uniform_z_faces(Nz, z[0], z[1])
    z = np.asarray(z, dtype=np.float64)
    if Nz is not None and z.shape != (Nz + 1,):
        raise ValueError(f"z faces must have shape ({Nz + 1},), got {z.shape}")
    return z
