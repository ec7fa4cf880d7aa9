"""Floating-point policy for the framework.

The reference (ClimaOcean.jl) defaults to Float64 on CPU and is routinely run
in Float32 on GPU (`Oceananigans.defaults.FloatType`). On TPU the native
fast path is float32 (VPU) / bfloat16 (MXU); we default to float32 everywhere
and allow float64 (via jax_enable_x64) for validation runs.
"""

from __future__ import annotations

import jax.numpy as jnp

_DEFAULT = jnp.float32


def default_float():
    return _DEFAULT


def set_default_float(dtype) -> None:
    global _DEFAULT
    _DEFAULT = jnp.dtype(dtype)
