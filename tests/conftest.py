"""Test configuration.

This image preloads jax with a tunneled TPU backend (sitecustomize registers
the `axon` platform in every interpreter), so the conftest actively flips
the already-imported jax to a CPU platform with 8 faked devices — the
portable test backend of the reference's test strategy (SURVEY.md §4:
CPU-first unit tests; multi-device via
`xla_force_host_platform_device_count`). Set CLIMAOCEAN_TPU_TESTS=1 to run
the suite on the real device instead (single process only — the TPU tunnel
is single-session and concurrent use wedges it).

A persistent compilation cache keeps repeated runs fast on this 1-core host.
"""

import os

import jax

if not os.environ.get("CLIMAOCEAN_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as _jeb
        _jeb.clear_backends()
    except Exception:
        pass

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
