"""Construct-and-step smoke test for every omip vertical closure (the
reference's CI pattern: build the full coupled configuration and take real
coupled steps — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import pytest

from climaocean_tpu.configurations.omip import omip_simulation


@pytest.mark.parametrize("closure",
                         ["catke", "simple", "rbvd", "nori", "kpp",
                          "nemo_tke"])
def test_omip_steps_with_closure(closure):
    sim = omip_simulation("latlon", dt=1800.0, stop_iteration=2,
                          vertical_closure=closure, with_sea_ice=False,
                          diagnostics=False, salinity_restoring=False,
                          progress_interval=100,
                          resolution=15.0, Nz=6, depth=3000.0)
    sim.run()
    leaves = jax.tree_util.tree_leaves(sim.state)
    assert not any(bool(jnp.isnan(l).any()) for l in leaves), closure
