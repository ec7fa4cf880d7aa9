"""One simulated year, quantitatively scored (VERDICT r3 item 6).

The slow end-to-end *physics* gate: a coarse (3°) coupled OMIP year run
through the full protocol and scored by `experiments.omip.validate_year`
against generous climatological bands. At 3° with synthetic forcing the
observational ice/AMOC bands don't transfer, so this asserts the robust
invariants: finiteness, a real NH ice seasonal cycle, positive AMOC,
bounded SST drift, near-zero zosga drift. The production-fidelity run
(1°, real bands) is `python -m experiments.omip.validate_year` on the
TPU; its scorecard is recorded in ROUND_NOTES.

Marked slow: ~10–20 min on the 1-core CPU host. Run with
CLIMAOCEAN_SLOW_TESTS=1.
"""

import json
import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.environ.get("CLIMAOCEAN_SLOW_TESTS"),
                       reason="slow year-long run; set CLIMAOCEAN_SLOW_TESTS=1"),
]


def test_three_degree_coupled_year_scorecard(tmp_path):
    from experiments.omip.validate_year import run_year, score

    out = str(tmp_path / "year3deg")
    sim = run_year(config="latlon", days=365.0, dt=3600.0, out=out,
                   resolution=3.0, Nz=10, depth=4000.0)
    metrics, fails = score(
        out, sim.model.ocean.grid,
        # coarse-grid bands: sign/cycle/boundedness, not NSIDC/RAPID
        bands=dict(ice_max=(0.5, 40.0), ice_min=(0.0, 25.0), ice_cycle=1.1,
                   amoc=(0.5, 60.0), sst_drift=4.0, zosga_drift=0.02))
    print(json.dumps({"metrics": metrics, "failures": fails}, indent=2))
    assert metrics["finite"]
    assert not fails, fails


def test_score_only_on_synthetic_output(tmp_path):
    """Fast check (NOT slow-gated... but module is): the scorer reads a
    staged output directory and computes every metric."""
    from experiments.omip.validate_year import run_year, score

    out = str(tmp_path / "score30d")
    sim = run_year(config="latlon", days=30.0, dt=3600.0, out=out,
                   resolution=6.0, Nz=6, depth=3000.0)
    metrics, fails = score(out, sim.model.ocean.grid,
                           bands=dict(ice_max=(-1.0, 1e9), ice_min=(-1, 1e9),
                                      ice_cycle=0.0, amoc=(-1e9, 1e9),
                                      sst_drift=10.0, zosga_drift=1.0))
    assert metrics["finite"]
    assert metrics["amoc_26n_mean_sv"] is not None
    assert not fails, fails
