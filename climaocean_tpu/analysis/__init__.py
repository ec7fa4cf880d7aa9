"""Offline analysis: loader DAG + figure suite.

`python -m climaocean_tpu.analysis <outdir>` renders the core figure set
from a finished run's output directory (the TPU-native counterpart of the
reference's 26-figure offline suite, `experiments/OMIPSimulations/scripts/
visualize/visualize_omip.jl`; SURVEY.md §3.5).

The data layer (loader DAG, disk cache, derived physics) lives in
`simulation.analysis` and is re-exported here.
"""

from ..simulation.analysis import (CaseCache, atlantic_ocean_basin,
                                   read_parts)

__all__ = ["CaseCache", "atlantic_ocean_basin", "read_parts",
           "render_figures"]


def render_figures(outdir, grid=None, prefix="omip", figdir=None):
    from .figures import render_all
    return render_all(outdir, grid=grid, prefix=prefix, figdir=figdir)
