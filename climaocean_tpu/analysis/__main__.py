"""CLI: render the core offline figure suite from a run directory.

    python -m climaocean_tpu.analysis <outdir> [--prefix omip]
        [--config latlon|onedegree|halfdegree|sixthdegree|tenthdegree|orca]
        [--figdir DIR]

`--config` rebuilds the run's grid (needed for the grid-aware products:
AMOC, biases, straits, ice integrals); without it only grid-free figures
render. The reference equivalent is `visualize_omip.jl` driving the
figNN(caches, ...) suite (SURVEY.md §3.5).
"""

from __future__ import annotations

import argparse


def build_grid(config):
    if config is None:
        return None
    from ..configurations import ocean as oc
    from ..configurations import orca as orc
    from ..configurations import tripolar as tp

    builders = {
        "latlon": lambda: oc.latitude_longitude_ocean(initialize=False),
        "onedegree": lambda: tp.one_degree_tripolar_ocean(initialize=False),
        "halfdegree": lambda: tp.half_degree_tripolar_ocean(initialize=False),
        "sixthdegree": lambda: tp.sixth_degree_tripolar_ocean(initialize=False),
        "tenthdegree": lambda: tp.tenth_degree_tripolar_ocean(initialize=False),
        "orca": lambda: orc.orca_ocean(initialize=False),
    }
    model, _ = builders[config]()
    return model.grid


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m climaocean_tpu.analysis")
    ap.add_argument("outdir")
    ap.add_argument("--prefix", default="omip")
    ap.add_argument("--config", default=None,
                    choices=["latlon", "onedegree", "halfdegree",
                             "sixthdegree", "tenthdegree", "orca"])
    ap.add_argument("--figdir", default=None)
    args = ap.parse_args(argv)

    grid = build_grid(args.config)
    from .figures import render_all
    paths = render_all(args.outdir, grid=grid, prefix=args.prefix,
                       figdir=args.figdir)
    for p in paths:
        print(p)
    print(f"{len(paths)} figures rendered")


if __name__ == "__main__":
    main()
