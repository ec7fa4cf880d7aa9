"""Visualize output from the 1/6° distributed coupled simulation.

Python port of the reference example
`examples/visualize_sixth_degree_simulation.jl`: loads the surface-ocean
and sea-ice output written by `sixth_degree_tripolar_ocean_sea_ice.py`
(which runs separately, sharded over the device mesh) and renders the
snapshot panels — surface temperature, surface speed, and effective ice
thickness h·ℵ — plus a frame-per-record image sequence standing in for
the reference's movie (zero-egress image backend; assemble with ffmpeg if
available).

Run:  env PYTHONPATH=/root/repo python examples/visualize_sixth_degree_simulation.py [outdir]
(defaults to output/sixth_degree_tripolar, the runner example's directory)
"""

import os
import sys

import numpy as np

from climaocean_tpu.simulation.analysis import read_parts

outdir = sys.argv[1] if len(sys.argv) > 1 else "output/sixth_degree_tripolar"
figdir = os.path.join(outdir, "figures")
os.makedirs(figdir, exist_ok=True)

# ## Load saved output (reference `FieldTimeSeries(..., backend=OnDisk())`)
surf = read_parts(outdir, "sixth_degree_surface")
times = surf["time"]
Nt = len(times)

# ## Land mask: surface fields are written masked; dry cells are exactly 0
# in sos (ocean salinity is nowhere 0), like the reference's bottom-height
# land test
land = surf["sos"][0] == 0.0

# surface speed from the staggered velocities (C-grid average to centers)
u, v = surf["uos"], surf["vos"]
uc = 0.5 * (u + np.roll(u, -1, axis=-1))
vc = 0.5 * (v + np.roll(v, -1, axis=-2))
speed = np.sqrt(uc ** 2 + vc ** 2)

h_eff = surf.get("sithick", np.zeros_like(surf["tos"])) * \
    surf.get("siconc", np.zeros_like(surf["tos"]))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

PANELS = (
    ("tos", "Surface Temperature (°C)", "magma", (-1, 32)),
    ("speed", "Surface Speed (m s⁻¹)", "GnBu", (0, 0.5)),
    ("h_eff", "Effective ice thickness (m)", "Blues", (0, 4)),
)
DATA = {"tos": surf["tos"], "speed": speed, "h_eff": h_eff}


def render(n, path):
    fig, axes = plt.subplots(len(PANELS), 1, figsize=(10, 12),
                             constrained_layout=True)
    fig.suptitle(f"1/6° distributed simulation after "
                 f"{(times[n] - times[0]) / 86400.0:.1f} days")
    for ax, (key, label, cmap, rng) in zip(axes, PANELS):
        a = np.where(land, np.nan, DATA[key][n])
        cm = plt.get_cmap(cmap).copy()
        cm.set_bad("lightgray")
        im = ax.imshow(a, origin="lower", cmap=cm, vmin=rng[0], vmax=rng[1],
                       aspect="auto", interpolation="nearest")
        ax.set_xticks([]), ax.set_yticks([])
        fig.colorbar(im, ax=ax, label=label, shrink=0.9)
    fig.savefig(path, dpi=110)
    plt.close(fig)


# ## Snapshot (last record)
render(Nt - 1, os.path.join(figdir, "sixth_degree_snapshot.png"))

# ## Movie frames (reference `CairoMakie.record`)
for n in range(Nt):
    render(n, os.path.join(figdir, f"sixth_degree_frame{n:04d}.png"))

print(f"wrote snapshot + {Nt} frames to {figdir}")
print("movie: ffmpeg -framerate 8 -i sixth_degree_frame%04d.png "
      "sixth_degree_simulation.mp4")
