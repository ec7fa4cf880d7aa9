"""1-degree coupled+ice TPU diagnostic: tracks the Tmin cell (the
remaining rim-cooling bug, ROUND_NOTES gap 2) and max|u|. Run on the
default (TPU) env from the repo root:  python experiments/diag_one_degree_tmin.py
"""
import numpy as np, jax, jax.numpy as jnp, sys
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
sys.path.insert(0, '/root/repo')
from climaocean_tpu.configurations.tripolar import one_degree_tripolar_ocean
from climaocean_tpu.models.coupled import OceanSeaIceModel, make_coupled_step_fn
from climaocean_tpu.models.sea_ice import SeaIceModel
from climaocean_tpu.coupler.atmosphere import synthetic_prescribed_atmosphere

ocean, state_o = one_degree_tripolar_ocean(Nz=60)
grid = ocean.grid
atmos = synthetic_prescribed_atmosphere(grid, 0.0, 3*86400.0)
ice = SeaIceModel(grid=grid, dynamics=True, substeps=100)
model = OceanSeaIceModel(ocean=ocean, atmosphere=atmos, sea_ice=ice)
state = model.initial_state(); state['ocean'] = state_o
sst = np.asarray(state_o['T'][-1])
hi = np.where((sst < 0.5) & (np.asarray(grid.wet_c[-1]) > 0), 1.0, 0.0).astype(np.float32)
state['sea_ice']['thickness'] = jnp.asarray(hi)
state['sea_ice']['concentration'] = jnp.asarray((hi > 0) * 0.9, dtype=jnp.float32)
step = make_coupled_step_fn(model, donate=False)
lat2 = np.asarray(grid.lat_cc); lon2 = (np.asarray(grid.lon_cc)+180)%360-180
wetc = np.asarray(grid.wet_c)
H = grid.H
s = state
for i in range(48):
    s = step(s, i*1200.0, 1200.0)
    if i % 8 == 7:
        o = s['ocean']
        T = np.asarray(o['T'])
        Tm = np.where(wetc > 0, T, 1e9)
        idx = np.unravel_index(Tm.argmin(), Tm.shape)
        k, j, ii = idx
        col_wet = int(wetc[:, j, ii].sum())
        print(i+1, f"Tmin {Tm.min():.2f} at k={k}/{col_wet}wet lat {lat2[j,ii]:.1f} lon {lon2[j,ii]:.1f}",
              f"conc {float(s['sea_ice']['concentration'][j,ii]):.2f}",
              f"h {float(s['sea_ice']['thickness'][j,ii]):.2f}",
              f"umax {float(jnp.abs(o['u']).max()):.2f}", flush=True)
