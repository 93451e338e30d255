"""Cookbook: WASP-39b-style end-to-end transmission retrieval.

The full workflow from a config file (the reference's wasp39b case
study shape: a hot Saturn with a strong 4.3-um CO2 feature):
atmosphere -> spectrum -> synthetic JWST-grade observations ->
retrieval -> posterior summary.  All inputs are generated locally
(synthetic H2O+CO2 opacity, bundled CIA); swap in real TLI/cross-
section files for science runs.

    python examples/wasp39b_transmission.py
"""
import os

import jax
jax.config.update('jax_platforms', 'cpu')

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np
import jax.numpy as jnp

from pyratbay_tpu.io import io as pio
from pyratbay_tpu.benchmark import _synthetic_cs_table, \
    _synthetic_cia_table
from pyratbay_tpu.model import Model
from pyratbay_tpu.observation import Observation
from pyratbay_tpu.retrieval import (
    RetrievalParams, build_forward, sample_demc,
)
from pyratbay_tpu.retrieval.batched import build_log_posterior_batched

FAST = os.environ.get('PBT_EXAMPLE_FAST') == '1'
workdir = os.path.abspath('wasp39b_demo')
os.makedirs(workdir, exist_ok=True)

# --- Atmosphere + opacity inputs (synthetic stand-ins) ---------------
nlayers = 41
press = np.logspace(-6, 2, nlayers)
species = ['H2', 'He', 'H', 'Na', 'K', 'H2O', 'CH4', 'CO', 'CO2']
vmr = np.tile(
    [8.4e-1, 1.5e-1, 1e-6, 3e-6, 5e-8, 5e-3, 1e-6, 1e-4, 5e-4],
    (nlayers, 1),
)
pio.write_atm(
    os.path.join(workdir, 'wasp39b.atm'), press,
    np.full(nlayers, 1100.0), species, vmr, punits='bar',
)
wn = np.arange(1.0 / (5.2e-4), 1.0 / (3.0e-4), 2.0)
_synthetic_cs_table(os.path.join(workdir, 'h2o.npz'), wn, press)
_synthetic_cia_table(os.path.join(workdir, 'cia.dat'))

cfg_text = f"""[pyrat]
runmode = spectrum
verb = -1
logfile = {workdir}/wasp39b.log
rt_path = transit
atmfile = {workdir}/wasp39b.atm
sampled_cross_sec = {workdir}/h2o.npz
continuum_cross_sec = {workdir}/cia.dat
wl_low = 3.0 um
wl_high = 5.2 um
wnstep = 2.0
rstar = 0.93 rsun
tstar = 5400.0
smaxis = 0.0486 au
mplanet = 0.28 mjup
rplanet = 1.27 rjup
refpressure = 0.1 bar
radmodel = hydro_m
maxdepth = 10.0
tmodel = isothermal
tpars = 1100.0
vmr_vars = log_H2O -2.3
bulk = H2 He
rayleigh = rayleigh_H2
clouds = deck -1.0
tlow = 300
thigh = 3000
retrieval_params =
    T_iso      1100.0  300.0 3000.0 50.0
    log_H2O      -2.3   -9.0 -1.0  0.5
    R_planet     1.27    0.5  4.5  0.03
    log_p_cl     -1.0   -6.0  2.0  0.5
"""
cfg_file = os.path.join(workdir, 'wasp39b.cfg')
with open(cfg_file, 'w') as f:
    f.write(cfg_text)

# --- Forward model + synthetic observations --------------------------
model = Model(cfg_file)


class _ObsCfg:
    data = None
    uncert = None
    filters = [
        f'tophat {wl0:.4f} 0.04'
        for wl0 in np.arange(3.1, 5.1, 0.1)
    ]
    obsfile = None
    dunits = None
    offset_inst = None
    uncert_scaling = None


obs = Observation(_ObsCfg, model.wn)
ret = RetrievalParams(model, obs)
forward = build_forward(model, obs, ret)
p_true = np.asarray(ret.params)
band_true = np.asarray(jax.jit(forward)(jnp.asarray(p_true))['bandflux'])
rng = np.random.default_rng(42)
sigma = 120e-6  # ~JWST PRISM-grade per-band precision
obs.data = band_true + rng.normal(0.0, sigma, band_true.shape)
obs.uncert = np.full(band_true.shape, sigma)

# --- Retrieval on the batched ensemble hot path ----------------------
log_post_b = build_log_posterior_batched(model, obs, ret)
nchains = 16 if FAST else 128
ngens = 20 if FAST else 800
results = sample_demc(
    None, p_true, nsamples=nchains * ngens, nchains=nchains,
    pstep=ret.pstep, pmin=ret.pmin, pmax=ret.pmax,
    log_post_batched=jax.jit(log_post_b),
    key=jax.random.PRNGKey(1), burnin=ngens // 2,
)
post = results['posterior']
med = np.median(post, axis=0)
lo, hi = np.percentile(post, [16, 84], axis=0)
print('retrieved (median +/- 1sigma):')
for name, m, l, h, t in zip(
        ret.pnames, med, lo, hi, p_true):
    print(f'  {name:12s} {m:8.3f}  (+{h - m:.3f}/-{m - l:.3f})'
          f'   truth {t:.3f}')

# --- Best-fit spectrum plot ------------------------------------------
best = np.asarray(results['bestp'])
spec_best = np.asarray(jax.jit(forward)(jnp.asarray(best))['spectrum'])
wl = 1e4 / np.asarray(model.wn)
fig, ax = plt.subplots(figsize=(7, 4))
ax.plot(wl, spec_best, lw=0.6, label='best-fit model')
ax.errorbar(np.asarray(obs.band_wl), obs.data, obs.uncert,
            fmt='o', ms=3, label='data')
ax.set_xlabel('wavelength (um)')
ax.set_ylabel('transit depth')
ax.legend()
fig.savefig('wasp39b_bestfit.png', dpi=100)
print('wrote wasp39b_bestfit.png')
