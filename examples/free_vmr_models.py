"""Cookbook: parametric composition (VMR) models.

The `vmr_vars` config block's model families, driven through the
Python API: free (log_X), scaled (scale_X), slanted (slant_X), and
thermochemical-equilibrium abundances at several metallicities, plus
bulk-species balancing.  Mirrors the reference's VMR cookbook
capability.

    python examples/free_vmr_models.py
"""
import jax
jax.config.update('jax_platforms', 'cpu')

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

from pyratbay_tpu.atmosphere import chem, pressure, vmr as vmr_models

press = np.asarray(pressure('1e-8 bar', '1e2 bar', 51))
log_press = np.log10(press)
species = ['H2', 'He', 'H2O', 'CH4', 'CO', 'CO2']
base = np.tile([0.85, 0.149, 4e-4, 1e-4, 3e-4, 1e-7], (51, 1))

# --- Free abundance (log_H2O): constant-with-height log VMR ----------
vmr_free = np.asarray(vmr_models.iso_vmr(-3.0, 51))
print(f'log_H2O = -3: VMR(H2O) = {vmr_free[0]:.1e}')

# --- Scaled abundance (scale_CO): multiply the input profile ---------
vmr_scaled = np.asarray(vmr_models.scale_vmr(base[:, 4], 0.5))
print(f'scale_CO = +0.5 dex: VMR(CO) = {vmr_scaled[0]:.1e}')

# --- Slanted abundance (slant_CH4): log-linear in log-pressure -------
vmr_slant = np.asarray(vmr_models.slant_vmr(
    log_press, [-1.0, -4.0, 0.0, -12.0, -2.0],
))

# --- Equilibrium chemistry at 3 metallicities ------------------------
temp = np.full(51, 1200.0)
fig, axes = plt.subplots(1, 2, figsize=(9, 4), sharey=True)
iwat = species.index('H2O')
for mh in (-1.0, 0.0, 1.0):
    net = chem.Network(press, temp, species, metallicity=mh)
    q = np.asarray(net.thermochemical_equilibrium())
    axes[0].plot(q[:, iwat], press, label=f'[M/H] = {mh:+.0f}')
axes[0].set_xscale('log')
axes[0].set_yscale('log')
axes[0].invert_yaxis()
axes[0].set_xlabel('H2O VMR (equilibrium)')
axes[0].set_ylabel('pressure (bar)')
axes[0].legend()

axes[1].plot(vmr_free, press, label='log_H2O = -3')
axes[1].plot(vmr_scaled, press, label='scale_CO = +0.5')
axes[1].plot(vmr_slant, press, label='slant_CH4')
axes[1].set_xscale('log')
axes[1].set_yscale('log')
axes[1].set_xlabel('VMR (parametric models)')
axes[1].legend()
fig.savefig('vmr_models_demo.png', dpi=100)
print('wrote vmr_models_demo.png')

# --- Bulk balancing: H2/He absorb the trace sum ----------------------
q = base.copy()
q[:, 2] = 1e-2                            # enhanced H2O
ibulk = np.array([0, 1])
bratio, invsrat = vmr_models.bulk_ratio(q, ibulk)
balanced = np.asarray(vmr_models.balance_bulk(q, ibulk, bratio, invsrat))
print(f'after balance: sum = {balanced.sum(axis=1)[0]:.6f}, '
      f'H2 = {balanced[0, 0]:.4f}')
