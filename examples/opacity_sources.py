"""Cookbook: individual opacity sources with bundled data.

Mirrors the reference's docs/cookbooks/opacity_{alkali,cia,rayleigh,
h_ion}.py demos (same physics, this package's API).  Runs on CPU with
zero downloaded files -- the CIA table ships with the package.

    python examples/opacity_sources.py
"""
import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np

from pyratbay_tpu import constants as pc, data
from pyratbay_tpu.opacity import CIA, HydrogenIon, Rayleigh, SodiumVdW
from pyratbay_tpu.ops import wavenumber_grid
from pyratbay_tpu.atmosphere import (
    pressure, uniform_vmr, ideal_gas_density,
)

grid = wavenumber_grid(wl_low=0.4 * pc.um, wl_high=5.0 * pc.um,
                       resolution=5000.0)
wn = np.asarray(grid.wn)
wl = 1e4 / wn

# A toy isothermal atmosphere: H2 / He / H / Na / e- / H2O
press = pressure('1e-6 bar', '1e2 bar', 31)
temp = np.full(31, 1800.0)
vmr = np.asarray(uniform_vmr([0.85, 0.145, 4e-3, 3e-6, 1e-6, 4e-4], 31))
dens = np.asarray(ideal_gas_density(vmr, press, temp))

# --- Alkali (Na doublet, Burrows profile) -----------------------------
na = SodiumVdW(press, wn)
ec_na = np.asarray(na.extinction(temp, dens[:, 3]))
print(f'Na D extinction @ 0.589 um, 1 bar layer: '
      f'{ec_na[22, np.argmin(np.abs(wl - 0.589))]:.3e} cm-1')

# --- CIA (bundled Borysow H2-H2 table) --------------------------------
cia = CIA(data.cia_file('H2H2'), wn=wn)
ec_cia = np.asarray(cia.extinction(temp, dens[:, [0, 0]]))
print(f'H2-H2 CIA extinction @ 2.2 um, 1 bar layer: '
      f'{ec_cia[22, np.argmin(np.abs(wl - 2.2))]:.3e} cm-1')

# --- Rayleigh (Kurucz H2) ---------------------------------------------
ray = Rayleigh('H2', wn)
ec_ray = np.asarray(ray.extinction(dens[:, 0]))
print(f'H2 Rayleigh extinction @ 0.4 um, 1 bar layer: '
      f'{ec_ray[22, np.argmin(np.abs(wl - 0.4))]:.3e} cm-1')

# --- H- bound-free + free-free (John 1988) ----------------------------
h_ion = HydrogenIon(wn)
ec_h = np.asarray(h_ion.extinction(temp, dens[:, 2], dens[:, 4]))
print(f'H- extinction @ 1.6 um (bf edge), 1 bar layer: '
      f'{ec_h[22, np.argmin(np.abs(wl - 1.6))]:.3e} cm-1')

assert np.all(np.isfinite(ec_na + ec_cia + ec_ray + ec_h))
print('all sources finite: OK')
