"""Cookbook: instrument passbands and band-integrated spectra.

Mirrors the reference's docs/cookbooks/passbands.py capability:
inline tophat filters, the bundled filter library, band integration of
a model spectrum, and plotting.

    python examples/passbands.py
"""
import jax
jax.config.update('jax_platforms', 'cpu')

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

from pyratbay_tpu import constants as pc, data
from pyratbay_tpu.ops import wavenumber_grid
from pyratbay_tpu.spectrum.passbands import PassBand, Tophat

grid = wavenumber_grid(wl_low=1.0 * pc.um, wl_high=2.0 * pc.um,
                       resolution=5000.0)
wn = np.asarray(grid.wn)
wl = 1e4 / wn

# --- Inline tophat filters (the `filters = tophat wl0 width` config
# syntax builds these):
bands = [Tophat(wl0, 0.04, wn=wn)
         for wl0 in np.arange(1.10, 1.95, 0.08)]
print(f'{len(bands)} tophat bands, first: {bands[0]}')

# --- Bundled filter library (real instrument response curves):
names = data.list_filters()
print(f'filter library: {len(names)} passbands, e.g. {sorted(names)[:3]}')
fwl, fresp = data.filter_response(sorted(names)[0])
wl0 = float(np.sum(fwl * fresp) / np.sum(fresp))
print(f'library band {sorted(names)[0]}: wl0 = {wl0:.4f} um')

# --- Band-integrate a toy transmission spectrum (the same
# [nbands, nwave] weight matrix the jitted likelihood uses):
from pyratbay_tpu.spectrum.passbands import band_matrix

spectrum = 0.0065 + 3e-4 * np.exp(-0.5 * ((wl - 1.4) / 0.1)**2)
bmat = band_matrix(bands, len(wn))
bandflux = bmat @ spectrum
band_wl = [b.wl0 for b in bands]

fig, ax = plt.subplots(figsize=(7, 4))
ax.plot(wl, spectrum, lw=0.8, label='model')
ax.plot(band_wl, bandflux, 'o', label='band-integrated')
for b in bands:
    ax.plot(1e4 / np.asarray(b.wn), 0.0062 + 1e-4 * b.response
            / b.response.max(), 'k-', lw=0.5)
ax.set_xlabel('wavelength (um)')
ax.set_ylabel('transit depth')
ax.legend()
fig.savefig('passbands_demo.png', dpi=100)
print('wrote passbands_demo.png')
