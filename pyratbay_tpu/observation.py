"""Observed data: band-integrated depths/fluxes and their passbands.

Band integration is a dense [nbands, nwave] weight matrix times the
spectrum (one matvec on the MXU) instead of the reference's per-band
trapezoid loops (pyratbay/pyrat/observation.py).
"""
import os

import numpy as np
import jax.numpy as jnp

from . import constants as pc
from .io import io as pio
from .spectrum.passbands import PassBand, Tophat, band_matrix

__all__ = ['Observation']


class Observation:
    """Data points, uncertainties, and filter passbands."""

    def __init__(self, cfg, wn, root=None):
        self.data = None
        self.uncert = None
        self.filters = []
        self.nbands = 0
        self.band_wl = None
        self._band_matrix = None
        self.offset_inst = []
        self.uncert_scaling = []

        data = cfg.data
        uncert = cfg.uncert
        filters = cfg.filters

        if cfg.obsfile is not None:
            obs = pio.read_observations(cfg.obsfile)
            data = obs['data']
            uncert = obs['uncert']
            filters = obs['filters']

        if cfg.dunits is not None and cfg.data is not None:
            scale = pc.u(cfg.dunits)
            data = np.asarray(data, float) * scale
            uncert = np.asarray(uncert, float) * scale

        if data is not None:
            self.data = np.asarray(data, float)
        if uncert is not None:
            self.uncert = np.asarray(uncert, float)

        if filters is not None:
            for entry in filters:
                if isinstance(entry, str) and os.path.isfile(
                        _expand(entry, root)):
                    band = PassBand(_expand(entry, root), wn=wn)
                else:
                    # 'tophat wl0 half_width' style entries:
                    fields = str(entry).split()
                    if len(fields) >= 2 and _is_float(fields[-2]):
                        band = Tophat(
                            float(fields[-2]), float(fields[-1]), wn=wn,
                        )
                    else:
                        raise FileNotFoundError(
                            f"Filter file '{entry}' does not exist"
                        )
                self.filters.append(band)
            self.nbands = len(self.filters)
            self.band_wl = np.array([band.wl0 for band in self.filters])
            self._band_matrix = band_matrix(self.filters, len(wn))

        # Instrumental offsets / error-scaling parameter names:
        if cfg.offset_inst is not None:
            self.offset_inst = cfg.offset_inst.split()
        if cfg.uncert_scaling is not None:
            self.uncert_scaling = cfg.uncert_scaling.split()

        if self.data is not None and self.nbands:
            if len(self.data) != self.nbands:
                raise ValueError(
                    f'Number of data points ({len(self.data)}) does not '
                    f'match the number of filter bands ({self.nbands})'
                )

        # Which bands each offset instrument touches (by name matching
        # the filter-file names, reference tools/data.py):
        self._offset_masks = []
        for inst in self.offset_inst:
            name = inst.replace('offset_', '')
            mask = np.array([
                name in band.name for band in self.filters
            ])
            self._offset_masks.append(mask)

    def band_integrate(self, spectrum):
        """Band-integrated model values [nbands] (jit-safe matvec)."""
        return self._band_matrix @ spectrum

    def apply_offsets(self, bandflux, offset_pars, dunits_scale=1.0):
        """Subtract per-instrument offsets from the model band fluxes."""
        if not self.offset_inst:
            return bandflux
        for mask, par in zip(self._offset_masks, offset_pars):
            bandflux = bandflux - jnp.where(
                jnp.asarray(mask), par * dunits_scale, 0.0,
            )
        return bandflux


def _expand(path, root):
    if root is not None:
        path = path.replace('{ROOT}', root)
    return path


def _is_float(val):
    try:
        float(val)
        return True
    except ValueError:
        return False
