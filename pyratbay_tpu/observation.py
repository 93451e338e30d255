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

        # High-resolution channel (reference observation.py:76-97):
        # per-point wavenumbers + data/uncert, modeled by convolving
        # the spectrum to inst_resolution (+ optional RV shift) and
        # interpolating at wn_hires.
        self.wn_hires = None
        self.data_hires = None
        self.uncert_hires = None
        self.inst_resolution = getattr(cfg, 'inst_resolution', None)
        obsfile_hires = getattr(cfg, 'obsfile_hires', None)
        if obsfile_hires is not None:
            if self.inst_resolution is None:
                raise ValueError(
                    'Undefined inst_resolution, required when modeling '
                    'high-resolution data (obsfile_hires)'
                )
            obs_h = pio.read_observations(_expand(obsfile_hires, root))
            wl_hires = []
            for entry in obs_h['filters']:
                fields = str(entry).split()
                path = _expand(fields[0], root)
                if os.path.isfile(path):
                    wl_hires.append(PassBand(path, wn=wn).wl0)
                else:
                    wl_hires.append(float(fields[0]))
            self.wn_hires = 1.0 / (np.asarray(wl_hires) * pc.um)
            if obs_h['data'] is not None and len(obs_h['data']):
                self.data_hires = np.asarray(obs_h['data'], float)
                self.uncert_hires = np.asarray(obs_h['uncert'], float)

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

        # Which bands each offset / error-scaling instrument touches
        # (by name-matching the filters; reference tools/data.py):
        self._offset_masks = []
        for inst in self.offset_inst:
            name = inst.replace('offset_', '').replace('_', ' ')
            mask = np.array([
                name in band.name.replace('_', ' ')
                for band in self.filters
            ])
            if not mask.any():
                raise ValueError(
                    f"Invalid instrumental offset parameter '{inst}'. "
                    f"There is no instrument matching the name '{name}'"
                )
            self._offset_masks.append(mask)

        self._err_masks = []
        self._err_modes = []
        for var in self.uncert_scaling:
            if var.startswith('err_scale_'):
                mode = 'scale'
                name = var[len('err_scale_'):]
            elif var.startswith('err_quad_'):
                mode = 'quadrature'
                name = var[len('err_quad_'):]
            else:
                raise ValueError(
                    f"Invalid error scaling parameter '{var}'. Valid "
                    "options begin with: ['err_scale_', 'err_quad_']"
                )
            name = name.replace('_', ' ')
            mask = np.array([
                name in band.name.replace('_', ' ')
                for band in self.filters
            ])
            if not mask.any():
                raise ValueError(
                    f"Invalid retrieval parameter '{var}'. There is "
                    f"no instrument matching the name '{name}'"
                )
            self._err_masks.append(mask)
            self._err_modes.append(mode)

        self.units_scale = pc.u(cfg.dunits) if cfg.dunits else 1.0

    def band_integrate(self, spectrum):
        """Band-integrated model values [nbands] (jit-safe matvec)."""
        return self._band_matrix @ spectrum

    def offset_data(self, offset_pars):
        """Data with per-instrument offsets added (jit-safe).

        Reference semantics: data[indices] += value * units
        (tools/data.py::offset_data).
        """
        data = jnp.asarray(self.data)
        for mask, par in zip(self._offset_masks, offset_pars):
            data = data + jnp.where(
                jnp.asarray(mask), par * self.units_scale, 0.0,
            )
        return data

    def scale_uncert(self, err_pars):
        """Uncertainties inflated by the error-scaling models (jit-safe).

        'err_scale_X': sigma *= 10**par; 'err_quad_X':
        sigma = sqrt(sigma^2 + (10**par * units)^2).
        """
        uncert = jnp.asarray(self.uncert)
        for mask, mode, par in zip(
                self._err_masks, self._err_modes, err_pars):
            mask = jnp.asarray(mask)
            if mode == 'scale':
                uncert = jnp.where(mask, uncert * 10.0**par, uncert)
            else:
                inflated = jnp.sqrt(
                    uncert**2 + (10.0**par * self.units_scale)**2
                )
                uncert = jnp.where(mask, inflated, uncert)
        return uncert


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
