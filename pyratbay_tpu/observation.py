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
        if self.data is not None and self.uncert is not None \
                and len(self.data) != len(self.uncert):
            # Reference message (pyrat/observation.py:52-58):
            raise ValueError(
                f'Number of data uncertainty values ({len(self.uncert)}) '
                'does not match the number of data points '
                f'({len(self.data)})'
            )

        if filters is not None:
            from .data import filter_response, list_filters
            for entry in filters:
                if isinstance(entry, str) and os.path.isfile(
                        _expand(entry, root)):
                    band = PassBand(_expand(entry, root), wn=wn)
                elif isinstance(entry, str) \
                        and entry.lower() in list_filters():
                    # Bundled instrument library (data/filters.npz):
                    wl_f, resp = filter_response(entry)
                    band = PassBand.from_arrays(
                        wl_f, resp, entry.lower(), wn=wn,
                    )
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

        # Instrumental offsets / error-scaling parameter names, one
        # "name [default_value]" entry per line (reference
        # tools/parser.py:1027-1059):
        self.offset_pars = []
        self.uncert_pars = []
        if cfg.offset_inst is not None:
            for entry in _param_lines(cfg.offset_inst):
                fields = entry.split()
                self.offset_inst.append(fields[0])
                self.offset_pars.append(
                    float(fields[1]) if len(fields) > 1 else 0.0
                )
        if cfg.uncert_scaling is not None:
            for entry in _param_lines(cfg.uncert_scaling):
                fields = entry.split()
                self.uncert_scaling.append(fields[0])
                self.uncert_pars.append(
                    float(fields[1]) if len(fields) > 1 else 0.0
                )

        if self.data is not None and self.nbands:
            if len(self.data) != self.nbands:
                # Reference message (pyrat/observation.py:60-66):
                raise ValueError(
                    f'Number of filter bands ({self.nbands}) does not '
                    f'match the number of data points ({len(self.data)})'
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

    def __str__(self):
        from .tools import Formatted_Write
        fw = Formatted_Write()
        fw.write('Observed data:')
        ndata = 0 if self.data is None else len(self.data)
        fw.write('Number of data points (ndata): {}', ndata)
        if self.data is not None:
            fw.write('Data (data):\n  {}', self.data, fmt={
                'float': '{:.6e}'.format}, edge=4)
        if self.uncert is not None:
            fw.write('Uncertainties (uncert):\n  {}', self.uncert, fmt={
                'float': '{:.6e}'.format}, edge=4)
        fw.write('Number of filter bands (nbands): {}', self.nbands)
        for band in self.filters:
            fw.write(
                '  {:24s} wl0 = {:.4f} um', band.name, band.wl0,
            )
        if self.offset_inst:
            fw.write('Instrumental offsets (offset_inst): {}',
                     self.offset_inst)
        if self.uncert_scaling:
            fw.write('Uncertainty scaling (uncert_scaling): {}',
                     self.uncert_scaling)
        if self.wn_hires is not None:
            fw.write(
                'High-resolution channel: {} points, '
                'inst_resolution = {:.1f}',
                len(self.wn_hires), self.inst_resolution,
            )
        return fw.text

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


def _param_lines(value):
    """Non-empty lines of a "name [value]" config block; a single-line
    value with multiple bare names (legacy form) splits on whitespace."""
    lines = [line.strip() for line in str(value).splitlines()]
    lines = [line for line in lines if line]
    if len(lines) == 1 and len(lines[0].split()) > 1:
        fields = lines[0].split()
        # "name value" vs "name1 name2 ...": a trailing number means
        # one entry with a default value:
        try:
            float(fields[1])
            return [lines[0]]
        except ValueError:
            return fields
    return lines


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
