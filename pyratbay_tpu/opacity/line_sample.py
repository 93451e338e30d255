"""Line-sampled (tabulated) cross-section opacity.

Loads npz cross-section tables [nspec, ntemp, nlayers, nwave], optionally
re-interpolated in pressure/temperature at load time, and provides the
runtime temperature interpolation as one fused gather + einsum: the TPU
replacement for the reference's C interp_ec triple loop
(src_c/_extcoeff.c:367-472, pyratbay/opacity/line_sampling.py).
"""
import numpy as np
import scipy.interpolate as sip
import jax.numpy as jnp

from ..io import io as pio

__all__ = ['LineSample', 'interpolate_opacity', 'wn_mask_tol']


def wn_mask_tol(wn, wn_min, wn_max, tol=1.0e-8):
    """Range mask with edge tolerance (reference spec_tools.py:778-814)."""
    mask = (wn >= wn_min) & (wn <= wn_max)
    if np.sum(mask) < 2:
        min_dwn = max_dwn = 0.0
    else:
        min_dwn = np.abs(np.ediff1d(wn[mask][0:2]))
        max_dwn = np.abs(np.ediff1d(wn[mask][-2:]))
    return (wn >= wn_min - min_dwn * tol) & (wn <= wn_max + max_dwn * tol)


def interpolate_opacity(
        cs_file, temperature=None, pressure=None, wn_mask=None, wl_thinning=1,
    ):
    """Load a cross-section table, re-gridded in log-opacity space.

    Pressure/temperature resampling uses linear interpolation of
    log(cs) with edge-value extrapolation (reference
    tools/tools.py:1026-1109); no-op when grids already match to 1%.
    """
    _, temp, press, wn = pio.read_opacity(cs_file, extract='arrays')
    logp_table = np.log(press)
    if wn_mask is None:
        wn_mask = np.ones(len(wn), bool)

    resample_p = (
        pressure is not None
        and (
            len(press) != len(pressure)
            or np.any(np.abs(1.0 - press / pressure) > 0.01)
        )
    )
    resample_t = (
        temperature is not None
        and (
            len(temp) != len(temperature)
            or np.any(np.abs(1.0 - temp / temperature) > 0.01)
        )
    )

    cross_section = pio.read_opacity(cs_file, extract='opacity')[:, :, wn_mask]
    cross_section = cross_section[:, :, ::wl_thinning]
    if not resample_p and not resample_t:
        return cross_section

    log_cs = np.log(cross_section)
    log_cs[~np.isfinite(log_cs)] = -230.0
    if resample_p:
        logp = np.log(pressure)
        interp = sip.interp1d(
            logp_table, log_cs, axis=1, kind='slinear',
            bounds_error=False, fill_value=(log_cs[:, 0], log_cs[:, -1]),
        )
        log_cs = interp(logp)
    if resample_t:
        interp = sip.interp1d(
            temp, log_cs, axis=0, kind='slinear',
            bounds_error=False, fill_value=(log_cs[0], log_cs[-1]),
        )
        log_cs = interp(temperature)
    return np.exp(log_cs)


class LineSample:
    """Tabulated cross sections with runtime temperature interpolation."""

    name = 'line sampling'

    def __init__(
            self, cs_files, pressure=None, temperature=None,
            min_wn=0.0, max_wn=np.inf, wl_thinning=1,
        ):
        """
        Parameters
        ----------
        cs_files: str or list of str -- npz cross-section tables.
        pressure: 1D array (bar) -- target pressure grid (else tabulated).
        temperature: 1D array (K) -- target temperature grid.
        min_wn/max_wn: wavenumber trim bounds (cm-1).
        wl_thinning: keep every n-th wavenumber sample.
        """
        if isinstance(cs_files, str):
            cs_files = [cs_files]
        self.cs_files = list(cs_files)

        species0, temp, press, wn = pio.read_opacity(
            self.cs_files[0], extract='arrays',
        )
        self.temp = np.asarray(temp if temperature is None else temperature)
        self.ntemp = len(self.temp)
        self.press = np.asarray(press if pressure is None else pressure)
        self.nlayers = len(self.press)

        mask = wn_mask_tol(wn, min_wn, max_wn)
        self.wn = wn[mask][::wl_thinning]
        self.nwave = len(self.wn)

        species = []
        tables = []
        for cs_file in self.cs_files:
            spec, _, file_press, file_wn = pio.read_opacity(
                cs_file, extract='arrays',
            )
            fmask = wn_mask_tol(file_wn, min_wn, max_wn)
            fwn = file_wn[fmask][::wl_thinning]
            if len(fwn) != self.nwave or np.any(
                    np.abs(1.0 - fwn / self.wn) > 0.01):
                raise ValueError(
                    f"Wavenumber array of '{cs_file}' does not match"
                )
            pmax, pmax_tab = np.amax(self.press), np.amax(file_press)
            if pmax / pmax_tab - 1 > 1e-3:
                raise ValueError(
                    'Pressure profile extends beyond the maximum tabulated '
                    'pressure'
                )
            table = interpolate_opacity(
                cs_file, self.temp, self.press, fmask, wl_thinning,
            )
            if spec in species:
                tables[species.index(spec)] += table
            else:
                species.append(spec)
                tables.append(table)
        self.species = np.array(species)
        self.nspec = len(self.species)
        # [nspec, ntemp, nlayers, nwave]:
        self.cs_table = np.stack(tables, axis=0)

        self.tmin = float(np.amin(self.temp))
        self.tmax = float(np.amax(self.temp))
        self.npars = 0
        self.pnames = []
        self.texnames = []
        self.pars = []
        self.mol = list(self.species)

    def _t_weights(self, temperature):
        """Lower index + lerp weights along the temperature axis."""
        temp_grid = jnp.asarray(self.temp)
        temperature = jnp.asarray(temperature)
        tlo = jnp.clip(
            jnp.searchsorted(temp_grid, temperature, side='right') - 1,
            0, self.ntemp - 2,
        )
        dt = temp_grid[tlo + 1] - temp_grid[tlo]
        w_hi = (temperature - temp_grid[tlo]) / dt
        return tlo, w_hi

    def cross_section(self, temperature, per_mol=False):
        """CS (cm2 molec-1): T [nlayers] -> [(nspec,) nlayers, nwave]."""
        tlo, w_hi = self._t_weights(temperature)
        table = jnp.asarray(self.cs_table)          # [s, t, l, w]
        lay = jnp.arange(self.nlayers)
        lo = table[:, tlo, lay, :]                  # [s, l, w]
        hi = table[:, tlo + 1, lay, :]
        cs = lo * (1.0 - w_hi)[None, :, None] + hi * w_hi[None, :, None]
        if per_mol:
            return cs
        return jnp.sum(cs, axis=0)

    def extinction(self, temperature, density, per_mol=False):
        """EC (cm-1): density [nlayers, nspec] -> [(nspec,) nlayers, nwave].

        Equivalent of the reference interp_ec: lerp in T, times density,
        summed over species.
        """
        cs = self.cross_section(temperature, per_mol=True)   # [s, l, w]
        ec = cs * jnp.asarray(density).T[:, :, None]
        if per_mol:
            return ec
        return jnp.sum(ec, axis=0)
