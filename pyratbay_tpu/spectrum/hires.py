"""High-resolution spectroscopy utilities: instrumental convolution and
radial-velocity shifting.

Reference behavior: pyratbay/spectrum/spec_tools.py:817-908.
"""
import numpy as np
import scipy.interpolate as si
from scipy.signal import convolve
from scipy.signal.windows import gaussian

from .. import constants as pc

__all__ = ['inst_convolution', 'instrumental_kernel', 'rv_shift']


def instrumental_kernel(resolution, sampling_res):
    """Gaussian instrumental kernel resampled onto the spectrum's
    velocity sampling (static; reference spec_tools.py:817-860).

    resolution: R = lambda/FWHM of the gaussian; sampling_res: the
    spectrum's sampling resolving power.
    """
    pixel_dv = pc.c / resolution / 1e5     # FWHM in km/s
    n_el = int(6 * pixel_dv) + 1
    kernel = gaussian(n_el, std=pixel_dv / 2.355)
    kernel /= np.sum(kernel)

    rv_pix = np.abs(pc.c / 1e5 / sampling_res)
    n_rv0 = int(((n_el - 1) / 2) / rv_pix)
    rv_array = np.arange(-(n_el - 1) / 2, (n_el - 1) / 2 + 1, 1)
    rv_mod = np.linspace(-n_rv0 * rv_pix, n_rv0 * rv_pix, 2 * n_rv0 + 1)
    spline = si.splrep(rv_array, kernel)
    kernel_pix = si.splev(rv_mod, spline, der=0)
    return kernel_pix / np.sum(kernel_pix)


def inst_convolution(wl, spectrum, resolution, sampling_res=None):
    """Convolve a spectrum to an instrumental resolving power.

    resolution: R = lambda/FWHM of the gaussian kernel.
    sampling_res: resolution of the input sampling (estimated from wl
    when not given).
    """
    if sampling_res is None:
        dv = np.ediff1d(wl) / wl[:-1]
        sampling_res = 1.0 / np.abs(np.mean(dv))
    kernel_pix = instrumental_kernel(resolution, sampling_res)
    return convolve(spectrum, kernel_pix, mode='same')


def rv_shift(vel_km, wn=None, wl=None):
    """Relativistic Doppler shift of a wavenumber/wavelength array.

    vel_km: radial velocity in km/s (positive = redshift for wl).
    """
    vel = vel_km * pc.km
    if wn is not None:
        factor = np.sqrt((1 - vel / pc.c) / (1 + vel / pc.c))
        return np.asarray(wn) * factor
    if wl is not None:
        factor = np.sqrt((1 + vel / pc.c) / (1 - vel / pc.c))
        return np.asarray(wl) * factor
    raise ValueError('Either wn or wl must be provided')
