"""Mixing-length convective flux (Carroll & Ostlie formulation).

Reference behavior: pyratbay/spectrum/convection.py.
"""
import numpy as np

from .. import constants as pc

__all__ = ['convective_flux']


def convective_flux(
        pressure, temperature, cp, gravity, mu, rho, alpha=1.5, beta=0.5,
    ):
    """Convective flux estimate (erg s-1 cm-2); nonzero only where the
    radiative temperature gradient is super-adiabatic.

    pressure in barye; cp in erg K-1 mol-1; gravity cm s-2;
    mu g/mol; rho g cm-3.  alpha = mixing length / scale height;
    beta = kinetic-energy velocity factor.
    """
    dpress = np.ediff1d(np.log(pressure), to_begin=1.0)
    grad_t = np.ediff1d(np.log(temperature), to_begin=0.0) / dpress
    cv = cp - pc.k / pc.amu
    gamma = cp / cv
    grad_ad = 1.0 - 1.0 / gamma
    delta_grad = np.clip(grad_t - grad_ad, 0, np.inf)
    scale_height = pc.k * temperature / (mu * pc.amu * gravity)
    return (
        alpha**2 * np.sqrt(beta)
        * cp / mu * rho * temperature
        * np.sqrt(gravity * scale_height)
        * delta_grad**1.5
    )
