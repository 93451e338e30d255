"""Hydrostatic-equilibrium radius profiles and gas-state helpers.

Reference behavior: pyratbay/atmosphere/atmosphere.py:350-510.
"""
import numpy as np
import jax.numpy as jnp

from .. import constants as pc
from ..ops.integrate import cumtrapz

__all__ = [
    'hydro_g',
    'hydro_m',
    'hill_radius',
    'mean_weight',
    'ideal_gas_density',
    'equilibrium_temp',
]


def hydro_g(press, temp, mu, g, p0=None, r0=None):
    """Hydrostatic radius profile with constant gravity.

    press in bar, temp in K, mu in g/mol, g in cm s-2; p0 (bar), r0 (cm)
    anchor radius(p0) = r0.
    """
    press = jnp.asarray(press)
    logp = jnp.log(press)
    radius = cumtrapz(-pc.k * pc.N_A * temp / (mu * g), logp)
    if p0 is not None and r0 is not None:
        r0_interp = jnp.interp(p0, press, radius)
        radius = radius + (r0 - r0_interp)
    else:
        radius = radius - radius[-1]
    return radius


def hydro_m(press, temp, mu, mass, p0, r0):
    """Hydrostatic radius profile with g(r) = G M / r^2.

    Solves 1/r = I(p) - I(p0) + 1/r0 with
    I = cumint k N_A T / (G mu M) dln p.  Layers above a divergence
    (non-monotonic radius) are set to +inf, matching the reference's
    puffy-atmosphere semantics (atmosphere.py:480-484).
    """
    press = jnp.asarray(press)
    logp = jnp.log(press)
    # Work in r0-normalized units: values are O(1) so the formulation
    # stays accurate in float32 (1/r in cm^-1 is ~1e-10 with ~1e-12
    # differences, which f32 cannot resolve).
    integ = cumtrapz(
        r0 * pc.k * pc.N_A * temp / (pc.G * mu * mass), logp,
    )
    i0 = jnp.interp(p0, press, integ)
    radius = r0 / (integ - i0 + 1.0)

    # Mask diverging top: find the deepest layer j with radius[j]<=radius[j+1]
    # and set layers [0, j] to inf.
    n = radius.shape[0]
    bad = radius[:-1] <= radius[1:]
    idx = jnp.arange(n - 1)
    last_bad = jnp.max(jnp.where(bad, idx, -1))
    layer = jnp.arange(n)
    return jnp.where(layer <= last_bad, jnp.inf, radius)


def hill_radius(smaxis, mplanet, mstar):
    """Hill radius; inf when any input is missing."""
    if smaxis is None or mplanet is None or mstar is None:
        return np.inf
    return smaxis * (mplanet / (3.0 * mstar)) ** (1.0 / 3.0)


def mean_weight(vmr, mass):
    """Mean molecular mass per layer (g/mol)."""
    return jnp.sum(jnp.atleast_2d(vmr) * jnp.asarray(mass), axis=1)


def ideal_gas_density(vmr, press, temp):
    """Number density (molec cm-3) from the ideal-gas law.

    vmr [nlayers, nspecies] (or [nlayers]), press in bar, temp in K.
    """
    vmr = jnp.asarray(vmr)
    press = jnp.asarray(press)
    temp = jnp.asarray(temp)
    if vmr.ndim == 1:
        return vmr * press * pc.bar / (temp * pc.k)
    return vmr * (press / temp)[:, None] * (pc.bar / pc.k)


def equilibrium_temp(
        tstar, rstar, smaxis, albedo=0.0, f=1.0,
        tstar_unc=0.0, rstar_unc=0.0, smaxis_unc=0.0,
    ):
    """Planet equilibrium temperature and uncertainty."""
    teq = ((1.0 - albedo) / f) ** 0.25 * (0.5 * rstar / smaxis) ** 0.5 * tstar
    teq_unc = teq * np.sqrt(
        (tstar_unc / tstar) ** 2
        + (0.5 * smaxis_unc / smaxis) ** 2
        + (0.5 * rstar_unc / rstar) ** 2
    )
    return teq, teq_unc
