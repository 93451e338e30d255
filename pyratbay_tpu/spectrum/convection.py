"""Mixing-length convective flux.

Prandtl mixing-length theory in the Carroll & Ostlie ("An Introduction
to Modern Astrophysics", sec. 10.4) closed form: a parcel displaced one
mixing length l = alpha*H through a super-adiabatic region picks up the
excess heat cp*dT and an average kinetic-energy velocity sqrt(beta*g*H),
giving a flux  F = alpha^2 * rho * (cp/mu) * T * sqrt(beta*g*H) *
max(0, dlnT/dlnP - grad_ad)^{3/2}.

Reference behavior: pyratbay/spectrum/convection.py:13-68 (same
formula; this module is an independent jnp formulation and is jittable).
"""
import jax.numpy as jnp

from .. import constants as pc

__all__ = ['convective_flux', 'super_adiabatic_gradient']


def super_adiabatic_gradient(pressure, temperature, gamma):
    """max(0, dlnT/dlnP - grad_ad) per layer, with grad_ad = 1 - 1/gamma.

    The log-log gradient is a one-sided difference toward the layer
    above; the top layer has no upstream neighbor and carries a zero
    gradient (so the returned excess is zero there), matching the
    reference's ediff1d to_begin convention.
    """
    grad = jnp.diff(jnp.log(temperature)) / jnp.diff(jnp.log(pressure))
    grad = jnp.concatenate([jnp.zeros(1), grad])
    grad_ad = 1.0 - 1.0 / gamma
    return jnp.maximum(grad - grad_ad, 0.0)


def convective_flux(
        pressure, temperature, cp, gravity, mu, rho, alpha=1.5, beta=0.5,
    ):
    """Mixing-length convective flux (erg s-1 cm-2), nonzero only in
    layers whose radiative lapse rate exceeds the adiabatic one.

    Parameters
    ----------
    pressure: [nlayers] barye.   temperature: [nlayers] K.
    cp: [nlayers] molar heat capacity (erg K-1 mol-1).
    gravity: [nlayers] cm s-2.   mu: [nlayers] g mol-1.
    rho: [nlayers] mass density (g cm-3).
    alpha: mixing length in pressure scale heights (l = alpha*H).
    beta: average kinetic-energy velocity factor, 0 < beta <= 1.
    """
    # gamma = cp/cv with cv = cp - R (ideal gas), R in per-gram-mole CGS:
    gamma = cp / (cp - pc.k / pc.amu)
    excess = super_adiabatic_gradient(pressure, temperature, gamma)
    # Pressure scale height and the parcel's average convective speed:
    scale_height = pc.k * temperature / (mu * pc.amu * gravity)
    v_avg = jnp.sqrt(beta * gravity * scale_height)
    cp_per_gram = cp / mu
    return alpha**2 * rho * cp_per_gram * temperature * v_avg * excess**1.5
