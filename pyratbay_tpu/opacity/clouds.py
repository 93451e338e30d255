"""Cloud and haze models: opaque deck, constant-gray, and power-law haze.

Reference behavior: pyratbay/opacity/clouds/gray.py and lecavelier.py.
All evaluations are pure functions of the retrieval parameters, so cloud
parameters can be sampled without re-tracing.
"""
import numpy as np
import jax.numpy as jnp

from .. import constants as pc

__all__ = ['Lecavelier', 'CCSgray', 'Deck']

_S0 = 5.31e-27   # H2 Rayleigh cross section at 0.35 um (cm2 molec-1)
_L0 = 3.5e-5     # Nominal wavelength (cm)


class Lecavelier:
    """Power-law haze: cs = 10**k * s0 * (wn*l0)**(-alpha).

    Density is the total gas density p/kT (Lecavelier des Etangs 2008).
    pars = [log_k_ray, alpha_ray].
    """

    def __init__(self, pressure, wn):
        self.name = 'lecavelier'
        self.pressure = np.asarray(pressure)  # bar
        self.wn = np.asarray(wn)
        self.pars = [0.0, -4.0]
        self.npars = 2
        self.pnames = ['log_k_ray', 'alpha_ray']
        self.texnames = [r'$\log\ \kappa_{\rm ray}$', r'$\alpha_{\rm ray}$']
        self.mol = None

    def cross_section(self, pars):
        pars = jnp.asarray(pars)
        return 10.0 ** pars[0] * _S0 * (jnp.asarray(self.wn) * _L0) ** (-pars[1])

    def extinction(self, temperature, pars):
        """EC (cm-1) over [nlayers, nwave]."""
        density = jnp.asarray(self.pressure) * pc.bar / temperature / pc.k
        return self.cross_section(pars)[None, :] * density[:, None]

    def ec_rank1(self, temperature, pars):
        """(layer column, wave row) factorization of the EC (see
        rayleigh.Rayleigh.ec_rank1)."""
        density = jnp.asarray(self.pressure) * pc.bar / temperature / pc.k
        return density, self.cross_section(pars)


class CCSgray:
    """Constant (gray) cross-section cloud between two pressure levels.

    pars = [log_k_gray, log_p_top, log_p_bot] (pressures in bar).
    """

    def __init__(self, pressure, wn):
        self.name = 'ccsgray'
        self.pressure = np.asarray(pressure)
        self.wn = np.asarray(wn)
        self.pars = [0.0, -4.0, 2.0]
        self.npars = 3
        self.pnames = ['log_k_gray', 'log_p_top', 'log_p_bot']
        self.texnames = [
            r'$\log_{10}(f_{\rm gray})$',
            r'$\log_{10}(p_{\rm top})\ ({\rm bar})$',
            r'$\log_{10}(p_{\rm bot})\ ({\rm bar})$',
        ]
        self.mol = None

    def extinction(self, temperature, pars):
        pars = jnp.asarray(pars)
        press = jnp.asarray(self.pressure)
        in_cloud = (press >= 10.0 ** pars[1]) & (press <= 10.0 ** pars[2])
        cs = jnp.where(in_cloud, 10.0 ** pars[0] * _S0, 0.0)
        density = press * pc.bar / temperature / pc.k
        nwave = len(self.wn)
        return jnp.broadcast_to(
            (cs * density)[:, None], (len(self.pressure), nwave),
        )

    def ec_rank1(self, temperature, pars):
        """(layer column, wave row) factorization of the gray EC."""
        pars = jnp.asarray(pars)
        press = jnp.asarray(self.pressure)
        in_cloud = (press >= 10.0 ** pars[1]) & (press <= 10.0 ** pars[2])
        cs = jnp.where(in_cloud, 10.0 ** pars[0] * _S0, 0.0)
        density = press * pc.bar / temperature / pc.k
        return cs * density, jnp.ones(len(self.wn))


class Deck:
    """Opaque cloud deck at pressure 10**pars[0] bar.

    Contributes no extinction itself; instead it sets a hard lower
    boundary for the path integration.  `surface(...)` returns the
    jit-safe (itop, rsurf, tsurf) triplet consumed by the RT integrators
    (reference: opacity/clouds/gray.py:115-154).
    """

    def __init__(self, pressure, wn):
        self.name = 'deck'
        self.pressure = np.asarray(pressure)
        self.wn = np.asarray(wn)
        self.pars = [-1.0]
        self.npars = 1
        self.pnames = ['log_p_cl']
        self.texnames = [r'$\log\ p_{\rm cl}$']
        self.mol = None

    def surface(self, radius, temperature, pars):
        """Cloud-top layer index and interpolated radius/temperature.

        itop: index of the layer at-or-directly-below the cloud top
        (clipped to [1, nlayers-1] at the boundaries, reference
        gray.py:139-145).
        """
        pars = jnp.asarray(pars)
        press = jnp.asarray(self.pressure)
        nlayers = press.shape[0]
        ptop = 10.0 ** pars[0]
        itop = jnp.searchsorted(press, ptop, side='left')
        itop = jnp.where(ptop >= press[-1], nlayers - 1, itop)
        itop = jnp.clip(itop, 1, nlayers - 1)
        tsurf = jnp.interp(ptop, press, temperature)
        rsurf = jnp.interp(ptop, press, radius)
        return itop, rsurf, tsurf


def _cloud_str(self):
    from ..tools import Formatted_Write
    fw = Formatted_Write()
    fw.write('Cloud opacity model: {}', self.name)
    fw.write(
        'Parameters ({}): {}', self.pnames,
        [float(p) for p in self.pars],
    )
    return fw.text


Lecavelier.__str__ = _cloud_str
CCSgray.__str__ = _cloud_str
Deck.__str__ = _cloud_str
