"""Pressure and temperature profile models.

Temperature models are factories: `guillot_tp(pressure)` returns a pure
function `params -> T[nlayers]` that closes over the static pressure grid.
Reference behavior: pyratbay/atmosphere/tmodels/tmodels.py and
src_c/_pt.c (Guillot/Line three-channel Eddington profile).
"""
import numpy as np
import jax.numpy as jnp

from .. import constants as pc
from ..ops.special import e2

__all__ = [
    'pressure',
    'isothermal_tp',
    'guillot_tp',
    'madhu_tp',
    'get_tmodel',
    'TMODEL_NPARS',
]

TMODEL_NPARS = {'isothermal': 1, 'guillot': 6, 'madhu': 6}

TMODEL_PNAMES = {
    'isothermal': ['T_iso'],
    'guillot': [
        "log_kappa'", 'log_gamma1', 'log_gamma2', 'alpha', 'T_irr', 'T_int',
    ],
    'madhu': ['log_p1', 'log_p2', 'log_p3', 'a1', 'a2', 'T0'],
}


def pressure(ptop, pbottom, nlayers, units='bar'):
    """Log-spaced pressure profile in bar (static, numpy).

    ptop/pbottom may be floats (in `units`) or strings with units.
    """
    ptop = pc.get_param(ptop, units, gt=0.0)
    pbottom = pc.get_param(pbottom, units, gt=0.0)
    if ptop >= pbottom:
        raise ValueError(
            f'Bottom-layer pressure ({pbottom/pc.bar:.2e} bar) must be '
            f'higher than the top-layer pressure ({ptop/pc.bar:.2e} bar)'
        )
    return np.logspace(
        np.log10(ptop / pc.bar), np.log10(pbottom / pc.bar), nlayers,
    )


def isothermal_tp(press):
    """Isothermal profile model: params = [T]."""
    nlayers = len(press)

    def temp_fn(params):
        params = jnp.atleast_1d(jnp.asarray(params))
        return jnp.full((nlayers,), params[0], dtype=params.dtype)
    return temp_fn


def _xi(gamma, tau):
    """Three-channel Eddington xi function (Line et al. 2013, eq. 14)."""
    gt = gamma * tau
    return 2.0 / 3.0 * (
        (1.0 / gamma) * (1.0 + (0.5 * gt - 1.0) * jnp.exp(-gt))
        + gamma * (1.0 - 0.5 * tau**2) * e2(gt)
        + 1.0
    )


def guillot_tp(press, gravity=None):
    """Guillot (2010) / Line (2013) profile model.

    params = [log10(kappa'), log10(gamma1), log10(gamma2), alpha,
              T_irr, T_int];  press in bar.
    """
    press_barye = jnp.asarray(press) * pc.bar
    if gravity is None:
        grav = jnp.ones_like(press_barye)
    else:
        grav = jnp.broadcast_to(jnp.asarray(gravity), press_barye.shape)

    def temp_fn(params):
        params = jnp.asarray(params)
        kappa = 10.0 ** params[0]
        gamma1 = 10.0 ** params[1]
        gamma2 = 10.0 ** params[2]
        alpha = params[3]
        t_irr = params[4]
        t_int = params[5]
        tau = kappa * press_barye / grav
        xi1 = _xi(gamma1, tau)
        xi2 = _xi(gamma2, tau)
        t4 = 0.75 * (
            t_int**4 * (2.0 / 3.0 + tau)
            + t_irr**4 * (1.0 - alpha) * xi1
            + t_irr**4 * alpha * xi2
        )
        return t4 ** 0.25
    return temp_fn


def _gaussian_kernel1d(sigma, radius):
    x = np.arange(-radius, radius + 1)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    return phi / phi.sum()


def gaussian_filter1d(y, sigma, mode='nearest'):
    """scipy-compatible 1D gaussian smoothing as a static convolution."""
    radius = int(4.0 * sigma + 0.5)
    kernel = jnp.asarray(_gaussian_kernel1d(sigma, radius))
    if mode == 'nearest':
        ypad = jnp.concatenate([
            jnp.repeat(y[:1], radius), y, jnp.repeat(y[-1:], radius),
        ])
    else:
        raise ValueError(f'Unsupported mode {mode}')
    return jnp.convolve(ypad, kernel, mode='valid')


def madhu_tp(press):
    """Madhusudhan & Seager (2009) three-zone profile model.

    params = [log_p1, log_p2, log_p3, a1, a2, T0]  (pressures in bar).
    Invalid orderings (p1 > p3) return an all-zero profile, which the
    caller treats as an out-of-bounds rejection (reference
    tmodels.py:301-304).
    """
    logp = jnp.log10(jnp.asarray(press))
    logp0 = float(np.amin(np.log10(press)))
    dlogp = float(np.log10(press[1]) - np.log10(press[0]))
    fsmooth = 0.33 / dlogp
    loge = np.log10(np.e)

    def temp_fn(params):
        params = jnp.asarray(params)
        logp1, logp2, logp3, a1, a2, t0 = (
            params[0], params[1], params[2], params[3], params[4], params[5],
        )
        t1 = t0 + ((logp1 - logp0) / (a1 * loge)) ** 2
        t2 = t1 - ((logp1 - logp2) / (a2 * loge)) ** 2
        t3 = t2 + ((logp3 - logp2) / (a2 * loge)) ** 2
        temp = jnp.where(
            logp < logp1,
            t0 + ((logp - logp0) / (a1 * loge)) ** 2,
            jnp.where(
                logp < logp3,
                t2 + ((logp - logp2) / (a2 * loge)) ** 2,
                t3,
            ),
        )
        temp = gaussian_filter1d(temp, fsmooth, mode='nearest')
        return jnp.where(logp1 > logp3, jnp.zeros_like(temp), temp)
    return temp_fn


def get_tmodel(name, press, gravity=None):
    """Temperature model factory by registry name.

    The returned callable validates the parameter count at trace time
    with the reference's message (tmodels.py:20-32) and carries .name
    and .npars attributes.
    """
    if name == 'isothermal':
        fn = isothermal_tp(press)
    elif name in ('guillot', 'tcea'):
        fn = guillot_tp(press, gravity)
    elif name == 'madhu':
        fn = madhu_tp(press)
    else:
        raise ValueError(
            f"Invalid temperature model '{name}', select from {pc.TMODELS}"
        )
    npars = len(TMODEL_PNAMES[name])

    def checked(params):
        if np.size(params) != npars:
            raise ValueError(
                f'Number of temperature parameters ({np.size(params)}) '
                'does not match the required number of parameters '
                f'({npars}) of the {name} model'
            )
        return fn(params)

    checked.name = name
    checked.npars = npars
    return checked
