"""Radiative(-convective) equilibrium: iterate the two-stream fluxes to
a steady temperature profile.

Host-side adaptive loop (wobble-damped temperature updates + gaussian
smoothing) around a jitted two-stream step -- the loop is inherently
sequential and data-dependent, so it stays in numpy while each
iteration's radiative transfer runs as one compiled device step
(reference pyratbay/spectrum/radiative_transfer.py:141-274).
"""
import numpy as np
from scipy.ndimage import gaussian_filter1d

from .. import constants as pc
from .convection import convective_flux

__all__ = ['radiative_equilibrium']

_MAXF = 1.0e8  # maximum temperature scale factor


def radiative_equilibrium(
        model, nsamples=100, convection=False, tmin=0.0, tmax=6000.0,
        radeq_temps=None, dt_scale=None,
    ):
    """Iterate toward radiative equilibrium.

    Parameters
    ----------
    model: Model with an emission_two_stream rt_path.
    nsamples: number of iterations (100-300 typically suffice).
    convection: include mixing-length convective-flux transport.
    radeq_temps/dt_scale: warm-restart state from a previous call
        (reference continue_run semantics, pyrat_obj.py:604-611).

    Returns
    -------
    radeq_temps: [niter, nlayers] temperature profiles per iteration
        (also stored on model.radeq_temps).
    """
    import jax
    import jax.numpy as jnp
    from ..atmosphere import hydro

    if 'two_stream' not in model.rt_path:
        raise ValueError(
            "Radiative equilibrium requires rt_path = "
            "'emission_two_stream'"
        )
    nlayers = model.nlayers
    press = np.asarray(model.press)
    wn = np.asarray(model.wn)
    vmr = np.asarray(model.base_vmr)
    mol_mass = np.asarray(model.mol_mass)

    if radeq_temps is None:
        temp0 = np.asarray(model.eval_temp())
        radeq_temps = np.atleast_2d(temp0)
    n_prev = len(radeq_temps)
    temps = np.vstack([radeq_temps, np.zeros((nsamples, nlayers))])
    if dt_scale is None:
        # Reference initial temperature scale factor
        # (pyrat_obj.py:604-605):
        dt_scale = np.tile(1.0e5, nlayers)

    def _step(temp):
        # Equilibrium chemistry re-solves composition at the current
        # T(p) every iteration, inside the same jitted step (reference
        # host-calls chemcat per iteration,
        # spectrum/radiative_transfer.py:202):
        if model.chem_model is not None:
            vmr_k = model._eval_vmr_pure(model.vmr_pars, temp)
        else:
            vmr_k = jnp.asarray(vmr)
        dens = hydro.ideal_gas_density(vmr_k, press, temp)
        mm = hydro.mean_weight(vmr_k, mol_mass)
        radius = model.eval_radius(temp, mm)
        ec, ec_cloud, deck_surface = model.extinction(
            temp, radius, dens, model.model_pars(),
        )
        result = model._run_emission(
            ec, ec_cloud, deck_surface, temp, radius, 0, model.fpatchy,
        )
        return result['flux_up'], result['flux_down']

    step = jax.jit(_step)

    dpress = np.ediff1d(np.log(press), to_begin=1.0)
    dpress[0] = dpress[1]
    df_sign = np.zeros((n_prev + nsamples, nlayers))

    def _update(k, diff_flux, scale):
        """Wobble-damped adaptive temperature update (in place)."""
        df_sign[k] = np.sign(diff_flux)
        lo = max(k - 4, 0)
        wobble = np.any(df_sign[lo:k] - df_sign[k], axis=0)
        scale = np.copy(scale)
        scale[wobble] *= 0.5
        scale[~wobble] *= 1.15
        scale = gaussian_filter1d(np.clip(scale, 1.0, _MAXF), 1.5)
        dt = (
            scale * np.sign(diff_flux) * np.abs(diff_flux)**0.1
            / (pc.sigma_sb * temps[k]**3 * dpress)
        )
        temps[k + 1] = temps[k] + dt
        temps[k + 1, 0] = temps[k + 1, 1]  # isothermal top
        sigma = np.clip(np.mean(np.abs(dt)) / 10.0, 0.75, 2.0)
        temps[k + 1, :-1] = gaussian_filter1d(temps[k + 1], sigma)[:-1]
        temps[k + 1] = np.clip(temps[k + 1], tmin, tmax)
        return scale

    for i in range(nsamples):
        k = n_prev + i - 1
        flux_up, flux_down = step(jnp.asarray(temps[k]))
        q_up = np.trapezoid(np.asarray(flux_up), wn, axis=1)
        q_down = np.trapezoid(np.asarray(flux_down), wn, axis=1)
        q_net = q_up - q_down
        diff_flux = np.ediff1d(q_net, to_begin=0)
        dt_scale_tmp = _update(k, diff_flux, dt_scale)

        if convection:
            temp_new = temps[k + 1]
            # Diatomic-dominated heat capacity (cp/R = 3.5 per mole);
            # species-resolved cp needs the equilibrium-chemistry
            # network (chemcat), which is gated separately:
            cp = np.full(nlayers, 3.5) * pc.k / pc.amu
            mm = vmr @ mol_mass
            dens = vmr * (press / temp_new)[:, None] * pc.bar / pc.k
            rho = np.sum(dens * mol_mass, axis=1) * pc.amu
            radius = np.asarray(model.eval_radius(
                jnp.asarray(temp_new), jnp.asarray(mm),
            ))
            gravity = pc.G * model.mplanet / radius**2
            conv = convective_flux(
                press * pc.bar, temp_new, cp, gravity, mm, rho,
            )
            if np.any(conv != 0.0):
                diff_flux = np.ediff1d(q_net + conv, to_begin=0)
                dt_scale = _update(k, diff_flux, dt_scale)
                continue
        dt_scale = dt_scale_tmp

    model.radeq_temps = temps
    model._dt_scale = dt_scale
    return temps
