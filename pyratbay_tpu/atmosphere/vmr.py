"""Volume-mixing-ratio models and bulk-species balancing.

Free-parameter VMR profiles (constant-log, scaled, sloped) and the
renormalization that keeps sum(vmr)=1 per layer by adjusting the bulk
species at fixed mutual ratios.
Reference behavior: pyratbay/atmosphere/vmr_models/vmr_models.py and
pyratbay/atmosphere/vmr_scaling.py.
"""
import numpy as np
import jax.numpy as jnp

__all__ = [
    'uniform_vmr',
    'iso_vmr',
    'scale_vmr',
    'slant_vmr',
    'bulk_ratio',
    'balance_bulk',
    'vmr_scale',
    'qcapcheck',
]


def uniform_vmr(abundances, nlayers):
    """Tile uniform abundances into [nlayers, nspecies] (static)."""
    return np.tile(np.asarray(abundances, float), (nlayers, 1))


def iso_vmr(log_vmr, nlayers):
    """Constant-with-altitude VMR: 10**log_vmr at every layer."""
    return jnp.full((nlayers,), 10.0 ** jnp.squeeze(log_vmr))


def scale_vmr(base_profile, log_scale):
    """Scale a base VMR profile by 10**log_scale."""
    return jnp.asarray(base_profile) * 10.0 ** jnp.squeeze(log_scale)


def slant_vmr(log_press, params):
    """Sloped log-VMR profile, clipped between min/max bounds.

    params = [slope, log_vmr0, log_p0, min_log_vmr, max_log_vmr]
    """
    params = jnp.asarray(params)
    slope, vmr0, log_p0, vmr_min, vmr_max = (
        params[0], params[1], params[2], params[3], params[4],
    )
    log_vmr = slope * (jnp.asarray(log_press) - log_p0) + vmr0
    return 10.0 ** jnp.clip(log_vmr, vmr_min, vmr_max)


def bulk_ratio(vmr, ibulk):
    """Abundance ratios of bulk species relative to the first one.

    Returns (bratio [nlayers, nbulk], invsrat [nlayers]).
    """
    vmr = jnp.asarray(vmr)
    ibulk = jnp.asarray(ibulk)
    bratio = vmr[:, ibulk] / vmr[:, ibulk[:1]]
    bratio = bratio.at[:, 0].set(1.0)
    invsrat = 1.0 / jnp.sum(bratio, axis=1)
    return bratio, invsrat


def balance_bulk(vmr, ibulk, bratio, invsrat):
    """Re-set bulk-species VMRs so each layer sums to one.

    The bulk species absorb 1 - sum(traces), split at fixed ratios.
    """
    vmr = jnp.asarray(vmr)
    nspecies = vmr.shape[1]
    is_bulk = jnp.zeros(nspecies, bool).at[jnp.asarray(ibulk)].set(True)
    sum_traces = jnp.sum(jnp.where(is_bulk[None, :], 0.0, vmr), axis=1)
    remainder = 1.0 - sum_traces
    bulk_vals = bratio * (remainder * invsrat)[:, None]
    return vmr.at[:, jnp.asarray(ibulk)].set(bulk_vals)


def vmr_scale(base_vmr, scaled_profiles, iscale, ibulk, bratio, invsrat):
    """Apply free-VMR profiles then re-balance the bulk species.

    Parameters
    ----------
    base_vmr: [nlayers, nspecies] baseline VMRs.
    scaled_profiles: [nmodels, nlayers] replacement profiles.
    iscale: indices (static tuple) of the species each profile replaces.
    """
    vmr = jnp.asarray(base_vmr)
    for i, imol in enumerate(iscale):
        vmr = vmr.at[:, imol].set(scaled_profiles[i])
    return balance_bulk(vmr, ibulk, bratio, invsrat)


def qcapcheck(vmr, qcap, ibulk):
    """True when summed trace abundances exceed the cap (jit-safe bool)."""
    if qcap is None:
        return jnp.asarray(False)
    vmr = jnp.asarray(vmr)
    nspecies = vmr.shape[1]
    is_bulk = jnp.zeros(nspecies, bool).at[jnp.asarray(ibulk)].set(True)
    qtrace = jnp.sum(jnp.where(is_bulk[None, :], 0.0, vmr), axis=1)
    return jnp.any(qtrace > qcap)
