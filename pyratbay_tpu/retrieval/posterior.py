"""Posterior post-processing: weighting, quantiles, and spectrum
credible envelopes.

Reference behavior: pyratbay/tools/retrieval_tools.py (weighted_to_equal
:107, posterior statistics) and pyratbay/atmosphere/atmosphere.py
temperature_posterior (:805).
"""
import numpy as np

__all__ = [
    'weighted_to_equal',
    'marginal_statistics',
    'temperature_posterior',
    'spectrum_posterior',
]


def weighted_to_equal(samples, weights, rng=None):
    """Convert weighted posterior samples to equally-weighted ones by
    multinomial resampling (the nested-sampling -> MCMC-style
    conversion)."""
    if rng is None:
        rng = np.random.default_rng(0)
    weights = np.asarray(weights, float)
    weights = weights / np.sum(weights)
    n = len(weights)
    idx = rng.choice(n, size=n, p=weights)
    return np.asarray(samples)[idx]


def marginal_statistics(posterior, quantiles=(0.159, 0.5, 0.841)):
    """Per-parameter marginal quantiles; returns [nquant, npars]."""
    posterior = np.atleast_2d(np.asarray(posterior))
    return np.quantile(posterior, quantiles, axis=0)


def temperature_posterior(posterior, temp_model):
    """Median and 68%/95% interquantile envelopes of T(p) profiles.

    posterior: [nsamples, npars] temperature-parameter draws;
    temp_model: params -> T[nlayers] (pure function).
    Returns (median, low1, high1, low2, high2).
    """
    import jax
    posterior = np.asarray(posterior)
    # Evaluate unique parameter draws only (duplicates are common in
    # MCMC chains) as one vmapped batch:
    uniq, inverse = np.unique(posterior, axis=0, return_inverse=True)
    profiles = np.asarray(
        jax.jit(jax.vmap(temp_model))(uniq)
    )[inverse]
    quants = np.percentile(
        profiles, [50.0, 15.865, 84.135, 2.275, 97.725], axis=0,
    )
    return quants[0], quants[1], quants[2], quants[3], quants[4]


def spectrum_posterior(posterior, forward, max_draws=512, rng=None):
    """Credible envelopes of the model spectrum over posterior draws.

    forward: params -> spectrum (pure jittable function).
    Returns (median, low1, high1, low2, high2) spectra.
    """
    import jax
    if rng is None:
        rng = np.random.default_rng(0)
    posterior = np.asarray(posterior)
    n = len(posterior)
    if n > max_draws:
        posterior = posterior[rng.choice(n, max_draws, replace=False)]
    spectra = np.asarray(jax.jit(jax.vmap(forward))(posterior))
    quants = np.percentile(
        spectra, [50.0, 15.865, 84.135, 2.275, 97.725], axis=0,
    )
    return quants[0], quants[1], quants[2], quants[3], quants[4]
