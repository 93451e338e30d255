"""Retrieval run-mode driver: wire config -> observation -> parameter
space -> jitted posterior -> ensemble sampler -> outputs.
"""
import os

import numpy as np
import jax

from ..observation import Observation
from .params import RetrievalParams
from .forward import build_forward, build_log_posterior
from .samplers import sample_demc, gelman_rubin

__all__ = ['run_retrieval']


def _run_nested(model, obs, ret, log_post, seed):
    """MultiNest-equivalent run: nested sampling with a uniform
    unit-cube prior over [pmin, pmax] (fixed params stay fixed)."""
    import jax.numpy as jnp
    from .nested import sample_nested

    free = np.asarray(ret.ifree)
    base = jnp.asarray(ret.params)
    lo = jnp.asarray(ret.pmin[free])
    span = jnp.asarray(ret.pmax[free] - ret.pmin[free])

    def prior_transform(u):
        return base.at[jnp.asarray(free)].set(lo + span * u)

    results = sample_nested(
        lambda params: log_post(params),
        prior_transform,
        ndim=len(free),
        nlive=model.cfg.nlive or 400,
        key=jax.random.PRNGKey(seed),
    )
    # Match the DEMC result contract:
    posterior = results['posterior']
    log_posts = results['log_like']
    ibest = int(np.argmax(log_posts))
    results['bestp'] = results['samples'][ibest]
    results['best_log_post'] = float(log_posts[ibest])
    results['acceptance_rate'] = results['efficiency']
    results['chain_history'] = posterior[None, :, :]
    return results


def run_retrieval(model, seed=0):
    """Run the MCMC retrieval configured in model.cfg.

    Stores results on the model (.posterior, .bestp, .spec_best) and
    writes a <retrieval_file>.npz output.
    """
    cfg = model.cfg
    obs = Observation(
        cfg, model.wn,
        root=os.path.dirname(cfg.config_file) + '/',
    )
    if obs.data is None or not obs.nbands:
        raise ValueError(
            'Undefined observed data/filters, required for retrieval'
        )
    ret = RetrievalParams(model, obs)
    log_post = jax.jit(build_log_posterior(model, obs, ret))

    nchains = ret.nchains or 21
    nsamples = ret.nsamples or 1000
    # burnin counts per-chain samples (reference parser.py:1085-1086,
    # "Number of burn-in samples per chain"); one DEMC generation
    # advances every chain by one sample, so generations == burnin:
    burnin_gens = int(ret.burnin or 0)

    if ret.sampler == 'multinest':
        results = _run_nested(model, obs, ret, log_post, seed)
    else:
        results = sample_demc(
            log_post,
            ret.params,
            nsamples=nsamples,
            key=jax.random.PRNGKey(seed),
            nchains=nchains,
            pstep=ret.pstep,
            pmin=ret.pmin,
            pmax=ret.pmax,
            burnin=burnin_gens,
        )

    model.ret = ret
    model.obs = obs
    if 'logz' in results:
        model.logz = results['logz']
        model.logz_err = results['logz_err']
    model.posterior = np.asarray(results['posterior'])
    model.bestp = np.asarray(results['bestp'])
    model.best_log_post = float(results['best_log_post'])
    model.acceptance_rate = float(results['acceptance_rate'])

    # Best-fit spectrum:
    forward = jax.jit(build_forward(model, obs, ret))
    best = forward(results['bestp'])
    model.spec_best = np.asarray(best['spectrum'])
    model.bandflux_best = np.asarray(best['bandflux'])

    # Gelman-Rubin diagnostic on the post-burn-in generations:
    history = np.asarray(results['chain_history'])[burnin_gens:]
    if len(history) > 2:
        model.grfactor = np.asarray(gelman_rubin(history))

    outfile = None
    if cfg.logfile is not None:
        outfile = os.path.splitext(cfg.logfile)[0] + '.npz'
        extra = {}
        if 'logz' in results:
            extra['logz'] = results['logz']
            extra['logz_err'] = results['logz_err']
        np.savez(
            outfile,
            **extra,
            posterior=model.posterior,
            bestp=model.bestp,
            pnames=np.asarray(ret.pnames),
            best_log_post=model.best_log_post,
            acceptance_rate=model.acceptance_rate,
            spec_best=model.spec_best,
            bandflux_best=model.bandflux_best,
            data=obs.data,
            uncert=obs.uncert,
        )
    return results
