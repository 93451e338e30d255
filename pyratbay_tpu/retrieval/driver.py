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
    burnin_gens = int(np.ceil((ret.burnin or 0) / 1))

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
        np.savez(
            outfile,
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
