"""Device-resident nested sampling (MultiNest-capability interface).

Skilling nested sampling with batched MCMC replacement, designed for
the TPU's batch appetite instead of MultiNest's MPI likelihood farm
(reference pyratbay/tools/retrieval_tools.py:233-383):

* nlive live points evolve on device; every scan step removes the
  `batch` worst points at once and replaces them with vmapped MCMC
  walks (the whole proposal population evaluates as one batched
  forward pass).
* Proposals use the live set's full covariance Cholesky factor, so
  correlated posteriors mix well; walks start from random survivors,
  which also seeds replacements across separated modes.
* The evidence accumulation uses the exact order statistics of
  without-replacement batch removal: the k-th point removed from a
  set of (nlive - k) carries a log-volume shrink of 1/(nlive - k).

Outputs match the MultiNest post-processing contract: weighted samples
(with log-weights), logZ (+ information-based uncertainty), and an
equally-weighted posterior via posterior.weighted_to_equal.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

__all__ = ['sample_nested']


def sample_nested(
        log_like, prior_transform, ndim, nlive=400, key=None,
        max_iter=None, stop_dlogz=0.1, nsteps_walk=25, batch=None,
    ):
    """Nested sampling with batched MCMC replacement.

    Parameters
    ----------
    log_like: pure function theta [ndim] -> scalar log-likelihood.
    prior_transform: pure function u [ndim] in (0,1) -> theta (the
        MultiNest-style unit-cube mapping).
    ndim: number of parameters.
    nlive: number of live points.
    max_iter: dead-point cap (default 50 * nlive).
    stop_dlogz: terminate when the live-set evidence contribution
        drops below this fraction of the accumulated evidence.
    nsteps_walk: MCMC steps per replacement walk.
    batch: points removed/replaced per scan step (default nlive//16;
        larger batches keep the device busier per compile step).

    Returns
    -------
    dict with 'samples' [n, ndim] (physical), 'log_weights',
    'log_like', 'weights', 'logz', 'logz_err', 'posterior'
    (equal-weighted), 'n_iter', 'efficiency'.
    """
    if key is None:
        key = random.PRNGKey(0)
    if max_iter is None:
        max_iter = 50 * nlive
    if batch is None:
        batch = max(1, nlive // 16)
    batch = int(min(batch, nlive // 2))
    n_scan = max(1, -(-max_iter // batch))

    v_loglike = jax.vmap(lambda u: log_like(prior_transform(u)))

    key, k_init = random.split(key)
    live_u = random.uniform(k_init, (nlive, ndim))
    live_logl = v_loglike(live_u)
    gamma = 2.38 / np.sqrt(ndim)

    def ns_step(state, key):
        """Remove the `batch` worst points; walk clones above L_star."""
        live_u, live_logl = state
        order = jnp.argsort(live_logl)
        idead = order[:batch]                 # worst -> best of batch
        dead_u = live_u[idead]
        dead_logl = live_logl[idead]
        logl_star = dead_logl[-1]             # hardest constraint

        k_pick, k_walk = random.split(key)
        # Clone random SURVIVORS (ranks >= batch):
        src = order[batch + random.randint(
            k_pick, (batch,), 0, nlive - batch,
        )]
        u0 = live_u[src]
        logl0 = live_logl[src]

        # Full-covariance proposal scale from the live set:
        cov = jnp.cov(live_u.T) + 1e-10 * jnp.eye(ndim)
        cov = jnp.atleast_2d(cov)
        chol = jnp.linalg.cholesky(cov)

        def walk_step(carry, k):
            u, logl = carry
            k1, k2 = random.split(k)
            step = gamma * random.normal(k1, (batch, ndim)) @ chol.T
            prop = jnp.clip(u + step, 1e-10, 1.0 - 1e-10)
            logl_prop = v_loglike(prop)
            accept = logl_prop > logl_star
            u = jnp.where(accept[:, None], prop, u)
            logl = jnp.where(accept, logl_prop, logl)
            return (u, logl), jnp.mean(accept)

        keys = random.split(k_walk, nsteps_walk)
        (u_new, logl_new), accepts = lax.scan(
            walk_step, (u0, logl0), keys,
        )

        new_live_u = live_u.at[idead].set(u_new)
        new_live_logl = live_logl.at[idead].set(logl_new)
        return (new_live_u, new_live_logl), (
            dead_u, dead_logl, jnp.mean(accepts),
        )

    keys = random.split(key, n_scan)
    (live_u, live_logl), (dead_u, dead_logl, acc) = lax.scan(
        ns_step, (live_u, live_logl), keys,
    )
    dead_u = np.asarray(dead_u).reshape(-1, ndim)
    dead_logl = np.asarray(dead_logl).reshape(-1)
    live_u_np = np.asarray(live_u)
    live_logl_np = np.asarray(live_logl)

    # Evidence accumulation (host side -- trivial cost).  Within each
    # batch the k-th removed point (k = 0..batch-1) shrinks the prior
    # volume by 1/(nlive - batch + 1 + k)... ordered worst-first, the
    # k-th of the batch is drawn from (nlive - k) active points:
    niter = len(dead_logl)
    dlog_x = np.tile(
        [1.0 / (nlive - k) for k in range(batch)], n_scan,
    )[:niter]
    log_x = -np.cumsum(dlog_x)
    log_w = np.log(-np.diff(np.exp(np.concatenate([[0.0], log_x]))))
    log_zw = log_w + dead_logl

    # Truncate where the remaining live contribution is negligible:
    logz_run = np.logaddexp.accumulate(log_zw)
    n_use = niter
    for i in range(niter):
        rem = np.max(live_logl_np) + log_x[i]
        if rem - logz_run[i] < np.log(stop_dlogz):
            n_use = i + 1
            break

    dead_u = dead_u[:n_use]
    dead_logl = dead_logl[:n_use]
    log_w = log_w[:n_use]

    # Add the remaining live points with equal X weight:
    x_rem = np.exp(log_x[n_use - 1]) if n_use else 1.0
    live_logw = np.full(nlive, np.log(x_rem / nlive))
    all_u = np.vstack([dead_u, live_u_np])
    all_logl = np.concatenate([dead_logl, live_logl_np])
    all_logw = np.concatenate([log_w, live_logw])

    log_zw_all = all_logw + all_logl
    logz = float(np.logaddexp.reduce(log_zw_all))
    # Information-based uncertainty estimate:
    weights = np.exp(log_zw_all - logz)
    ok = weights > 0
    info = float(np.sum(weights[ok] * (all_logl[ok] - logz)))
    logz_err = float(np.sqrt(max(info, 0.0) / nlive))

    samples = np.asarray(
        jax.jit(jax.vmap(prior_transform))(jnp.asarray(all_u))
    )
    from .posterior import weighted_to_equal
    posterior = weighted_to_equal(samples, weights)

    return {
        'samples': samples,
        'log_weights': all_logw,
        'log_like': all_logl,
        'weights': weights,
        'logz': logz,
        'logz_err': logz_err,
        'posterior': posterior,
        'n_iter': n_use,
        'efficiency': float(np.mean(np.asarray(acc))),
    }
