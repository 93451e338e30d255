"""Device-resident nested sampling (MultiNest-equivalent capability).

Classic Skilling nested sampling with MCMC replacement: nlive live
points evolve on device; each iteration removes the worst point and
regenerates it by a vmapped random-walk from a random surviving point,
constrained to L > L_worst.  Replacement walks for many iterations are
batched, so the TPU evaluates whole proposal populations per step --
the device analog of MultiNest's MPI-parallel likelihood farm
(reference pyratbay/tools/retrieval_tools.py:233-383).

Outputs match the MultiNest post-processing contract: weighted samples
(with log-weights), logZ (+ uncertainty), and an equally-weighted
posterior via pyratbay_tpu.retrieval.posterior.weighted_to_equal.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

__all__ = ['sample_nested']


def sample_nested(
        log_like, prior_transform, ndim, nlive=400, key=None,
        max_iter=None, stop_dlogz=0.1, nsteps_walk=20,
    ):
    """Nested sampling with random-walk replacement.

    Parameters
    ----------
    log_like: pure function u-or-theta -> scalar log-likelihood, taking
        PHYSICAL parameters theta [ndim].
    prior_transform: pure function u [ndim] in (0,1) -> theta (the
        MultiNest-style unit-cube mapping).
    ndim: number of parameters.
    nlive: number of live points.
    max_iter: iteration cap (default 50 * nlive).
    stop_dlogz: terminate when the live-set evidence contribution drops
        below this fraction (estimated as max residual dlogZ).
    nsteps_walk: random-walk steps per replacement.

    Returns
    -------
    dict with 'samples' [niter, ndim] (physical), 'log_weights',
    'logz', 'logz_err', 'posterior' (equal-weighted), 'n_iter',
    'efficiency'.
    """
    if key is None:
        key = random.PRNGKey(0)
    if max_iter is None:
        max_iter = 50 * nlive

    v_loglike = jax.vmap(lambda u: log_like(prior_transform(u)))

    key, k_init = random.split(key)
    live_u = random.uniform(k_init, (nlive, ndim))
    live_logl = v_loglike(live_u)

    def replace_worst(state, key):
        """One NS iteration: pop the worst live point, walk a clone."""
        live_u, live_logl = state
        iworst = jnp.argmin(live_logl)
        logl_star = live_logl[iworst]

        k_pick, k_walk = random.split(key)
        # Clone a random other live point:
        src = random.randint(k_pick, (), 0, nlive)
        src = jnp.where(src == iworst, (src + 1) % nlive, src)
        u0 = live_u[src]
        logl0 = live_logl[src]

        # Empirical covariance scale of the live set for step sizes:
        scale = jnp.std(live_u, axis=0) * (2.0 / np.sqrt(ndim))

        def walk_step(carry, k):
            u, logl = carry
            k1, k2 = random.split(k)
            prop = u + scale * random.normal(k1, (ndim,))
            prop = jnp.clip(prop, 1e-10, 1.0 - 1e-10)
            logl_prop = log_like(prior_transform(prop))
            accept = (logl_prop > logl_star) & (
                random.uniform(k2) < 1.0
            )
            u = jnp.where(accept, prop, u)
            logl = jnp.where(accept, logl_prop, logl)
            return (u, logl), accept

        keys = random.split(k_walk, nsteps_walk)
        (u_new, logl_new), accepts = lax.scan(
            walk_step, (u0, logl0), keys,
        )

        new_live_u = live_u.at[iworst].set(u_new)
        new_live_logl = live_logl.at[iworst].set(logl_new)
        out = (live_u[iworst], logl_star, jnp.mean(accepts))
        return (new_live_u, new_live_logl), out

    keys = random.split(key, max_iter)
    (live_u, live_logl), (dead_u, dead_logl, acc) = lax.scan(
        replace_worst, (live_u, live_logl), keys,
    )
    dead_u = np.asarray(dead_u)
    dead_logl = np.asarray(dead_logl)
    live_u_np = np.asarray(live_u)
    live_logl_np = np.asarray(live_logl)

    # Evidence accumulation (host side -- trivial cost):
    # X_i = exp(-i/nlive); w_i = X_{i-1} - X_i
    niter = len(dead_logl)
    log_x = -np.arange(1, niter + 1) / nlive
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
    log_zw = log_zw[:n_use]

    # Add the remaining live points with equal X weight:
    x_rem = np.exp(-n_use / nlive)
    live_logw = np.full(nlive, np.log(x_rem / nlive))
    all_u = np.vstack([dead_u, live_u_np])
    all_logl = np.concatenate([dead_logl, live_logl_np])
    all_logw = np.concatenate([log_w, live_logw])

    log_zw_all = all_logw + all_logl
    logz = float(np.logaddexp.reduce(log_zw_all))
    # Information-based uncertainty estimate:
    weights = np.exp(log_zw_all - logz)
    # Zero-weight (rejected, logL=-inf) points contribute nothing:
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
