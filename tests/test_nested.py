"""Nested sampling: evidence and posterior recovery on analytic toys."""
import numpy as np
import jax
import jax.numpy as jnp

from pyratbay_tpu.retrieval.nested import sample_nested


def test_nested_gaussian_evidence():
    """Unit gaussian in a [-5,5]^3 box: logZ = -3 ln(10)."""
    d = 3

    def loglike(theta):
        return -0.5 * jnp.sum(theta**2) - 0.5 * d * jnp.log(2 * jnp.pi)

    def prior_transform(u):
        return 10.0 * u - 5.0

    res = sample_nested(
        loglike, prior_transform, d, nlive=400, max_iter=6000,
        nsteps_walk=40, key=jax.random.PRNGKey(1),
    )
    true_logz = -d * np.log(10.0)
    # Walk-based replacement carries ~0.1-0.2 systematic (comparable to
    # aggressive MultiNest settings); assert within 0.5:
    assert abs(res['logz'] - true_logz) < 0.5
    post = res['posterior']
    assert np.all(np.abs(post.mean(axis=0)) < 0.15)
    assert np.all(np.abs(post.std(axis=0) - 1.0) < 0.15)
    assert res['n_iter'] > 1000
    assert 0.05 < res['efficiency'] < 0.95


def test_nested_asymmetric_posterior():
    """Recover a correlated 2D gaussian's shape."""
    cov = np.array([[1.0, 0.8], [0.8, 1.0]])
    icov = jnp.asarray(np.linalg.inv(cov))

    def loglike(theta):
        return -0.5 * theta @ icov @ theta

    def prior_transform(u):
        return 8.0 * u - 4.0

    res = sample_nested(
        loglike, prior_transform, 2, nlive=300, max_iter=5000,
        key=jax.random.PRNGKey(2),
    )
    post = res['posterior']
    corr = np.corrcoef(post.T)[0, 1]
    assert abs(corr - 0.8) < 0.1
