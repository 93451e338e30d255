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


def test_nested_bimodal_posterior():
    """Batched replacement walks seeded from random survivors keep
    both modes of a well-separated bimodal posterior populated."""
    import jax.numpy as jnp
    from pyratbay_tpu.retrieval.nested import sample_nested

    sigma = 0.05
    mu1 = jnp.array([0.3, 0.3])
    mu2 = jnp.array([0.7, 0.7])

    def log_like(theta):
        ll1 = -0.5 * jnp.sum((theta - mu1)**2) / sigma**2
        ll2 = -0.5 * jnp.sum((theta - mu2)**2) / sigma**2
        return jnp.logaddexp(ll1, ll2) - jnp.log(2.0)

    results = sample_nested(
        log_like, lambda u: u, ndim=2, nlive=400,
        key=jax.random.PRNGKey(4),
    )
    post = results['posterior']
    frac_mode1 = np.mean(np.linalg.norm(post - [0.3, 0.3], axis=1) < 0.2)
    frac_mode2 = np.mean(np.linalg.norm(post - [0.7, 0.7], axis=1) < 0.2)
    # Equal-evidence modes: both populated, roughly evenly:
    assert frac_mode1 > 0.2 and frac_mode2 > 0.2
    # Analytic evidence: 2 * (1/2) * 2 pi sigma^2 (both gaussians
    # fully inside the unit square):
    logz_true = np.log(2 * np.pi * sigma**2)
    assert abs(results['logz'] - logz_true) < 5 * results['logz_err'] + 0.2


def test_nested_three_mode_mixture():
    """Analytic 3-mode Gaussian mixture with unequal weights: the
    covariance-walk sampler must find all three modes, recover the
    total evidence within the (bootstrap) logz_err, and apportion the
    per-mode evidences to the true component weights."""
    import jax.numpy as jnp
    from pyratbay_tpu.retrieval.nested import sample_nested

    ndim = 2
    sigma = 0.02
    centers = np.array([[0.2, 0.2], [0.5, 0.8], [0.85, 0.35]])
    comp_w = np.array([0.5, 0.3, 0.2])

    def log_like(theta):
        d2 = jnp.sum((theta[None, :] - centers)**2, axis=1)
        comps = (
            jnp.log(jnp.asarray(comp_w))
            - d2 / (2 * sigma**2)
            - ndim * jnp.log(sigma * jnp.sqrt(2 * jnp.pi))
        )
        return jax.scipy.special.logsumexp(comps)

    out = sample_nested(
        log_like, lambda u: u, ndim, nlive=600,
        key=jax.random.PRNGKey(3), nsteps_walk=30,
    )
    # Z = integral over the unit square ~= 1 (all mass inside):
    assert abs(out['logz'] - 0.0) < max(3 * out['logz_err'], 0.15), (
        out['logz'], out['logz_err'])
    assert 0 < out['logz_err'] < 0.2

    # Three modes found, posterior mass near the component weights:
    nmodes = out['mode_logz'].size
    assert nmodes >= 3, f'found {nmodes} modes'
    mode_mass = np.exp(out['mode_logz'] - out['logz'])
    main3 = np.sort(mode_mass)[::-1][:3]
    np.testing.assert_allclose(
        np.sort(main3)[::-1], comp_w, atol=0.07,
    )
    # Spurious modes (if any) carry negligible mass:
    assert mode_mass[3:].sum() < 0.02


def test_nested_bootstrap_err_calibrated():
    """The bootstrap logz_err must track the actual run-to-run logZ
    scatter (within a factor), on a unimodal Gaussian with known Z."""
    import jax.numpy as jnp
    from pyratbay_tpu.retrieval.nested import sample_nested

    ndim = 2
    sigma = 0.05
    center = jnp.asarray([0.6, 0.4])

    def log_like(theta):
        d2 = jnp.sum((theta - center)**2)
        return -d2 / (2 * sigma**2) - ndim * jnp.log(
            sigma * jnp.sqrt(2 * jnp.pi))

    logzs, errs = [], []
    for seed in range(4):
        out = sample_nested(
            log_like, lambda u: u, ndim, nlive=300,
            key=jax.random.PRNGKey(seed), nsteps_walk=20,
        )
        logzs.append(out['logz'])
        errs.append(out['logz_err'])
    scatter = np.std(logzs)
    err = np.mean(errs)
    # True logZ ~= 0; every run within 4 sigma of it, and the quoted
    # error within a factor ~4 of the observed scatter:
    assert np.all(np.abs(logzs) < 4 * np.asarray(errs) + 0.1)
    assert err < 4 * scatter + 0.1
    assert scatter < 4 * err + 0.1


def test_nested_sharded_matches_single_device():
    """The mesh-sharded nested run (8 virtual devices, 'chains' axis)
    reproduces the single-device run: the sharding only distributes
    the batched likelihood, it does not touch the algorithm's
    randomness."""
    from pyratbay_tpu.parallel.sharded import make_mesh

    d = 3

    def loglike(theta):
        return -0.5 * jnp.sum(theta**2)

    def prior_transform(u):
        return 10.0 * u - 5.0

    kw = dict(
        nlive=128, max_iter=512, nsteps_walk=10, batch=16,
        key=jax.random.PRNGKey(3),
    )
    single = sample_nested(loglike, prior_transform, d, **kw)
    mesh = make_mesh(jax.devices())
    assert mesh.shape['chains'] * mesh.shape['wave'] == 8
    sharded = sample_nested(
        loglike, prior_transform, d, mesh=mesh, **kw)

    np.testing.assert_allclose(
        sharded['logz'], single['logz'], rtol=1e-10)
    np.testing.assert_allclose(
        sharded['samples'], single['samples'], rtol=1e-10)
    np.testing.assert_allclose(
        sharded['weights'], single['weights'], rtol=1e-8, atol=1e-300)
