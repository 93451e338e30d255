"""Fused transit-RT pallas kernel == the unfused XLA path
(transit_depth + transmission_spectrum), in the pallas interpreter.
Covers the deck splice, maxdepth early stop, and raised itop.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyratbay_tpu.atmosphere.geometry import transit_path_matrix
from pyratbay_tpu.spectrum import rt
from pyratbay_tpu.spectrum.rt_pallas import transit_spectrum_fused


def _setup(nlayers=51, nwave=300, seed=0, ec_scale=1.0):
    rng = np.random.default_rng(seed)
    radius = np.linspace(1.10, 1.00, nlayers)   # top -> bottom
    ec = ec_scale * rng.lognormal(-3.0, 2.0, (nlayers, nwave))
    ec *= np.exp(np.linspace(0, 8, nlayers))[:, None]  # denser below
    return jnp.asarray(ec), jnp.asarray(radius)


def _reference(ec, radius, rstar, itop, ibottom, maxdepth,
               deck_itop=None, deck_rsurf=None):
    path = transit_path_matrix(radius, itop)
    depth, ideep = rt.transit_depth(ec, path, maxdepth, itop, ibottom)
    return rt.transmission_spectrum(
        depth, ideep, radius, rstar, itop,
        deck_rsurf=deck_rsurf, deck_itop=deck_itop,
    )


def _fused(ec, radius, rstar, itop, ibottom, maxdepth,
           deck_itop=None, deck_rsurf=None):
    path = transit_path_matrix(radius, itop)
    return transit_spectrum_fused(
        ec, path, radius, rstar, itop, ibottom,
        deck_itop=deck_itop, deck_rsurf=deck_rsurf,
        maxdepth=maxdepth, interpret=True,
    )


@pytest.mark.parametrize('maxdepth', [np.inf, 10.0, 1.0])
def test_fused_matches_xla(maxdepth):
    ec, radius = _setup()
    rstar = 12.0
    ref = np.asarray(_reference(ec, radius, rstar, 0, 51, maxdepth))
    got = np.asarray(_fused(ec, radius, rstar, 0, 51, maxdepth))
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_fused_deck_splice():
    ec, radius = _setup(seed=1)
    rstar = 12.0
    deck_itop = jnp.asarray(30)
    deck_rsurf = jnp.asarray(float(radius[30]) + 0.4 * (
        float(radius[29]) - float(radius[30])))
    ref = np.asarray(_reference(
        ec, radius, rstar, 0, 31, 10.0,
        deck_itop=deck_itop, deck_rsurf=deck_rsurf,
    ))
    got = np.asarray(_fused(
        ec, radius, rstar, 0, 31, 10.0,
        deck_itop=deck_itop, deck_rsurf=deck_rsurf,
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-12)
    # and the splice actually changes the answer:
    base = np.asarray(_fused(ec, radius, rstar, 0, 51, 10.0))
    assert not np.allclose(got, base)


def test_fused_raised_itop():
    ec, radius = _setup(seed=2)
    ref = np.asarray(_reference(ec, radius, 12.0, 3, 51, 10.0))
    got = np.asarray(_fused(ec, radius, 12.0, 3, 51, 10.0))
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_fused_traced_deck_inactive():
    # deck above itop (apply False): the splice must be a no-op.
    ec, radius = _setup(seed=3)
    ref = np.asarray(_reference(ec, radius, 12.0, 5, 51, 10.0))
    got = np.asarray(_fused(
        ec, radius, 12.0, 5, 51, 10.0,
        deck_itop=jnp.asarray(2), deck_rsurf=jnp.asarray(1.12),
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-12)
