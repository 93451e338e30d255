"""Fused emission-RT ensemble pallas kernel == the unfused XLA path
(plane_parallel_depth + plane_parallel_intensity + quadrature sum),
in the pallas interpreter.  Covers maxdepth early stop, raised rtop,
the deck blackbody-surface override, in-kernel CIA, and batch padding.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyratbay_tpu.ops.planck import blackbody_wn
from pyratbay_tpu.spectrum import rt
from pyratbay_tpu.spectrum.emission_pallas import emission_flux_ensemble


def _setup(nb=5, nlayers=40, nwave=300, seed=0):
    rng = np.random.default_rng(seed)
    radius = np.linspace(7.2e9, 7.0e9, nlayers)
    radius = np.broadcast_to(radius, (nb, nlayers)).copy()
    radius *= (1 + 0.01 * rng.standard_normal((nb, 1)))
    temp = 1200 + 500 * rng.random((nb, nlayers))
    ec = rng.lognormal(-25.0, 2.0, (nb, nlayers, nwave))
    ec *= np.exp(np.linspace(0, 10, nlayers))[None, :, None]
    wn = np.linspace(2000.0, 9000.0, nwave)
    mu, weights = rt.gauss_quadrature(5)
    return ec, radius, temp, wn, mu, weights


def _reference_one(ec, radius, temp, wn, mu, weights, maxdepth,
                   rtop, ibottom, deck_itop=None, deck_tsurf=None):
    """Model._run_emission's math for one chain."""
    depth, ideep = rt.plane_parallel_depth(
        jnp.asarray(ec), jnp.asarray(radius), maxdepth, rtop, ibottom,
    )
    bbody = blackbody_wn(jnp.asarray(wn), jnp.asarray(temp)[:, None])
    if deck_itop is not None:
        bb_surf = blackbody_wn(jnp.asarray(wn), deck_tsurf)
        bbody = bbody.at[deck_itop].set(bb_surf)
        ideep = jnp.clip(ideep, 0, deck_itop)
    intensity = rt.plane_parallel_intensity(
        depth, bbody, mu, ideep, rtop,
    )
    return jnp.sum(intensity * jnp.asarray(weights)[:, None], axis=0)


@pytest.mark.parametrize('maxdepth', [np.inf, 10.0, 1.0])
def test_emission_ensemble_matches_xla(maxdepth):
    ec, radius, temp, wn, mu, weights = _setup()
    nb, nlayers, _ = ec.shape
    ref = np.stack([
        np.asarray(_reference_one(
            ec[b], radius[b], temp[b], wn, mu, weights, maxdepth,
            0, nlayers,
        ))
        for b in range(nb)
    ])
    got = np.asarray(emission_flux_ensemble(
        [jnp.asarray(ec, jnp.float32)],
        jnp.asarray(radius), jnp.asarray(temp), wn, mu, weights,
        jnp.zeros(nb, int), jnp.full(nb, nlayers),
        maxdepth=maxdepth, interpret=True, chain_block=2,
    ))
    np.testing.assert_allclose(got, ref, rtol=5e-5)


def test_emission_ensemble_rtop_and_parts():
    ec, radius, temp, wn, mu, weights = _setup(seed=3)
    nb, nlayers, _ = ec.shape
    rtops = np.array([0, 2, 5, 1, 3])
    ref = np.stack([
        np.asarray(_reference_one(
            ec[b], radius[b], temp[b], wn, mu, weights, 8.0,
            int(rtops[b]), nlayers,
        ))
        for b in range(nb)
    ])
    # Split ec into two parts summed in-kernel:
    frac = 0.3 * ec
    got = np.asarray(emission_flux_ensemble(
        [jnp.asarray(frac, jnp.float32),
         jnp.asarray(ec - frac, jnp.float32)],
        jnp.asarray(radius), jnp.asarray(temp), wn, mu, weights,
        jnp.asarray(rtops), jnp.full(nb, nlayers),
        maxdepth=8.0, interpret=True, chain_block=2,
    ))
    np.testing.assert_allclose(got, ref, rtol=5e-5)


def test_emission_ensemble_deck():
    ec, radius, temp, wn, mu, weights = _setup(seed=5)
    nb, nlayers, _ = ec.shape
    deck_itop = np.array([25, 30, 20, 35, 28])
    deck_tsurf = np.array([1500.0, 1300.0, 1700.0, 1400.0, 1600.0])
    ref = np.stack([
        np.asarray(_reference_one(
            ec[b], radius[b], temp[b], wn, mu, weights, np.inf,
            0, int(deck_itop[b]) + 1,
            deck_itop=int(deck_itop[b]),
            deck_tsurf=float(deck_tsurf[b]),
        ))
        for b in range(nb)
    ])
    got = np.asarray(emission_flux_ensemble(
        [jnp.asarray(ec, jnp.float32)],
        jnp.asarray(radius), jnp.asarray(temp), wn, mu, weights,
        jnp.zeros(nb, int), jnp.asarray(deck_itop) + 1,
        deck_itop=jnp.asarray(deck_itop),
        deck_tsurf=jnp.asarray(deck_tsurf),
        interpret=True, chain_block=2,
    ))
    np.testing.assert_allclose(got, ref, rtol=5e-5)


def test_emission_ensemble_cia():
    ec, radius, temp, wn, mu, weights = _setup(seed=7)
    nb, nlayers, nwave = ec.shape
    rng = np.random.default_rng(11)
    kdim = 6
    cia_w = rng.lognormal(-28.0, 1.0, (nb, nlayers, kdim))
    cia_tab = rng.lognormal(0.0, 1.0, (kdim, nwave))
    cia_ec = np.einsum('blk,kw->blw', cia_w, cia_tab)
    ref = np.stack([
        np.asarray(_reference_one(
            ec[b] + cia_ec[b], radius[b], temp[b], wn, mu, weights,
            5.0, 0, nlayers,
        ))
        for b in range(nb)
    ])
    got = np.asarray(emission_flux_ensemble(
        [jnp.asarray(ec, jnp.float32)],
        jnp.asarray(radius), jnp.asarray(temp), wn, mu, weights,
        jnp.zeros(nb, int), jnp.full(nb, nlayers),
        cia_w=jnp.asarray(cia_w, jnp.float32),
        cia_tab=np.asarray(cia_tab, np.float32),
        maxdepth=5.0, interpret=True, chain_block=2,
    ))
    np.testing.assert_allclose(got, ref, rtol=2e-4)


def test_emission_ensemble_inkernel_line_sample():
    """In-kernel line-sample contraction == adding the einsum'd
    contribution as an ec part."""
    ec, radius, temp, wn, mu, weights = _setup(seed=13)
    nb, nlayers, nwave = ec.shape
    rng = np.random.default_rng(17)
    K = 6
    ls_w = rng.lognormal(-2.0, 1.0, (nb, K, nlayers))
    ls_tab = rng.lognormal(-24.0, 1.5, (K, nlayers, nwave))
    ls_ec = np.einsum('bkl,klw->blw', ls_w, ls_tab)

    common = dict(
        mu=mu, weights=weights, maxdepth=6.0, interpret=True,
        chain_block=2,
    )
    ref = np.asarray(emission_flux_ensemble(
        [jnp.asarray(ec + ls_ec, jnp.float32)],
        jnp.asarray(radius), jnp.asarray(temp), wn,
        itop=jnp.zeros(nb, int), ibottom=jnp.full(nb, nlayers),
        **common,
    ))
    got = np.asarray(emission_flux_ensemble(
        [jnp.asarray(ec, jnp.float32)],
        jnp.asarray(radius), jnp.asarray(temp), wn,
        itop=jnp.zeros(nb, int), ibottom=jnp.full(nb, nlayers),
        ls_w=jnp.asarray(ls_w[..., None], jnp.float32),
        ls_tab=np.asarray(ls_tab, np.float32),
        **common,
    ))
    np.testing.assert_allclose(got, ref, rtol=2e-4)


def test_emission_ensemble_lbw_parts():
    """Layer-major [l, B, w] parts == the same contribution as a
    [B, l, w] part (the no-layout-copy einsum route, emission)."""
    ec, radius, temp, wn, mu, weights = _setup(seed=31)
    nb, nlayers, nwave = ec.shape
    extra = 0.4 * ec
    common = dict(
        mu=mu, weights=weights, maxdepth=6.0, interpret=True,
        chain_block=2,
    )
    ref = np.asarray(emission_flux_ensemble(
        [jnp.asarray(ec + extra, jnp.float32)],
        jnp.asarray(radius), jnp.asarray(temp), wn,
        itop=jnp.zeros(nb, int), ibottom=jnp.full(nb, nlayers),
        **common,
    ))
    got = np.asarray(emission_flux_ensemble(
        [jnp.asarray(ec, jnp.float32)],
        jnp.asarray(radius), jnp.asarray(temp), wn,
        itop=jnp.zeros(nb, int), ibottom=jnp.full(nb, nlayers),
        ec_parts_lbw=[jnp.asarray(
            np.moveaxis(extra, 0, 1), jnp.float32)],
        **common,
    ))
    np.testing.assert_allclose(got, ref, rtol=5e-5)


def test_emission_ensemble_rank1_parts():
    """Rank-1 parts == the dense outer product (emission kernel)."""
    ec, radius, temp, wn, mu, weights = _setup(seed=41)
    nb, nlayers, nwave = ec.shape
    rng = np.random.default_rng(43)
    cols = rng.lognormal(-24.0, 1.0, (nb, 2, nlayers))
    rows = rng.lognormal(0.0, 1.0, (nb, 2, nwave))
    dense = np.einsum('brl,brw->blw', cols, rows)
    common = dict(
        mu=mu, weights=weights, maxdepth=6.0, interpret=True,
        chain_block=2,
    )
    ref = np.asarray(emission_flux_ensemble(
        [jnp.asarray(ec + dense, jnp.float32)],
        jnp.asarray(radius), jnp.asarray(temp), wn,
        itop=jnp.zeros(nb, int), ibottom=jnp.full(nb, nlayers),
        **common,
    ))
    got = np.asarray(emission_flux_ensemble(
        [jnp.asarray(ec, jnp.float32)],
        jnp.asarray(radius), jnp.asarray(temp), wn,
        itop=jnp.zeros(nb, int), ibottom=jnp.full(nb, nlayers),
        r1_cols=jnp.asarray(cols[..., None], jnp.float32),
        r1_rows=jnp.asarray(rows[:, :, None, :], jnp.float32),
        **common,
    ))
    np.testing.assert_allclose(got, ref, rtol=5e-5)
