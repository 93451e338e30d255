"""Pallas wing-pass kernel vs the XLA wing path (interpret mode).

The kernel itself (opacity/lbl_pallas.py) runs on TPU; these tests
exercise the identical program through the pallas interpreter on CPU
and pin it against (a) a pure-numpy evaluation of the wing series and
(b) the integrated XLA DirectLBL path, including the vmap-over-chains
batching that the jitted retrieval forward applies on top.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyratbay_tpu.opacity.lbl_pallas import wing_sigma
from pyratbay_tpu.opacity.lbl_tpu import DirectLBL


def _synthetic_lines(nlines=3000, seed=0):
    """Small synthetic H2O-like line list (same layout as bench.py)."""
    rng = np.random.default_rng(seed)

    class _Lines:
        wn = np.arange(5882.0, 9091.0, 1.0)
        lwn = np.sort(rng.uniform(5800.0, 9200.0, nlines))
        gf = rng.lognormal(-8, 3, nlines)
        elow = rng.uniform(0, 15000, nlines)
        isoid = rng.integers(0, 4, nlines)
        iso_mass = np.array([18.011, 20.015, 19.015, 19.017])
        iso_ratio = np.array([0.997, 2e-3, 3.7e-4, 3.1e-4])
        iso_spec_index = np.zeros(4, int)
        iso_atm_index = np.full(4, 5)
        nspec = 1
        mol_radius = np.array(
            [1.445, 1.4, 1.1, 2.2, 2.8, 1.6, 2.0, 1.9, 1.97]) * 1e-8
        mol_mass = np.array(
            [2.016, 4.003, 1.008, 22.99, 39.098, 18.015, 16.04,
             28.01, 44.01])
        cutoff = 25.0
        tmin = 100.0
        tmax = 3000.0

        @staticmethod
        def iso_pf(t):
            t = np.atleast_1d(t)
            return np.tile(174.0 * (t / 296.0)**1.5, (4, 1))

    return _Lines()


def test_wing_sigma_vs_numpy():
    ntiles, tile, lmax, ncell = 4, 128, 52, 2
    rng = np.random.default_rng(0)
    wn = np.sort(rng.uniform(5000, 5100, ntiles * tile))
    wn = wn.reshape(ntiles, tile)
    wnh = wn.astype(np.float32).astype(np.float64)
    wnl = wn - wnh
    lw = np.tile(np.sort(rng.uniform(4990, 5110, lmax)), (ntiles, 1))
    lwh = lw.astype(np.float32).astype(np.float64)
    lwl = lw - lwh
    c1 = rng.uniform(0.1, 1.0, (ncell, ntiles, lmax))
    y2 = rng.uniform(1e-4, 1.0, (ncell, ntiles, lmax))
    iad = rng.uniform(0.5, 5.0, (ncell, ntiles, lmax))
    margin, cutoff = 0.05, 25.0

    out = np.asarray(wing_sigma(
        jnp.asarray(wnh), jnp.asarray(wnl),
        jnp.asarray(lwh), jnp.asarray(lwl),
        jnp.asarray(c1), jnp.asarray(y2), jnp.asarray(iad),
        margin=margin, cutoff=cutoff, interpret=True,
    ))

    dwn = (
        (wnh[None, :, :, None] - lwh[None, :, None, :])
        + (wnl[None, :, :, None] - lwl[None, :, None, :])
    )
    x2 = (dwn * iad[:, :, None, :])**2
    u = 1.0 / (x2 + y2[:, :, None, :])
    a = x2 * u
    from pyratbay_tpu.opacity.lbl_tpu import _wing_series
    s = np.asarray(_wing_series(u, a))
    mask = (np.abs(dwn) > margin) & (np.abs(dwn) <= cutoff)
    ref = np.where(mask, c1[:, :, None, :] * u * s, 0.0).sum(axis=3)

    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-300)


@pytest.fixture(scope='module')
def cell_inputs():
    lines = _synthetic_lines(nlines=3000)
    block = 3
    temps = np.linspace(700.0, 2900.0, block)
    vmr = np.array(
        [0.85, 0.149, 1e-6, 3e-6, 5e-8, 4e-4, 1e-4, 5e-4, 1e-7])
    dens = vmr[None, :] * (
        np.logspace(-4, 1, block)[:, None] * 1.01e6
        / (1.380649e-16 * temps[:, None])
    )
    pf = lines.iso_pf(temps).T
    return lines, temps, dens, pf


def test_cross_section_batch_pallas_vs_xla(cell_inputs):
    lines, temps, dens, pf = cell_inputs
    d_x = DirectLBL(lines, tile=128, use_pallas=False)
    d_p = DirectLBL(lines, tile=128, use_pallas='interpret')
    args = (jnp.asarray(temps), jnp.asarray(dens), jnp.asarray(pf))
    sx = np.asarray(d_x._cross_section_batch(d_x.tables(), *args))
    sp = np.asarray(d_p._cross_section_batch(d_p.tables(), *args))
    mask = np.abs(sx) > 1e-6 * np.abs(sx).max()
    rel = np.abs(sp - sx) / (np.abs(sx) + 1e-300)
    assert rel[mask].max() < 1e-12


def test_extinction_fn_pallas_under_vmap(cell_inputs):
    """vmap over chains of the pallas-wing extinction (the retrieval
    forward's batching) matches the XLA path."""
    lines, temps, dens, pf = cell_inputs
    d_x = DirectLBL(lines, tile=128, use_pallas=False)
    d_p = DirectLBL(lines, tile=128, use_pallas='interpret')
    ec_x = d_x.extinction_fn()
    ec_p = d_p.extinction_fn()
    t2 = jnp.asarray(np.stack([temps, temps + 25.0]))
    de2 = jnp.asarray(np.stack([dens, 1.1 * dens]))
    ex = np.asarray(jax.vmap(ec_x)(t2, de2))
    ep = np.asarray(jax.vmap(ec_p)(t2, de2))
    mask = np.abs(ex) > 1e-6 * np.abs(ex).max()
    rel = np.abs(ep - ex) / (np.abs(ex) + 1e-300)
    assert rel[mask].max() < 1e-12


def test_tabulate_pallas_vs_xla(cell_inputs):
    lines, temps, dens, pf = cell_inputs
    d_x = DirectLBL(lines, tile=128, use_pallas=False)
    d_p = DirectLBL(lines, tile=128, use_pallas='interpret')
    press = np.logspace(-4, 1, 4)
    tab_t = np.array([500.0, 1500.0])
    vmr_prof = np.tile(np.array(
        [0.85, 0.149, 1e-6, 3e-6, 5e-8, 4e-4, 1e-4, 5e-4, 1e-7]),
        (4, 1))
    tx = d_x.tabulate(tab_t, press, vmr_prof, block=4)
    tp = d_p.tabulate(tab_t, press, vmr_prof, block=4)
    mask = np.abs(tx) > 1e-6 * np.abs(tx).max()
    rel = np.abs(tp - tx) / (np.abs(tx) + 1e-300)
    assert rel[mask].max() < 1e-12


def test_multispecies_pallas_vs_xla():
    """nspec > 1 splits per species through the one-hot contraction."""
    lines = _synthetic_lines(nlines=2000)
    lines.iso_spec_index = np.array([0, 0, 1, 1])
    lines.iso_atm_index = np.array([5, 5, 6, 6])
    lines.nspec = 2
    d_x = DirectLBL(lines, tile=128, use_pallas=False)
    d_p = DirectLBL(lines, tile=128, use_pallas='interpret')
    temps = np.array([800.0, 2400.0])
    vmr = np.array(
        [0.85, 0.149, 1e-6, 3e-6, 5e-8, 4e-4, 1e-4, 5e-4, 1e-7])
    dens = vmr[None, :] * (
        np.array([[1e4], [1e6]]) / (1.380649e-16 * temps[:, None])
    )
    pf = lines.iso_pf(temps).T
    args = (jnp.asarray(temps), jnp.asarray(dens), jnp.asarray(pf))
    sx = np.asarray(d_x._cross_section_batch(d_x.tables(), *args))
    sp = np.asarray(d_p._cross_section_batch(d_p.tables(), *args))
    assert sx.shape == sp.shape == (2, 2, d_x.nwave)
    # The two species differ (different line subsets, different
    # isotopic abundances):
    diff = np.abs(sx[:, 0] - sx[:, 1]).max()
    assert diff > 0.1 * np.abs(sx).max()
    mask = np.abs(sx) > 1e-6 * np.abs(sx).max()
    rel = np.abs(sp - sx) / (np.abs(sx) + 1e-300)
    assert rel[mask].max() < 1e-12


def test_pallas_mode_defaults():
    lines = _synthetic_lines(nlines=200)
    d = DirectLBL(lines)
    # CPU backend in tests: the auto mode must stay on the XLA path.
    assert d._pallas_mode() is False
    d.use_pallas = True
    assert d._pallas_mode() is True
