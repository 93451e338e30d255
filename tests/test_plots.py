"""Plot-function smoke tests (Agg backend, file outputs).

The reference exercises its plots through the retrieval post-run flow;
these call each pyratbay_tpu.plots function standalone and assert a
non-empty figure file is written (reference pyratbay/plots/plots.py).
"""
import os

import matplotlib
matplotlib.use('Agg')

import numpy as np
import pytest

from pyratbay_tpu import plots


@pytest.fixture
def outdir(tmp_path):
    return tmp_path


def _check(path):
    assert os.path.isfile(path) and os.path.getsize(path) > 1000


def test_plot_spectrum(outdir):
    wl = np.linspace(0.5, 5.0, 200)
    spec = 0.01 + 1e-4 * np.sin(wl * 3)
    fname = str(outdir / 'spec.png')
    ax = plots.spectrum(
        spec, wl, rt_path='transit',
        data=0.01 + 1e-4 * np.cos(np.linspace(1, 4, 8)),
        uncert=np.full(8, 5e-5),
        band_wl=np.linspace(1.0, 4.0, 8),
        bandflux=0.01 + 1e-4 * np.cos(np.linspace(1, 4, 8)),
        filename=fname,
    )
    assert ax is not None
    _check(fname)


def test_plot_spectrum_eclipse_units(outdir):
    wl = np.linspace(1.0, 10.0, 100)
    fname = str(outdir / 'eclipse.png')
    plots.spectrum(1e-3 * np.ones(100), wl, rt_path='eclipse',
                   filename=fname)
    _check(fname)


def test_plot_temperature_with_bounds(outdir):
    press = np.logspace(-6, 2, 30)
    prof = 1200 + 200 * np.tanh(np.linspace(-2, 2, 30))
    fname = str(outdir / 'temp.png')
    plots.temperature(
        press, profiles=[prof, prof + 50], labels=['median', 'best'],
        bounds=(prof - 100, prof + 100, prof - 200, prof + 200),
        filename=fname,
    )
    _check(fname)


def test_plot_abundance(outdir):
    press = np.logspace(-6, 2, 30)
    vmr = np.abs(np.random.default_rng(0).lognormal(-8, 2, (30, 4)))
    fname = str(outdir / 'vmr.png')
    plots.abundance(vmr, press, ['H2O', 'CO', 'CO2', 'CH4'],
                    filename=fname)
    _check(fname)


def test_plot_contribution(outdir):
    press = np.logspace(-6, 2, 30)
    wl = np.linspace(1.0, 5.0, 50)
    cf = np.exp(
        -0.5 * (np.log10(press)[:, None] + 2
                - np.sin(wl)[None, :])**2
    )
    fname = str(outdir / 'cf.png')
    plots.contribution(cf, wl, press, filename=fname)
    _check(fname)


def test_plot_posteriors_pairgrid(outdir):
    rng = np.random.default_rng(1)
    post = rng.multivariate_normal(
        [0.0, 1.0, -2.0],
        [[1.0, 0.5, 0.0], [0.5, 1.0, 0.2], [0.0, 0.2, 0.5]],
        size=2000,
    )
    fname = str(outdir / 'corner.png')
    axes = plots.posteriors(
        post, pnames=['a', 'b', 'c'], bestp=[0.0, 1.0, -2.0],
        filename=fname,
    )
    assert len(axes) == 3
    _check(fname)


def test_alphatize():
    out = plots.alphatize(['red', 'blue'], alpha=0.5)
    assert len(out) == 2


def test_plot_themes_registry():
    from pyratbay_tpu import plots
    for name in ('blue', 'green', 'orange', 'red', 'black', 'indigo'):
        thm = plots.get_theme(name)
        assert thm.colormap is not None
        assert len(thm.light_color) == 3
    # Arbitrary colors and passthrough also resolve:
    assert plots.get_theme('crimson').color == 'crimson'
    thm = plots.THEMES['blue']
    assert plots.get_theme(thm) is thm
    assert plots.get_theme(None) is plots.THEMES['blue']


def test_plot_spectrum_band_overlay(tmp_path):
    from pyratbay_tpu import plots
    rng = np.random.default_rng(0)
    wl = np.linspace(1.1, 1.7, 200)
    spec = 0.0065 + 1e-4 * rng.standard_normal(200)
    bands = [
        (np.linspace(c - 0.02, c + 0.02, 30),
         np.exp(-np.linspace(-2, 2, 30)**2))
        for c in (1.2, 1.3, 1.4)
    ]
    fname = str(tmp_path / 'spec_bands.png')
    ax = plots.spectrum(
        spec, wl, rt_path='transit', bands=bands, units='ppm',
        theme='orange', filename=fname,
    )
    assert os.path.getsize(fname) > 0
    assert 'ppm' in ax.get_ylabel()


def test_plot_posteriors_themed(tmp_path):
    from pyratbay_tpu import plots
    rng = np.random.default_rng(1)
    post = rng.multivariate_normal(
        [0.0, 1.0, -2.0],
        [[1.0, 0.5, 0.0], [0.5, 1.0, 0.2], [0.0, 0.2, 0.5]],
        size=3000,
    )
    fname = str(tmp_path / 'post_themed.png')
    axes = plots.posteriors(
        post, pnames=['a', 'b', 'c'], bestp=[0.0, 1.0, -2.0],
        theme='green', filename=fname,
    )
    assert os.path.getsize(fname) > 0
    assert axes.shape == (3, 3)
