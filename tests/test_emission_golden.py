"""Golden-file parity: emission and eclipse spectra vs reference
expected arrays (rtol = 1e-4).
"""
import numpy as np

from conftest import requires_reference, REFERENCE_ROOT
from test_forward_golden import make_config

from pyratbay_tpu.model import Model
from pyratbay_tpu.spectrum.starspec import bbflux

CONFIGS = REFERENCE_ROOT + 'tests/configs/'
EXPECTED = REFERENCE_ROOT + 'tests/expected/'
RTOL = 1e-4
EMISSION_CFG = CONFIGS + 'spectrum_emission_test.cfg'
ECLIPSE_CFG = CONFIGS + 'spectrum_eclipse_test.cfg'


def expected_spectrum(mode, key):
    return np.load(
        f'{EXPECTED}expected_spectrum_{mode}_{key}_test.npz'
    )['arr_0']


@requires_reference
def test_emission_clear(tmp_path):
    cfg = make_config(
        tmp_path, EMISSION_CFG,
        remove=['sampled_cross_sec', 'continuum_cross_sec', 'alkali',
                'clouds'],
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    want = np.asarray(bbflux(model.wn, model.temp[-1]))
    np.testing.assert_allclose(model.spectrum, want, rtol=RTOL)


@requires_reference
def test_emission_lecavelier(tmp_path):
    cfg = make_config(
        tmp_path, EMISSION_CFG,
        remove=['sampled_cross_sec', 'continuum_cross_sec', 'alkali'],
        reset={'clouds': 'lecavelier 2.0 -4.0'},
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    np.testing.assert_allclose(
        model.spectrum, expected_spectrum('emission', 'lec'), rtol=RTOL)


@requires_reference
def test_emission_cia(tmp_path):
    cfg = make_config(
        tmp_path, EMISSION_CFG,
        remove=['sampled_cross_sec', 'alkali', 'clouds'],
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    np.testing.assert_allclose(
        model.spectrum, expected_spectrum('emission', 'cia'), rtol=RTOL)


@requires_reference
def test_emission_alkali(tmp_path):
    cfg = make_config(
        tmp_path, EMISSION_CFG,
        remove=['sampled_cross_sec', 'continuum_cross_sec', 'clouds'],
        reset={'wl_low': '0.45 um', 'wl_high': '1.0 um'},
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    np.testing.assert_allclose(
        model.spectrum, expected_spectrum('emission', 'alkali'), rtol=RTOL)


@requires_reference
def test_emission_deck(tmp_path):
    cfg = make_config(
        tmp_path, EMISSION_CFG,
        remove=['sampled_cross_sec', 'continuum_cross_sec', 'alkali'],
        reset={'clouds': 'deck -3.0'},
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    result = model.run()
    np.testing.assert_allclose(
        model.spectrum, expected_spectrum('emission', 'deck'), rtol=RTOL)
    # Deck spectrum is the blackbody at the cloud-top temperature:
    deck = [m for t, m, _ in model.opacity_models if m.name == 'deck'][0]
    _, _, tsurf = deck.surface(
        np.asarray(model.radius), np.asarray(model.temp),
        np.asarray(deck.pars),
    )
    want = np.asarray(bbflux(model.wn, float(tsurf)))
    np.testing.assert_allclose(model.spectrum, want, rtol=RTOL)


@requires_reference
def test_eclipse_clear(tmp_path):
    cfg = make_config(
        tmp_path, ECLIPSE_CFG,
        remove=['sampled_cross_sec', 'continuum_cross_sec', 'alkali',
                'clouds'],
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    want = (
        np.asarray(bbflux(model.wn, model.temp[-1]))
        / model.starflux * (model.rplanet / model.rstar)**2
    )
    np.testing.assert_allclose(model.spectrum, want, rtol=RTOL)


@requires_reference
def test_eclipse_cia(tmp_path):
    cfg = make_config(
        tmp_path, ECLIPSE_CFG,
        remove=['sampled_cross_sec', 'alkali', 'clouds'],
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    np.testing.assert_allclose(
        model.spectrum, expected_spectrum('eclipse', 'cia'), rtol=RTOL)


@requires_reference
def test_eclipse_deck(tmp_path):
    cfg = make_config(
        tmp_path, ECLIPSE_CFG,
        remove=['sampled_cross_sec', 'continuum_cross_sec', 'alkali'],
        reset={'clouds': 'deck -1.0'},
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    np.testing.assert_allclose(
        model.spectrum, expected_spectrum('eclipse', 'deck'), rtol=RTOL)


@requires_reference
def test_emission_two_stream_consistency(tmp_path):
    """Two-stream flux at tau=0 approximates the intensity-quadrature
    flux for a clear isothermal-deep atmosphere (physics sanity)."""
    cfg = make_config(
        tmp_path, EMISSION_CFG,
        remove=['sampled_cross_sec', 'alkali', 'clouds'],
        reset={'rt_path': 'emission_two_stream'},
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    result = model.run()
    flux_up = np.asarray(result['flux_up'])
    flux_down = np.asarray(result['flux_down'])
    assert flux_up.shape == (model.nlayers, model.nwave)
    assert np.all(np.isfinite(flux_up)) and np.all(np.isfinite(flux_down))
    # No irradiation: downward flux at the top must be zero:
    np.testing.assert_allclose(flux_down[0], 0.0)
    # Deep atmosphere: upward flux approaches pi*B(T_bottom):
    want = np.asarray(bbflux(model.wn, model.temp[-1]))
    np.testing.assert_allclose(flux_up[-1], want, rtol=0.05)
