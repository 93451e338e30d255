"""Contribution-function parity: band-averaged transmittances (transit)
and contribution functions (emission) against the reference's
band_contribution run live on shipped inputs (pyrat_obj.py:671-696,
spectrum/contribution_funcs.py).

The configs use only shipped data (Borysow CIA files, WFC3 filter
files, alkali/cloud models) over the full 1.1-1.7 um range -- no
downloaded opacity tables needed.
"""
import os

import numpy as np
import pytest

import refrunner
from test_ref_parity import _write_cfg, _ref_run, CACHE

TRANSMISSION = '{}tests/configs/spectrum_transmission_test.cfg'
EMISSION = '{}tests/configs/spectrum_emission_test.cfg'

FILTERS = '\n'.join(
    f'{{ROOT}}tests/filters/filter_test_WFC3_G141_{wl}um.dat'
    for wl in (
        '1.133', '1.158', '1.183', '1.209', '1.235', '1.260', '1.285',
        '1.310', '1.336', '1.361', '1.387', '1.413', '1.438', '1.464',
        '1.489', '1.515', '1.540', '1.565', '1.591', '1.616',
    )
)

_POST_BAND_CF = '''
out['band_cf'] = np.asarray(result.band_contribution())
'''


@pytest.fixture(scope='session')
def ref_root():
    dest = refrunner.build_reference()
    if dest is None:
        pytest.skip('reference build unavailable (no toolchain?)')
    os.makedirs(CACHE, exist_ok=True)
    return dest + '/'


def _band_cf_compare(name, ref_root, base_cfg, reset={}, remove=[]):
    from pyratbay_tpu.model import Model
    from pyratbay_tpu.observation import Observation

    reset = {
        'logfile': f'{{ROOT}}tests/outputs/{name}.log',
        'filters': FILTERS,
        **reset,
    }
    cfg = _write_cfg(
        name, base_cfg.format(ref_root), reset=reset, remove=remove,
    )
    ref = _ref_run(name, cfg, post=_POST_BAND_CF)

    model = Model(cfg, root=ref_root)
    result = model.run()
    obs = Observation(model.cfg, model.wn, root=ref_root)
    band_cf = model.band_contribution(obs)

    np.testing.assert_allclose(model.spectrum, ref['spectrum'], rtol=1e-4)
    assert band_cf.shape == ref['band_cf'].shape
    np.testing.assert_allclose(
        band_cf, ref['band_cf'], rtol=1e-4, atol=1e-6,
    )
    return model, obs, result, ref


def test_band_transmittance_transit(ref_root):
    """Transit band transmittances == reference (CIA+alkali+clouds)."""
    _band_cf_compare(
        'cf_transit', ref_root, TRANSMISSION,
        remove=['sampled_cross_sec'],
    )


def test_band_transmittance_patchy(ref_root):
    """Patchy transit: fpatchy-mixed transmittance + the clear/cloudy
    component spectra match the reference split
    (pyrat/spectrum.py:351-409)."""
    model, obs, result, ref = _band_cf_compare(
        'cf_patchy', ref_root, TRANSMISSION,
        reset={
            'fpatchy': '0.3',
            'clouds': 'deck -3.0\nlecavelier 10.0 -15.0',
        },
        remove=['sampled_cross_sec'],
    )
    assert model.clear is not None and model.cloudy is not None
    np.testing.assert_allclose(model.clear, ref['clear'], rtol=1e-4)
    np.testing.assert_allclose(model.cloudy, ref['cloudy'], rtol=1e-4)
    np.testing.assert_allclose(
        model.spectrum, 0.3 * model.cloudy + 0.7 * model.clear,
        rtol=1e-10,
    )


def test_band_contribution_emission(ref_root):
    """Emission band contribution functions == reference
    (Knutson et al. 2009 CF, max-normalized per band)."""
    _band_cf_compare(
        'cf_emission', ref_root, EMISSION,
        remove=['sampled_cross_sec'],
    )


def test_band_contribution_from_forward_result(ref_root):
    """band_contribution(result=forward(p)) == band_contribution() from
    the stored run state (the retrieval post-processing path)."""
    from pyratbay_tpu.model import Model
    from pyratbay_tpu.observation import Observation
    from pyratbay_tpu.retrieval.forward import build_forward

    cfg = _write_cfg(
        'cf_fwd', TRANSMISSION.format(ref_root),
        reset={
            'logfile': '{ROOT}tests/outputs/cf_fwd.log',
            'filters': FILTERS,
        },
        remove=['sampled_cross_sec'],
    )
    model = Model(cfg, root=ref_root)
    model.run()
    obs = Observation(model.cfg, model.wn, root=ref_root)
    cf_run = model.band_contribution(obs)

    forward = build_forward(model, obs)
    out = forward()
    cf_fwd = model.band_contribution(obs, result=out)
    np.testing.assert_allclose(cf_fwd, cf_run, rtol=1e-8)
