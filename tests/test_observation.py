"""Observation data machinery: offsets, error scaling, posterior
utilities, and model persistence."""
import numpy as np
import jax.numpy as jnp
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from pyratbay_tpu.observation import Observation


class _Cfg:
    data = None
    uncert = None
    obsfile = None
    dunits = 'none'
    offset_inst = 'offset_blue offset_red'
    uncert_scaling = 'err_scale_blue err_quad_red'
    filters = None


def make_obs():
    cfg = _Cfg()
    cfg.filters = [
        'tophat 1.10 0.02', 'tophat 1.15 0.02',   # -> names 'tophat'
    ]
    # Name the filters per instrument by monkeypatching after creation:
    wn = np.linspace(1e4 / 1.3, 1e4 / 1.0, 500)
    obs = Observation.__new__(Observation)
    from pyratbay_tpu.spectrum.passbands import Tophat, band_matrix
    obs.filters = [
        Tophat(1.10, 0.02, name='blue_1', wn=wn),
        Tophat(1.15, 0.02, name='blue_2', wn=wn),
        Tophat(1.25, 0.02, name='red_1', wn=wn),
    ]
    obs.nbands = 3
    obs._band_matrix = band_matrix(obs.filters, len(wn))
    obs.data = np.array([1.0, 2.0, 3.0])
    obs.uncert = np.array([0.1, 0.1, 0.2])
    obs.offset_inst = ['offset_blue', 'offset_red']
    obs.uncert_scaling = ['err_scale_blue', 'err_quad_red']
    obs.units_scale = 1.0
    obs._offset_masks = [
        np.array(['blue' in b.name for b in obs.filters]),
        np.array(['red' in b.name for b in obs.filters]),
    ]
    obs._err_masks = list(obs._offset_masks)
    obs._err_modes = ['scale', 'quadrature']
    return obs


def test_offset_data():
    obs = make_obs()
    shifted = np.asarray(obs.offset_data(jnp.asarray([0.5, -1.0])))
    np.testing.assert_allclose(shifted, [1.5, 2.5, 2.0])


def test_scale_uncert():
    obs = make_obs()
    scaled = np.asarray(obs.scale_uncert(jnp.asarray([1.0, -1.0])))
    # blue: sigma * 10**1; red: sqrt(0.2^2 + 0.1^2):
    np.testing.assert_allclose(
        scaled, [1.0, 1.0, np.sqrt(0.04 + 0.01)], rtol=1e-12,
    )


def test_posterior_utilities():
    from pyratbay_tpu.retrieval import (
        weighted_to_equal, marginal_statistics, temperature_posterior,
    )
    rng = np.random.default_rng(0)
    samples = rng.normal(0, 1, (5000, 2))
    weights = np.exp(-0.5 * samples[:, 0]**2)
    equal = weighted_to_equal(samples, weights)
    assert equal.shape == samples.shape
    # Re-weighting by a gaussian narrows the first marginal:
    assert np.std(equal[:, 0]) < np.std(samples[:, 0])

    quants = marginal_statistics(samples)
    assert quants.shape == (3, 2)
    np.testing.assert_allclose(quants[1], np.median(samples, 0))

    from pyratbay_tpu.atmosphere.profiles import isothermal_tp
    press = np.logspace(-6, 2, 11)
    tmodel = isothermal_tp(press)
    posterior = rng.normal(1500.0, 10.0, (200, 1))
    med, lo1, hi1, lo2, hi2 = temperature_posterior(posterior, tmodel)
    assert np.all(lo2 <= lo1) and np.all(lo1 <= med)
    assert np.all(med <= hi1) and np.all(hi1 <= hi2)
    assert abs(med[0] - 1500.0) < 5.0


@requires_reference
def test_model_save_load(tmp_path):
    import configparser
    from pyratbay_tpu.model import Model
    from pyratbay_tpu.io import save_model, load_model
    ini = configparser.ConfigParser()
    ini.optionxform = str
    ini.read(REFERENCE_ROOT + 'tests/configs/spectrum_transmission_test.cfg')
    for key in ('sampled_cross_sec', 'continuum_cross_sec', 'alkali',
                'clouds'):
        ini.remove_option('pyrat', key)
    cfg = str(tmp_path / 'save.cfg')
    with open(cfg, 'w') as f:
        ini.write(f)
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    pkl = str(tmp_path / 'model.pkl')
    save_model(model, pkl)
    model2 = load_model(pkl)
    np.testing.assert_allclose(model2.spectrum, model.spectrum)
    assert model2.nwave == model.nwave
