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


@requires_reference
def test_hires_channel(tmp_path):
    """High-res channel: instrumental convolution + RV shift +
    interpolation inside the jitted forward and likelihood."""
    import jax
    import jax.numpy as jnp
    import scipy.interpolate as si
    from pyratbay_tpu.benchmark import make_flagship
    from pyratbay_tpu.io import io as pio
    from pyratbay_tpu.observation import Observation
    from pyratbay_tpu.retrieval import (
        RetrievalParams, build_forward, build_log_posterior,
    )
    from pyratbay_tpu.spectrum.hires import inst_convolution, rv_shift

    workdir = str(tmp_path / 'flag')
    model, obs0, ret0, fwd0, p0 = make_flagship(
        workdir, nlayers=21, wl_low=1.1, wl_high=1.3, wnstep=2.0,
    )
    # High-res observation file: 40 points across the window:
    wl_hires = np.linspace(1.15, 1.25, 40)
    hires_file = workdir + '/hires_obs.dat'
    pio.write_observations(
        hires_file,
        np.full(40, 0.0066), np.full(40, 1e-5),
        [f'{wl:.6f} 0.0001 HIRES' for wl in wl_hires],
    )
    cfg = model.cfg
    cfg.obsfile_hires = hires_file
    cfg.inst_resolution = 20000.0
    cfg.retrieval_params = cfg.retrieval_params + \
        '\n    rv_shift   10.0  -100.0  100.0  5.0'

    obs = Observation(cfg, model.wn)
    assert obs.wn_hires is not None and len(obs.wn_hires) == 40
    assert obs.data_hires is not None
    ret = RetrievalParams(model, obs)
    assert ret.irv is not None

    forward = jax.jit(build_forward(model, obs, ret))
    out = forward(jnp.asarray(ret.params))
    flux_h = np.asarray(out['bandflux_hires'])
    assert flux_h.shape == (40,)
    assert np.all(np.isfinite(flux_h))

    # Host-side check of the same physics:
    spec = np.asarray(out['spectrum'])
    wl_grid = 1.0 / np.asarray(model.wn)
    dwn = np.ediff1d(np.asarray(model.wn))
    sampling_res = float(np.median(np.asarray(model.wn)[:-1] / dwn))
    conv = inst_convolution(
        wl_grid, spec, 20000.0, sampling_res=sampling_res,
    )
    wn_shifted = rv_shift(float(ret.params[ret.irv]), wn=model.wn)
    expected = si.interp1d(wn_shifted, conv)(obs.wn_hires)
    np.testing.assert_allclose(flux_h, expected, rtol=1e-5)

    # RV responds:
    p2 = np.asarray(ret.params).copy()
    p2[ret.irv] = -50.0
    flux_h2 = np.asarray(forward(jnp.asarray(p2))['bandflux_hires'])
    assert not np.allclose(flux_h2, flux_h)

    # Mixed low-res + hires likelihood is finite:
    obs.data = np.full(obs.nbands, 0.0066)
    obs.uncert = np.full(obs.nbands, 2e-5)
    log_post = jax.jit(build_log_posterior(model, obs, ret))
    lp = float(log_post(jnp.asarray(ret.params)))
    assert np.isfinite(lp)
