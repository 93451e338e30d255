"""Live eval-semantics parity: the reference's pyrat.eval(params) --
parameter mapping -> run -> band integration -> instrumental offsets ->
uncertainty scaling (pyrat_obj.py:225-385) -- against this package's
build_forward + Observation mechanics on identical params.

Covers the semantics pinned by the reference's HITRAN-gated fit1-4 /
bandflux4 goldens (tests/test_pbay.py) using only shipped inputs:
CIA + alkali + clouds over 1.1-1.7 um with the WFC3 filter files.
"""
import numpy as np
import pytest

import refrunner
from test_ref_parity import _write_cfg, _ref_run, CACHE
from test_contribution import FILTERS, ref_root  # noqa: F401 (fixture)

TRANSMISSION = '{}tests/configs/spectrum_transmission_test.cfg'

DATA = """
    0.00661283 0.00660005 0.00660469 0.00650971 0.00644517
    0.00641258 0.00647299 0.00647971 0.00665621 0.00672591
    0.00676979 0.00674033 0.00675853 0.0067017  0.00667381
    0.00658485 0.0065626  0.00646412 0.00650268 0.00649036"""

UNCERT = """
    1.95273022e-05 2.05945370e-05 1.87702817e-05 2.37758224e-05
    1.81546205e-05 1.64577635e-05 1.80614606e-05 1.94325497e-05
    2.04290356e-05 1.89810052e-05 1.78875027e-05 2.11562862e-05
    1.93313760e-05 1.65186307e-05 1.89964252e-05 2.22242185e-05
    1.83049246e-05 1.64725006e-05 2.00283420e-05 1.65049966e-05"""

RETRIEVAL_PARAMS = """
    log_kappa'     -4.67   -9.0    5.0   0.3
    T_irr         1486.0  100.0 3000.0  50.0
    R_planet        1.01    0.5    4.5   0.03
    log_k_ray        1.0   -4.0    4.0   0.5
    alpha_ray       -5.0   -6.0    0.0   0.5
    offset_WFC3     30.0 -100.0  100.0   5.0
    err_scale_WFC3   0.1   -2.0    2.0   0.1"""

# A perturbed free-parameter vector (same order as retrieval_params):
EVAL_PARAMS = [-4.3, 1350.0, 1.015, 0.8, -4.6, -25.0, 0.25]

_POST_EVAL = f'''
# Capture the initial parameter vector BEFORE eval (eval overwrites
# ret.params with its input):
out['ret_params'] = np.copy(result.ret.params)
params = np.array({EVAL_PARAMS!r})
spectrum, bandflux = result.eval(params)
out['eval_spectrum'] = np.asarray(spectrum)
out['eval_bandflux'] = np.asarray(bandflux)
out['eval_data'] = np.asarray(result.obs.data)
out['eval_uncert'] = np.asarray(result.obs.uncert)
'''


def test_eval_parity_f_lambda(ref_root):
    """rt_path=f_lambda: flux at Earth in W m-2 um-1 (reference
    eval() conversion, pyrat_obj.py:325-330)."""
    from pyratbay_tpu.model import Model
    from pyratbay_tpu.observation import Observation
    from pyratbay_tpu.retrieval import RetrievalParams, build_forward

    reset = {
        'logfile': '{ROOT}tests/outputs/eval_flambda.log',
        'rt_path': 'f_lambda',
        'distance': '10 pc',
        'tmodel': 'guillot',
        'tpars': '-4.67 -0.8 -0.8 0.5 1486.0 100.0',
        'retrieval_params': 'T_irr 1486.0 100.0 3000.0 50.0',
        'tlow': '300',
        'thigh': '3000',
    }
    cfg = _write_cfg(
        'eval_flambda',
        '{}tests/configs/spectrum_emission_test.cfg'.format(ref_root),
        reset=reset,
        remove=['sampled_cross_sec', 'alkali', 'clouds'],
    )
    post = '''
out['ret_params'] = np.copy(result.ret.params)
spectrum, bandflux = result.eval(np.array([1400.0]))
out['eval_spectrum'] = np.asarray(spectrum)
'''
    ref = _ref_run('eval_flambda', cfg, post=post)

    model = Model(cfg, root=ref_root)
    ret = RetrievalParams(model)
    forward = build_forward(model, None, ret)
    out = forward(np.array([1400.0]))
    np.testing.assert_allclose(
        np.asarray(out['spectrum']), ref['eval_spectrum'], rtol=1e-4,
    )


def test_eval_parity(ref_root):
    from pyratbay_tpu.model import Model
    from pyratbay_tpu.observation import Observation
    from pyratbay_tpu.retrieval import RetrievalParams, build_forward

    reset = {
        'logfile': '{ROOT}tests/outputs/eval_parity.log',
        'filters': FILTERS,
        'data': DATA,
        'uncert': UNCERT,
        'tmodel': 'guillot',
        'tpars': '-4.67 -0.8 -0.8 0.5 1486.0 100.0',
        'clouds': 'lecavelier 0.0 -4.0',
        'offset_inst': 'offset_WFC3 0.0',
        'uncert_scaling': 'err_scale_WFC3 0.0',
        'retrieval_params': RETRIEVAL_PARAMS,
        'tlow': '300',
        'thigh': '3000',
    }
    cfg = _write_cfg(
        'eval_parity', TRANSMISSION.format(ref_root),
        reset=reset, remove=['sampled_cross_sec', 'alkali'],
    )
    ref = _ref_run('eval_parity', cfg, post=_POST_EVAL)

    model = Model(cfg, root=ref_root)
    obs = Observation(model.cfg, model.wn, root=ref_root)
    ret = RetrievalParams(model, obs)
    forward = build_forward(model, obs, ret)

    # Same initial parameter vector (the retrieval_params block):
    np.testing.assert_allclose(
        np.asarray(ret.params, float), ref['ret_params'], rtol=1e-10,
    )

    params = np.asarray(EVAL_PARAMS, float)
    out = forward(params)
    spectrum = np.asarray(out['spectrum'])
    bandflux = np.asarray(out['bandflux'])

    np.testing.assert_allclose(
        spectrum, ref['eval_spectrum'], rtol=1e-4,
    )
    np.testing.assert_allclose(
        bandflux, ref['eval_bandflux'], rtol=1e-4,
    )

    # Instrumental offset + error-scaling semantics (reference
    # eval():361-371 -> tools/data.py offset_data/scale_errors):
    ioffset = ret.ioffset
    ierror = ret.ierror
    assert ioffset and ierror
    data_shifted = np.asarray(obs.offset_data(params[np.asarray(ioffset)]))
    np.testing.assert_allclose(data_shifted, ref['eval_data'], rtol=1e-10)
    uncert_scaled = np.asarray(obs.scale_uncert(params[np.asarray(ierror)]))
    np.testing.assert_allclose(
        uncert_scaled, ref['eval_uncert'], rtol=1e-10,
    )
