"""Radiative-equilibrium loop: converges toward a flux-balanced
profile for a gray-ish atmosphere."""
import configparser

import numpy as np

from conftest import requires_reference, REFERENCE_ROOT

from pyratbay_tpu.model import Model
from pyratbay_tpu.spectrum.radeq import radiative_equilibrium

EMISSION_CFG = REFERENCE_ROOT + 'tests/configs/spectrum_emission_test.cfg'


@requires_reference
def test_radeq_runs_and_reduces_imbalance(tmp_path):
    ini = configparser.ConfigParser()
    ini.optionxform = str
    ini.read(EMISSION_CFG)
    for key in ('sampled_cross_sec', 'alkali', 'clouds'):
        ini.remove_option('pyrat', key)
    ini.set('pyrat', 'runmode', 'radeq')
    ini.set('pyrat', 'rt_path', 'emission_two_stream')
    ini.set('pyrat', 'tstar', '5800.0')
    ini.set('pyrat', 'rstar', '1.27 rsun')
    cfg = str(tmp_path / 'radeq.cfg')
    with open(cfg, 'w') as f:
        ini.write(f)

    model = Model(cfg, root=REFERENCE_ROOT)
    temps = radiative_equilibrium(model, nsamples=40)
    assert temps.shape == (41, model.nlayers)
    assert np.all(np.isfinite(temps))
    assert np.all(temps[-1] > 0)
    # Iterations change the profile (the initial one is not balanced):
    assert np.max(np.abs(temps[-1] - temps[0])) > 1.0
    # With the reference's adaptive dt_scale the step size ramps up
    # (x1.15 per non-wobbling iteration), peaks, then collapses as the
    # profile approaches flux balance:
    steps = np.array([
        np.mean(np.abs(temps[k + 1] - temps[k]))
        for k in range(len(temps) - 1)
    ])
    assert steps[-1] < 0.1 * steps.max()

    # Warm restart reuses state:
    temps2 = radiative_equilibrium(
        model, nsamples=5,
        radeq_temps=model.radeq_temps, dt_scale=model._dt_scale,
    )
    assert temps2.shape == (46, model.nlayers)


def test_make_radeq_self_contained(tmp_path):
    """bench's radeq workload builds with zero external files and
    iterates finitely."""
    from pyratbay_tpu.benchmark import make_radeq

    model = make_radeq(workdir=str(tmp_path))
    assert 'two_stream' in model.rt_path
    temps = radiative_equilibrium(model, nsamples=2)
    assert temps.shape == (3, model.nlayers)
    assert np.all(np.isfinite(temps)) and np.all(temps[-1] > 0)


def test_radeq_scan_matches_host_loop(tmp_path):
    """The device lax.scan path reproduces the host numpy loop at
    float64 round-off, including warm-restart sign-history behavior."""
    from pyratbay_tpu.benchmark import make_radeq

    model = make_radeq(workdir=str(tmp_path), nlayers=30)
    t_scan = np.array(radiative_equilibrium(
        model, nsamples=12, use_scan=True))
    scale_scan = np.array(model._dt_scale)

    model2 = make_radeq(workdir=str(tmp_path / 'h'), nlayers=30)
    t_host = np.array(radiative_equilibrium(
        model2, nsamples=12, use_scan=False))
    scale_host = np.array(model2._dt_scale)

    np.testing.assert_allclose(t_scan, t_host, rtol=1e-9, atol=1e-7)
    np.testing.assert_allclose(
        scale_scan, scale_host, rtol=1e-9,
    )

    # Warm restart: both paths continue identically from saved state.
    t_scan2 = np.array(radiative_equilibrium(
        model, nsamples=4, use_scan=True,
        radeq_temps=model.radeq_temps, dt_scale=model._dt_scale))
    t_host2 = np.array(radiative_equilibrium(
        model2, nsamples=4, use_scan=False,
        radeq_temps=model2.radeq_temps, dt_scale=model2._dt_scale))
    np.testing.assert_allclose(t_scan2, t_host2, rtol=1e-9, atol=1e-7)
