"""runmode=atmosphere matrix: calculate/read/interpolate decisions per
property (pressure, temperature, VMR, radius), pinned against the
reference's hard-coded expected values
(reference tests/test_run_atmosphere.py, configs/atmosphere_jupiter_*.cfg).
"""
import configparser

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from pyratbay_tpu import driver
from pyratbay_tpu import atmosphere as atm

CALC_CFG = REFERENCE_ROOT + 'tests/configs/atmosphere_jupiter_calc.cfg'
ATM_INPUT = (
    REFERENCE_ROOT + 'tests/inputs/jupiter_isothermal_uniform_vmr_read.atm'
)
RJUP = 7.1492e9

CALC_NLAYERS = 71
CALC_T = 1500.0
READ_NLAYERS = 51
READ_T = 1000.0

# Sampled values of the reference's expected radius arrays
# (test_run_atmosphere.py:33-115), index -> value:
EXPECTED_CALC_RADIUS = {  # calc p/t/q/r, 71 layers, rplanet=1.5 rjup
    0: 1.5831851, 10: 1.56335685, 35: 1.51589318, 50: 1.48877359,
    70: 1.4540884,
}
EXPECTED_READ_RADIUS = {  # read p/t/q, calc r; 51 layers, rplanet=1 rjup
    0: 1.023869, 10: 1.0161, 25: 1.004664, 50: 0.9861666,
}
EXPECTED_READ_P_RADIUS = {  # read p, calc t/q/r, 51 layers
    0: 1.58314175, 10: 1.55552207, 30: 1.50307638, 50: 1.45405183,
}


def make_cfg(tmp_path, reset={}, remove=[]):
    ini = configparser.ConfigParser()
    ini.optionxform = str
    ini.read(CALC_CFG)
    ini.set('pyrat', 'logfile', str(tmp_path / 'atm.log'))
    for key, val in reset.items():
        ini.set('pyrat', key, val)
    for key in remove:
        ini.remove_option('pyrat', key)
    cfg_file = str(tmp_path / 'atm.cfg')
    with open(cfg_file, 'w') as f:
        ini.write(f)
    return cfg_file


def _radius(model):
    temp = np.asarray(model.eval_temp())
    from pyratbay_tpu.atmosphere import hydro
    mm = hydro.mean_weight(model.base_vmr, model.mol_mass)
    return np.asarray(model.eval_radius(temp, mm))


def _check_radius(radius, expected, rtol=1e-7):
    for idx, val in expected.items():
        np.testing.assert_allclose(
            radius[idx] / RJUP, val, rtol=rtol,
            err_msg=f'radius[{idx}]',
        )


@requires_reference
def test_atmosphere_calc_ptq(tmp_path):
    cfg = make_cfg(tmp_path, remove=['radmodel'])
    model = driver.run(cfg, root=REFERENCE_ROOT)
    expected_press = np.asarray(
        atm.pressure('1e-6 bar', '1e2 bar', CALC_NLAYERS))
    np.testing.assert_allclose(
        np.asarray(model.press), expected_press, rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(model.eval_temp()), np.tile(CALC_T, CALC_NLAYERS))
    assert model.species == ['H2', 'He', 'H2O']
    np.testing.assert_allclose(
        np.asarray(model.base_vmr)[0], [0.85, 0.149, 1e-4], rtol=1e-7)


@requires_reference
def test_atmosphere_calc_ptqr(tmp_path):
    cfg = make_cfg(tmp_path)
    model = driver.run(cfg, root=REFERENCE_ROOT)
    radius = _radius(model)
    assert len(radius) == CALC_NLAYERS
    _check_radius(radius, EXPECTED_CALC_RADIUS)


@requires_reference
def test_atmosphere_read_ptqr_from_atm(tmp_path):
    """Read press/temp/vmr from the input atm; compute radius."""
    cfg = make_cfg(
        tmp_path,
        reset={'atmfile': ATM_INPUT, 'rplanet': '1.0 rjup'},
        remove=['nlayers', 'tmodel', 'tpars', 'chemistry', 'species',
                'uniform_vmr', 'ptop', 'pbottom'],
    )
    model = driver.run(cfg, root=REFERENCE_ROOT)
    assert model.nlayers == READ_NLAYERS
    np.testing.assert_allclose(
        np.asarray(model.eval_temp()), np.tile(READ_T, READ_NLAYERS))
    assert model.species == ['H2', 'He', 'H2O', 'CO']
    np.testing.assert_allclose(
        np.asarray(model.base_vmr)[0], [0.85, 0.149, 1e-4, 1e-4])
    radius = _radius(model)
    _check_radius(radius, EXPECTED_READ_RADIUS, rtol=1e-6)


@requires_reference
def test_atmosphere_read_p_calc_tqr(tmp_path):
    """Read the pressure grid from the atm file; calculate T/VMR/r."""
    cfg = make_cfg(
        tmp_path,
        reset={'atmfile': ATM_INPUT},
        remove=['nlayers', 'ptop', 'pbottom'],
    )
    model = driver.run(cfg, root=REFERENCE_ROOT)
    assert model.nlayers == READ_NLAYERS
    np.testing.assert_allclose(
        np.asarray(model.eval_temp()), np.tile(CALC_T, READ_NLAYERS))
    assert model.species == ['H2', 'He', 'H2O']
    radius = _radius(model)
    _check_radius(radius, EXPECTED_READ_P_RADIUS, rtol=1e-6)


@requires_reference
def test_atmosphere_calc_p_interp_t(tmp_path):
    """Calculate a finer pressure grid; interpolate the read T."""
    cfg = make_cfg(
        tmp_path,
        reset={'atmfile': ATM_INPUT},
        remove=['tmodel', 'tpars', 'chemistry', 'species', 'uniform_vmr',
                'radmodel'],
    )
    model = driver.run(cfg, root=REFERENCE_ROOT)
    assert model.nlayers == CALC_NLAYERS
    # Isothermal input -> interpolation preserves the value:
    np.testing.assert_allclose(
        np.asarray(model.eval_temp()), np.tile(READ_T, CALC_NLAYERS))


@requires_reference
def test_model_plot_methods(tmp_path):
    """Model.plot_spectrum / plot_temperature produce figures
    (reference Pyrat.plot_spectrum/plot_temperature API)."""
    import matplotlib
    matplotlib.use('Agg')
    from pyratbay_tpu.model import Model
    cfg_src = (
        REFERENCE_ROOT + 'tests/configs/spectrum_transmission_test.cfg'
    )
    ini = configparser.ConfigParser()
    ini.optionxform = str
    ini.read(cfg_src)
    ini.remove_option('pyrat', 'sampled_cross_sec')
    ini.set('pyrat', 'logfile', str(tmp_path / 'plot.log'))
    cfg = str(tmp_path / 'plot.cfg')
    with open(cfg, 'w') as f:
        ini.write(f)
    model = Model(cfg, root=REFERENCE_ROOT)
    with pytest.raises(ValueError, match='before run'):
        model.plot_spectrum()
    model.run()
    out_spec = str(tmp_path / 'spec.png')
    ax = model.plot_spectrum(filename=out_spec)
    assert ax is not None
    import os
    assert os.path.getsize(out_spec) > 0
    out_temp = str(tmp_path / 'temp.png')
    model.plot_temperature(filename=out_temp)
    assert os.path.getsize(out_temp) > 0


@requires_reference
def test_atmosphere_output_atmfile_roundtrip(tmp_path):
    """runmode=atmosphere writes the output atm; reading it back gives
    the same profiles."""
    from pyratbay_tpu.io import io as pio
    out_atm = str(tmp_path / 'out.atm')
    cfg = make_cfg(tmp_path, reset={'output_atmfile': out_atm})
    model = driver.run(cfg, root=REFERENCE_ROOT)
    units, species, press, temp, vmr, radius = pio.read_atm(out_atm)
    np.testing.assert_allclose(
        np.asarray(press), np.asarray(model.press), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(temp), np.tile(CALC_T, CALC_NLAYERS))
    assert list(species) == ['H2', 'He', 'H2O']
    assert radius is not None
    np.testing.assert_allclose(
        np.asarray(radius) * 1e5, _radius(model), rtol=1e-6)
