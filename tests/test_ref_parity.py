"""Live reference-vs-repo parity: run the reference implementation
locally (tests/refrunner.py) on its shipped mock inputs and compare
spectra/tables against this package at the reference's own tolerance
(rtol = 1e-4, tests/test_transmission.py:39-40).

This covers the golden variants whose stored expected files depend on
non-shipped downloads (the 1.1-1.7 um HITRAN list): the full mock
chain tli -> opacity table -> transmission/emission/eclipse spectra,
with T/VMR models, sampling modes, and skip lists.
"""
import configparser
import os

import numpy as np
import pytest

import refrunner

RTOL = 1e-4
CACHE = os.path.join(refrunner.BUILD_DIR, 'cache')


@pytest.fixture(scope='session')
def ref_root():
    dest = refrunner.build_reference()
    if dest is None:
        pytest.skip('reference build unavailable (no toolchain?)')
    os.makedirs(CACHE, exist_ok=True)
    return dest + '/'


def _write_cfg(name, base, reset={}, remove=[]):
    ini = configparser.ConfigParser()
    ini.optionxform = str
    ini.read(base)
    for key, val in reset.items():
        ini.set('pyrat', key, val)
    for key in remove:
        ini.remove_option('pyrat', key)
    cfg_file = os.path.join(CACHE, name + '.cfg')
    with open(cfg_file, 'w') as f:
        ini.write(f)
    return cfg_file


def _ref_run(name, cfg_file, skip=None, post=''):
    """Cached reference subprocess run (cache keyed by build version)."""
    out_file = os.path.join(
        CACHE, f'{name}_v{refrunner.BUILD_VERSION}.npz',
    )
    if os.path.isfile(out_file):
        return dict(np.load(out_file))
    return refrunner.run_reference(cfg_file, out_file, skip=skip, post=post)


@pytest.fixture(scope='session')
def mock_tli(ref_root):
    """Reference-compiled TLI from the mock HITRAN par file."""
    tli = ref_root + 'tests/outputs/mock_H2O_1.00-1.01um.tli'
    if not os.path.isfile(tli):
        cfg = _write_cfg(
            'tli', ref_root + 'tests/configs/tli_hitran_test.cfg',
            reset={
                'logfile': '{ROOT}tests/outputs/mock_tli.log',
                'dblist': '{ROOT}tests/inputs/'
                          'Mock_HITRAN_H2O_1.00-1.01um.par',
                'tlifile': tli,
            },
        )
        refrunner.run_reference(cfg, os.path.join(CACHE, 'tli.npz'))
    return tli


@pytest.fixture(scope='session')
def mock_exttable(ref_root, mock_tli):
    """Reference-tabulated cross sections on the mock wl range."""
    ext = ref_root + 'tests/outputs/mock_exttable_300-3000K.npz'
    if not os.path.isfile(ext):
        cfg = _write_cfg(
            'opacity', ref_root + 'tests/configs/opacity_test.cfg',
            reset={
                'logfile': '{ROOT}tests/outputs/mock_opacity.log',
                'atmfile': '{ROOT}tests/inputs/atmosphere_uniform_test.atm',
                'tlifile': mock_tli,
                'sampled_cross_sec': ext,
                'wl_low': '1.0 um',
                'wl_high': '1.01 um',
            },
        )
        refrunner.run_reference(cfg, os.path.join(CACHE, 'opacity.npz'))
    return ext


TRANSMISSION = '{}tests/configs/spectrum_transmission_test.cfg'
EMISSION = '{}tests/configs/spectrum_emission_test.cfg'
ECLIPSE = '{}tests/configs/spectrum_eclipse_test.cfg'
MOCK_WL = {'wl_low': '1.0 um', 'wl_high': '1.01 um'}
ALL_OPAC = ['sampled_cross_sec', 'continuum_cross_sec', 'alkali', 'clouds']


def _compare(name, ref_root, base_cfg, reset={}, remove=[],
             ref_skip=None, my_skip=(), rtol=RTOL):
    """Run reference + repo on one mutated config; compare spectra."""
    from pyratbay_tpu.model import Model
    reset = {
        'logfile': f'{{ROOT}}tests/outputs/{name}.log',
        **MOCK_WL, **reset,
    }
    cfg = _write_cfg(
        name, base_cfg.format(ref_root), reset=reset, remove=remove,
    )
    ref = _ref_run(
        name if ref_skip is None else f'{name}_skip', cfg, skip=ref_skip,
    )
    model = Model(cfg, root=ref_root)
    model.run(skip=my_skip)
    assert model.nwave == len(ref['spectrum'])
    np.testing.assert_allclose(
        np.asarray(model.wn), ref['wn'], rtol=1e-10,
    )
    np.testing.assert_allclose(
        model.spectrum, ref['spectrum'], rtol=rtol,
    )
    return model, ref


# ---------------------------------------------------------------------
# Opacity-table parity (tli -> tabulated cross sections):

def test_ref_parity_opacity_table(ref_root, mock_tli, mock_exttable,
                                  tmp_path):
    """Repo-tabulated cross sections == reference exttable."""
    from pyratbay_tpu.model import Model
    from pyratbay_tpu.io import io as pio

    _, ref_temps, ref_press, ref_wn = pio.read_opacity(
        mock_exttable, extract='arrays',
    )
    ref_table = pio.read_opacity(mock_exttable, extract='opacity')

    out = str(tmp_path / 'my_exttable.npz')
    cfg = _write_cfg(
        'opacity_mine', ref_root + 'tests/configs/opacity_test.cfg',
        reset={
            'logfile': '{ROOT}tests/outputs/mock_opacity_mine.log',
            'atmfile': '{ROOT}tests/inputs/atmosphere_uniform_test.atm',
            'tlifile': mock_tli,
            'sampled_cross_sec': out,
            **MOCK_WL,
        },
    )
    model = Model(cfg, root=ref_root)
    table = model.compute_opacity()
    np.testing.assert_allclose(np.asarray(model.wn), ref_wn, rtol=1e-10)
    # Compare where the opacity is significant (tiny absolute values
    # below the ethresh pruning floor differ by design):
    ref_t = np.asarray(ref_table)
    floor = 1e-6 * ref_t.max(axis=(1, 2), keepdims=True)
    strong = ref_t > floor
    ratio = table[strong] / ref_t[strong]
    assert np.quantile(np.abs(ratio - 1.0), 0.99) < 1e-4


# ---------------------------------------------------------------------
# Transmission variants:

def test_ref_parity_transmission_tli(ref_root, mock_tli):
    _compare(
        'tr_tli', ref_root, TRANSMISSION,
        reset={'tlifile': mock_tli},
        remove=ALL_OPAC,
    )


def test_ref_parity_transmission_sampled_cs(ref_root, mock_exttable):
    _compare(
        'tr_ls', ref_root, TRANSMISSION,
        reset={'sampled_cross_sec': mock_exttable},
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )


def test_ref_parity_transmission_all(ref_root, mock_exttable):
    """Every opacity source at once: ls + cia + alkali + clouds.
    (The reference does not support table + tlifile simultaneously:
    its table branch never builds the fine grid, spectrum.py:124-166.)
    """
    _compare(
        'tr_all', ref_root, TRANSMISSION,
        reset={'sampled_cross_sec': mock_exttable},
    )


def test_ref_parity_transmission_patchy(ref_root, mock_exttable):
    _compare(
        'tr_patchy', ref_root, TRANSMISSION,
        reset={
            'sampled_cross_sec': mock_exttable,
            'fpatchy': '0.5',
            'clouds': 'deck -3.0\nlecavelier 10.0 -15.0',
        },
    )


def test_ref_parity_transmission_resolution(ref_root, mock_tli):
    _compare(
        'tr_res', ref_root, TRANSMISSION,
        reset={'tlifile': mock_tli, 'resolution': '5000.0'},
        remove=ALL_OPAC,
    )


def test_ref_parity_transmission_wl_step(ref_root, mock_exttable):
    _compare(
        'tr_wlstep', ref_root, TRANSMISSION,
        reset={
            'sampled_cross_sec': mock_exttable,
            'wlstep': '1e-5 um',
        },
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )


def test_ref_parity_transmission_tmodel(ref_root, mock_exttable):
    _compare(
        'tr_tmodel', ref_root, TRANSMISSION,
        reset={
            'sampled_cross_sec': mock_exttable,
            'tmodel': 'guillot',
            'tpars': '-4.67 -0.8 -0.8 0.5 1486.0 100.0',
        },
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )


def test_ref_parity_transmission_vert(ref_root, mock_exttable):
    _compare(
        'tr_vert', ref_root, TRANSMISSION,
        reset={
            'sampled_cross_sec': mock_exttable,
            'vmr_vars': 'log_H2O -5',
            'bulk': 'H2 He',
        },
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )


def test_ref_parity_transmission_scale(ref_root, mock_exttable):
    _compare(
        'tr_scale', ref_root, TRANSMISSION,
        reset={
            'sampled_cross_sec': mock_exttable,
            'vmr_vars': 'scale_H2O -1.0',
            'bulk': 'H2 He',
        },
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )


SKIPS = [
    'line_sample', 'cia', 'alkali', 'deck', 'lecavelier', 'H2O',
]


@pytest.mark.parametrize('skip', SKIPS)
def test_ref_parity_transmission_skip(ref_root, mock_exttable, skip):
    _compare(
        f'tr_skip_{skip}', ref_root, TRANSMISSION,
        reset={'sampled_cross_sec': mock_exttable},
        ref_skip=[skip], my_skip=(skip,),
    )


def test_ref_parity_transmission_skip_lbl(ref_root, mock_tli):
    _compare(
        'tr_skip_lbl', ref_root, TRANSMISSION,
        reset={'tlifile': mock_tli},
        remove=['sampled_cross_sec'],
        ref_skip=['lbl'], my_skip=('lbl',),
    )


# ---------------------------------------------------------------------
# Per-model extinction diagnostic (get_ec):

_POST_GET_EC = '''
ec, labels = result.get_ec(31)
out['get_ec'] = np.asarray(ec)
out['get_ec_labels'] = np.asarray(labels)
'''


def _get_ec_compare(name, ref_root, reset, remove=[]):
    """Reference get_ec(layer=31) == Model.get_ec(31), label-matched."""
    from pyratbay_tpu.model import Model
    reset = {
        'logfile': f'{{ROOT}}tests/outputs/{name}.log',
        **MOCK_WL, **reset,
    }
    cfg = _write_cfg(
        name, TRANSMISSION.format(ref_root), reset=reset, remove=remove,
    )
    ref = _ref_run(name, cfg, post=_POST_GET_EC)
    ref_rows = dict(zip(
        [str(lab) for lab in ref['get_ec_labels']], ref['get_ec'],
    ))

    model = Model(cfg, root=ref_root)
    model.run()
    ec, labels = model.get_ec(31)
    ec = np.asarray(ec)
    assert sorted(labels) == sorted(ref_rows)
    for row, label in zip(ec, labels):
        ref_row = ref_rows[label]
        floor = 1e-10 * max(ref_row.max(), 1e-300)
        np.testing.assert_allclose(
            row, ref_row, rtol=RTOL, atol=floor, err_msg=label,
        )


def test_ref_parity_get_ec_ls(ref_root, mock_exttable):
    """get_ec over the line-sample + CIA + alkali + cloud stack."""
    _get_ec_compare(
        'ec_diag_ls', ref_root,
        reset={'sampled_cross_sec': mock_exttable},
    )


def test_ref_parity_get_ec_lbl(ref_root, mock_tli):
    """get_ec over the line-by-line chain."""
    _get_ec_compare(
        'ec_diag_lbl', ref_root,
        reset={'tlifile': mock_tli},
        remove=['sampled_cross_sec'],
    )


# ---------------------------------------------------------------------
# Emission variants:

def test_ref_parity_emission_sampled_cs(ref_root, mock_exttable):
    _compare(
        'em_ls', ref_root, EMISSION,
        reset={'sampled_cross_sec': mock_exttable},
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )


def test_ref_parity_emission_all(ref_root, mock_exttable):
    _compare(
        'em_all', ref_root, EMISSION,
        reset={'sampled_cross_sec': mock_exttable},
    )


def test_ref_parity_emission_tmodel(ref_root, mock_exttable):
    _compare(
        'em_tmodel', ref_root, EMISSION,
        reset={
            'sampled_cross_sec': mock_exttable,
            'tmodel': 'guillot',
            'tpars': '-4.67 -0.8 -0.8 0.5 1486.0 100.0',
        },
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )


def test_ref_parity_emission_vert(ref_root, mock_exttable):
    _compare(
        'em_vert', ref_root, EMISSION,
        reset={
            'sampled_cross_sec': mock_exttable,
            'vmr_vars': 'log_H2O -5',
            'bulk': 'H2 He',
        },
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )


def test_ref_parity_emission_quadrature(ref_root, mock_exttable):
    _compare(
        'em_quad', ref_root, EMISSION,
        reset={
            'sampled_cross_sec': mock_exttable,
            'quadrature': '5',
        },
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )


def test_ref_parity_emission_two_stream(ref_root, mock_exttable):
    _compare(
        'em_2s', ref_root, EMISSION,
        reset={
            'sampled_cross_sec': mock_exttable,
            'rt_path': 'emission_two_stream',
        },
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )


def test_ref_parity_emission_resolution(ref_root, mock_tli):
    _compare(
        'em_res', ref_root, EMISSION,
        reset={'tlifile': mock_tli, 'resolution': '5000.0'},
        remove=ALL_OPAC,
    )


# ---------------------------------------------------------------------
# Radiative equilibrium (fixed-VMR chemistry):

_POST_RADEQ = '''
import pyratbay.spectrum as ps

class _FixedChem:
    """chemcat stand-in returning the input (uniform) VMR profile."""
    def thermochemical_equilibrium(self, temp):
        return result.atm.vmr

result.od.rt_path = 'emission_two_stream'
result.atm._dt_scale = np.tile(1.0e5, result.atm.nlayers)
result.spec.specfile = None
result.log.verb = -1
tmin = np.amax(list(result.opacity.tmin.values()))
tmax = np.amin(list(result.opacity.tmax.values()))
temps = ps.radiative_equilibrium(
    result.atm.press, np.atleast_2d(result.atm.temp), 10,
    _FixedChem(), result.run, result.spec.wn, result.spec, result.atm,
    False, tmin, tmax,
)
out['radeq_temps'] = np.asarray(temps)
out['radeq_tminmax'] = np.array([tmin, tmax])
'''


def test_ref_parity_radeq(ref_root, mock_exttable):
    """Reference radiative-equilibrium trajectory (adaptive dT update,
    wobble damping, smoothing; radiative_transfer.py:141-274) == this
    package's radeq loop, with fixed-VMR chemistry on both sides."""
    from pyratbay_tpu.model import Model
    from pyratbay_tpu.spectrum.radeq import radiative_equilibrium

    cfg = _write_cfg(
        'radeq_par', EMISSION.format(ref_root),
        reset={
            'logfile': '{ROOT}tests/outputs/radeq_par.log',
            'sampled_cross_sec': mock_exttable,
            **MOCK_WL,
        },
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )
    ref = _ref_run('radeq_par', cfg, post=_POST_RADEQ)

    model = Model(cfg, root=ref_root)
    model.rt_path = 'emission_two_stream'
    tmin, tmax = ref['radeq_tminmax']
    temps = radiative_equilibrium(
        model, nsamples=10, tmin=tmin, tmax=tmax,
    )
    assert temps.shape == ref['radeq_temps'].shape
    # Early iterations pin the update math tightly; later ones
    # accumulate wobble-branch history:
    np.testing.assert_allclose(
        temps[1], ref['radeq_temps'][1], rtol=1e-6,
    )
    np.testing.assert_allclose(
        temps, ref['radeq_temps'], rtol=1e-3,
    )


# ---------------------------------------------------------------------
# Eclipse variants:

def test_ref_parity_eclipse_sampled_cs(ref_root, mock_exttable):
    _compare(
        'ec_ls', ref_root, ECLIPSE,
        reset={'sampled_cross_sec': mock_exttable},
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )


def test_ref_parity_eclipse_all(ref_root, mock_exttable):
    _compare(
        'ec_all', ref_root, ECLIPSE,
        reset={'sampled_cross_sec': mock_exttable},
    )


def test_ref_parity_eclipse_tmodel(ref_root, mock_exttable):
    _compare(
        'ec_tmodel', ref_root, ECLIPSE,
        reset={
            'sampled_cross_sec': mock_exttable,
            'tmodel': 'guillot',
            'tpars': '-4.67 -0.8 -0.8 0.5 1486.0 100.0',
        },
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )


_POST_RADEQ_LONG = '''
import pyratbay.spectrum as ps

class _FixedChem:
    def thermochemical_equilibrium(self, temp):
        return result.atm.vmr

result.od.rt_path = 'emission_two_stream'
result.atm._dt_scale = np.tile(1.0e5, result.atm.nlayers)
result.spec.specfile = None
result.log.verb = -1
tmin = np.amax(list(result.opacity.tmin.values()))
tmax = np.amin(list(result.opacity.tmax.values()))
temps = ps.radiative_equilibrium(
    result.atm.press, np.atleast_2d(result.atm.temp), 120,
    _FixedChem(), result.run, result.spec.wn, result.spec, result.atm,
    False, tmin, tmax,
)
out['radeq_temps'] = np.asarray(temps)
out['radeq_tminmax'] = np.array([tmin, tmax])
'''

_POST_RADEQ_CONVEC = '''
import pyratbay.spectrum as ps

class _FixedChem:
    def thermochemical_equilibrium(self, temp):
        return result.atm.vmr
    def heat_capacity(self, temp):
        return np.full(result.atm.vmr.shape, 3.5)

result.od.rt_path = 'emission_two_stream'
result.atm._dt_scale = np.tile(1.0e5, result.atm.nlayers)
result.spec.specfile = None
result.log.verb = -1
tmin = np.amax(list(result.opacity.tmin.values()))
tmax = np.amin(list(result.opacity.tmax.values()))
# Steep (super-adiabatic below) initial profile so the convective
# branch actually fires:
press_bar = result.atm.press * (
    1e-6 if result.atm.press.max() > 1e4 else 1.0)
t_init = 600.0 * np.clip(press_bar, 1.0, None)**0.5
t_init = np.clip(t_init, 600.0, 2800.0)
temps = ps.radiative_equilibrium(
    result.atm.press, np.atleast_2d(t_init), 30,
    _FixedChem(), result.run, result.spec.wn, result.spec, result.atm,
    True, tmin, tmax,
)
out['radeq_temps'] = np.asarray(temps)
out['radeq_t_init'] = t_init
out['radeq_tminmax'] = np.array([tmin, tmax])
'''


def test_ref_parity_radeq_converged(ref_root, mock_exttable):
    """Reference radeq run TO CONVERGENCE (120 iterations) == this
    package's scan loop: converged T(p) at 1e-3 and an equivalent
    convergence iteration (first iteration with max |dT| < 1 K within
    a factor of 1.5)."""
    from pyratbay_tpu.model import Model
    from pyratbay_tpu.spectrum.radeq import radiative_equilibrium

    cfg = _write_cfg(
        'radeq_conv', EMISSION.format(ref_root),
        reset={
            'logfile': '{ROOT}tests/outputs/radeq_conv.log',
            'sampled_cross_sec': mock_exttable,
            **MOCK_WL,
        },
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )
    ref = _ref_run('radeq_conv', cfg, post=_POST_RADEQ_LONG)

    model = Model(cfg, root=ref_root)
    model.rt_path = 'emission_two_stream'
    tmin, tmax = ref['radeq_tminmax']
    temps = radiative_equilibrium(
        model, nsamples=120, tmin=tmin, tmax=tmax,
    )
    ref_temps = ref['radeq_temps']
    assert temps.shape == ref_temps.shape

    # Converged profile:
    np.testing.assert_allclose(temps[-1], ref_temps[-1], rtol=1e-3)
    # The loop must have actually converged (not just agreed):
    dt_last = np.abs(np.diff(temps[-10:], axis=0)).max()
    assert dt_last < 1.0, f'not converged: max dT {dt_last:.2f} K'

    def iconverge(traj):
        dt = np.abs(np.diff(traj, axis=0)).max(axis=1)
        below = np.where(dt < 1.0)[0]
        return int(below[0]) + 1 if len(below) else len(traj)

    i_ref = iconverge(ref_temps)
    i_new = iconverge(temps)
    assert i_new <= 1.5 * i_ref + 5 and i_ref <= 1.5 * i_new + 5, (
        f'convergence iterations differ: ref {i_ref}, new {i_new}'
    )


def test_ref_parity_radeq_convection(ref_root, mock_exttable):
    """Reference radeq with the CONVECTIVE branch active (steep
    super-adiabatic initial profile; radiative_transfer.py:240-273)
    == this package's host loop with convection=True."""
    from pyratbay_tpu.model import Model
    from pyratbay_tpu.spectrum.convection import convective_flux
    from pyratbay_tpu.spectrum.radeq import radiative_equilibrium
    from pyratbay_tpu import constants as pc

    cfg = _write_cfg(
        'radeq_cvc', EMISSION.format(ref_root),
        reset={
            'logfile': '{ROOT}tests/outputs/radeq_cvc.log',
            'sampled_cross_sec': mock_exttable,
            **MOCK_WL,
        },
        remove=['continuum_cross_sec', 'alkali', 'clouds'],
    )
    ref = _ref_run('radeq_cvc', cfg, post=_POST_RADEQ_CONVEC)
    t_init = np.asarray(ref['radeq_t_init'])

    model = Model(cfg, root=ref_root)
    model.rt_path = 'emission_two_stream'

    # The initial profile must actually be super-adiabatic somewhere,
    # or this test exercises nothing:
    press = np.asarray(model.press) * pc.bar
    vmr = np.asarray(model.base_vmr)
    mm = vmr @ np.asarray(model.mol_mass)
    cp = np.full(model.nlayers, 3.5) * pc.k / pc.amu
    rho = np.sum(
        vmr * (press / t_init / pc.k)[:, None]
        * np.asarray(model.mol_mass), axis=1,
    ) * pc.amu
    conv0 = np.asarray(convective_flux(
        press, t_init, cp, np.full(model.nlayers, 1.0e3), mm, rho,
    ))
    assert np.any(conv0 > 0), 'initial profile is not super-adiabatic'

    tmin, tmax = ref['radeq_tminmax']
    temps = radiative_equilibrium(
        model, nsamples=30, convection=True, tmin=tmin, tmax=tmax,
        radeq_temps=np.atleast_2d(t_init),
    )
    np.testing.assert_allclose(
        temps[1], ref['radeq_temps'][1], rtol=1e-6,
    )
    np.testing.assert_allclose(
        temps, ref['radeq_temps'], rtol=1e-3,
    )
