"""Workflow chain: TLI -> opacity table -> line-sampled spectrum.

Validates that a spectrum computed through a tabulated cross-section
table agrees with the direct line-by-line computation (the reference's
own CI exercises this chain against golden files that require the full
HITRAN download; here the chain is cross-validated against itself,
which catches format and interpolation errors on both sides).
"""
import configparser

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from pyratbay_tpu import driver
from pyratbay_tpu.io import read_opacity
from pyratbay_tpu.opacity.tli import make_tli

MOCK_PAR = REFERENCE_ROOT + 'tests/inputs/Mock_HITRAN_H2O_1.00-1.01um.par'
BASE_CFG = REFERENCE_ROOT + 'tests/configs/spectrum_transmission_test.cfg'


def write_cfg(path, updates, removes=()):
    ini = configparser.ConfigParser()
    ini.optionxform = str
    ini.read(BASE_CFG)
    for key in ('sampled_cross_sec', 'continuum_cross_sec', 'alkali',
                'clouds', *removes):
        ini.remove_option('pyrat', key)
    for key, val in updates.items():
        ini.set('pyrat', key, val)
    with open(path, 'w') as f:
        ini.write(f)
    return str(path)


@requires_reference
def test_opacity_table_chain(tmp_path):
    tli_file = str(tmp_path / 'h2o.tli')
    make_tli([MOCK_PAR], ['tips'], ['hitran'], tli_file, 1.0, 1.01, 'um')

    # 1. Tabulate cross sections (runmode = opacity):
    cs_file = str(tmp_path / 'exttable.npz')
    cfg_op = write_cfg(
        tmp_path / 'opacity.cfg',
        {
            'runmode': 'opacity',
            'tlifile': tli_file,
            'sampled_cross_sec': cs_file,
            'wl_low': '1.0 um', 'wl_high': '1.01 um',
            'tmin': '300', 'tmax': '3000', 'tstep': '900',
        },
    )
    model = driver.run(cfg_op, root=REFERENCE_ROOT)
    units, species, temps, press, wn, table = read_opacity(cs_file)
    assert species == 'H2O'
    np.testing.assert_allclose(temps, [300, 1200, 2100, 3000])
    assert table.shape == (4, model.nlayers, model.nwave)
    assert np.all(table >= 0) and np.all(np.isfinite(table))
    assert table.max() > 0

    # 2. Spectrum through the table:
    cfg_ls = write_cfg(
        tmp_path / 'ls.cfg',
        {
            'sampled_cross_sec': cs_file,
            'wl_low': '1.0 um', 'wl_high': '1.01 um',
        },
    )
    model_ls = driver.run(cfg_ls, root=REFERENCE_ROOT)

    # 3. Spectrum through direct LBL:
    cfg_lbl = write_cfg(
        tmp_path / 'lbl.cfg',
        {
            'tlifile': tli_file,
            'wl_low': '1.0 um', 'wl_high': '1.01 um',
        },
    )
    model_lbl = driver.run(cfg_lbl, root=REFERENCE_ROOT)

    # The table linearizes over T; at the atmospheric temperatures
    # (1046-2053 K) the interpolation error dominates -- agreement in
    # transit depth must still be far below the feature amplitude:
    ls = model_ls.spectrum
    lbl = model_lbl.spectrum
    feature = lbl.max() - lbl.min()
    assert np.max(np.abs(ls - lbl)) < 0.15 * feature
    # Continua (no-line regions) agree tightly:
    floor = (model_lbl.radius[-1] / model_lbl.rstar)**2
    weak = (lbl - floor) < 0.1 * feature
    np.testing.assert_allclose(ls[weak], lbl[weak], rtol=2e-4)


@requires_reference
def test_driver_spectrum_writes_file(tmp_path):
    tli_file = str(tmp_path / 'h2o.tli')
    make_tli([MOCK_PAR], ['tips'], ['hitran'], tli_file, 1.0, 1.01, 'um')
    specfile = str(tmp_path / 'spec.dat')
    cfg = write_cfg(
        tmp_path / 'spec.cfg',
        {
            'tlifile': tli_file,
            'wl_low': '1.0 um', 'wl_high': '1.01 um',
            'specfile': specfile,
        },
    )
    model = driver.run(cfg, root=REFERENCE_ROOT)
    from pyratbay_tpu.io import read_spectrum
    wl, spec = read_spectrum(specfile, wn=False)
    np.testing.assert_allclose(spec, model.spectrum, rtol=1e-8)


def test_line_sample_isotope_ratios(tmp_path):
    """Retrievable isotope-ratio parameters with fill-species
    renormalization (reference line_sampling.py:206-237)."""
    import jax
    import jax.numpy as jnp
    from pyratbay_tpu.benchmark import _synthetic_cs_table
    from pyratbay_tpu.opacity.line_sample import LineSample

    press = np.logspace(-6, 2, 11)
    wn = np.arange(5000.0, 5256.0, 1.0)
    f161 = str(tmp_path / 'H2O_161_cs.npz')
    f181 = str(tmp_path / 'H2O_181_cs.npz')
    _synthetic_cs_table(f161, wn, press, species='H2O', seed=1)
    _synthetic_cs_table(f181, wn, press, species='H2O', seed=2)

    ls = LineSample(
        [f161, f181], pressure=press,
        isotope_ratios='161 161 fill_181\n181 181 -2.0',
    )
    assert ls.nspec == 2
    assert list(ls.species) == ['H2O', 'H2O']
    assert ls.pnames == ['iso_181']
    np.testing.assert_allclose(ls.iso_ratios, [1 - 1e-2, 1e-2])

    temp = np.full(11, 1200.0)
    dens = np.full((11, 2), 1e18)
    cs = np.asarray(ls.cross_section(temp, per_mol=True))
    ec = np.asarray(ls.extinction(temp, dens))
    expected = (
        cs[0] * 1e18 * (1 - 1e-2) + cs[1] * 1e18 * 1e-2
    )
    np.testing.assert_allclose(ec, expected, rtol=1e-6)

    # Jit-safe parameter response + fill renormalization:
    fn = jax.jit(lambda p: ls.extinction(temp, dens, pars=p))
    ec2 = np.asarray(fn(jnp.asarray([-1.0])))
    expected2 = cs[0] * 1e18 * (1 - 1e-1) + cs[1] * 1e18 * 1e-1
    np.testing.assert_allclose(ec2, expected2, rtol=1e-6)
