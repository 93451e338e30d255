"""I/O round-trip tests for every file format (the reference's
test_io.py surface: atm, spectrum, opacity npz, partition functions,
CIA cross sections, observations, pickled models).
"""
import numpy as np
import pytest

from pyratbay_tpu.io import io as pio
from pyratbay_tpu import constants as pc


# ---------------------------------------------------------------------
# Spectrum:

def test_read_write_spectrum(tmp_path):
    out = str(tmp_path / 'spec.dat')
    wl = np.linspace(1.1, 1.7, 100)
    spectrum = 0.005 + 1e-4 * np.sin(10.0 * wl)
    pio.write_spectrum(wl, spectrum, out, 'transit')
    # (File precision: 7 significant digits)
    wn_read, spec_read = pio.read_spectrum(out)
    np.testing.assert_allclose(wn_read, 1.0 / (wl * pc.um), rtol=1e-5)
    np.testing.assert_allclose(spec_read, spectrum, rtol=1e-6)
    # As wavelength:
    wl_read, spec_read2 = pio.read_spectrum(out, wn=False)
    np.testing.assert_allclose(wl_read, wl, rtol=1e-5)
    np.testing.assert_allclose(spec_read2, spectrum, rtol=1e-6)


# ---------------------------------------------------------------------
# Atmosphere (pt / ptq / ptqr):

def _atm_inputs(nlayers=11):
    press = np.logspace(-6, 2, nlayers)
    temp = np.linspace(800.0, 1500.0, nlayers)
    species = ['H2', 'He', 'H2O']
    vmr = np.tile([0.85, 0.149, 1e-3], (nlayers, 1))
    radius = np.linspace(1.06, 0.99, nlayers) * pc.rjup
    return press, temp, species, vmr, radius


def test_read_write_atm_pt(tmp_path):
    out = str(tmp_path / 'pt.atm')
    press, temp, *_ = _atm_inputs()
    pio.write_atm(out, press, temp, punits='bar')
    units, species, rpress, rtemp, rvmr, rradius = pio.read_atm(out)
    assert units[0] == 'bar'
    np.testing.assert_allclose(rpress, press, rtol=1e-6)
    np.testing.assert_allclose(rtemp, temp, rtol=1e-7)
    assert species is None
    assert rvmr is None
    assert rradius is None


def test_read_write_atm_ptq(tmp_path):
    out = str(tmp_path / 'ptq.atm')
    press, temp, species, vmr, _ = _atm_inputs()
    pio.write_atm(out, press, temp, species, vmr, punits='bar')
    units, rspecies, rpress, rtemp, rvmr, rradius = pio.read_atm(out)
    assert list(rspecies) == species
    np.testing.assert_allclose(rvmr, vmr, rtol=1e-7)
    assert rradius is None


def test_read_write_atm_ptqr(tmp_path):
    out = str(tmp_path / 'ptqr.atm')
    press, temp, species, vmr, radius = _atm_inputs()
    pio.write_atm(
        out, press, temp, species, vmr, radius=radius, punits='bar',
    )
    units, rspecies, rpress, rtemp, rvmr, rradius = pio.read_atm(out)
    assert rradius is not None
    np.testing.assert_allclose(
        rradius * pc.u(units[3]), radius, rtol=1e-6,
    )


# ---------------------------------------------------------------------
# Opacity table:

def test_read_write_opacity(tmp_path):
    out = str(tmp_path / 'opac.npz')
    species = ['H2O']
    temps = np.linspace(300.0, 3000.0, 4)
    press = np.logspace(-6, 2, 5)
    wn = np.linspace(5000.0, 6000.0, 30)
    opacity = np.random.default_rng(0).random((1, 4, 5, 30)) * 1e-20
    pio.write_opacity(out, species[0], temps, press, wn, opacity[0])

    rspecies, rtemps, rpress, rwn = pio.read_opacity(
        out, extract='arrays',
    )
    assert [str(s) for s in np.atleast_1d(rspecies)] == species
    np.testing.assert_allclose(rtemps, temps)
    np.testing.assert_allclose(rpress, press, rtol=1e-6)
    np.testing.assert_allclose(rwn, wn, rtol=1e-7)
    table = pio.read_opacity(out, extract='opacity')
    np.testing.assert_allclose(table, opacity[0], rtol=1e-7)


# ---------------------------------------------------------------------
# Partition functions:

def test_read_write_pf(tmp_path):
    out = str(tmp_path / 'pf.dat')
    isotopes = ['161', '181']
    # Round temperatures (the file stores them at %.1f):
    temp = np.arange(100.0, 1100.0, 100.0)
    pf = np.array([
        174.0 * (temp / 296.0)**1.5,
        175.0 * (temp / 296.0)**1.5,
    ])
    pio.write_pf(out, pf, isotopes, temp)
    rpf, risos, rtemp = pio.read_pf(out)
    assert list(risos) == isotopes
    np.testing.assert_allclose(rtemp, temp, rtol=1e-7)
    np.testing.assert_allclose(rpf, pf, rtol=1e-5)  # %.4f file precision


# ---------------------------------------------------------------------
# CIA cross sections:

def test_read_write_cs(tmp_path):
    out = str(tmp_path / 'cs.dat')
    species = ['H2', 'H2']
    temp = np.linspace(100.0, 1000.0, 4)
    wn = np.linspace(20.0, 100.0, 9)
    cs = np.outer((temp / 300.0)**-0.5, 1e-7 * np.exp(-wn / 50.0))
    pio.write_cs(out, cs, species, temp, wn)
    rcs, rspecies, rtemp, rwn = pio.read_cs(out)
    assert list(rspecies) == species
    np.testing.assert_allclose(rtemp, temp, rtol=1e-7)
    np.testing.assert_allclose(rwn, wn, rtol=1e-7)
    np.testing.assert_allclose(rcs, cs, rtol=5e-4)  # %.3e file precision


# ---------------------------------------------------------------------
# Observations:

def test_read_write_observations_tophats(tmp_path):
    out = str(tmp_path / 'obs.dat')
    data = np.array([0.0065, 0.0066])
    uncert = np.array([1e-5, 2e-5])
    filters = ['1.20 0.05', '1.40 0.05']
    pio.write_observations(out, data, uncert, filters)
    obs = pio.read_observations(out)
    np.testing.assert_allclose(obs['data'], data, rtol=1e-7)
    np.testing.assert_allclose(obs['uncert'], uncert, rtol=1e-7)
    assert len(obs['filters']) == 2


def test_read_write_observations_units(tmp_path):
    out = str(tmp_path / 'obs_ppm.dat')
    data = np.array([6500e-6, 6600e-6])
    uncert = np.array([20e-6, 30e-6])
    filters = ['1.20 0.05', '1.40 0.05']
    pio.write_observations(out, data, uncert, filters, dunits='ppm')
    obs = pio.read_observations(out)
    assert obs['dunits'] == 'ppm'
    # Values come back in absolute units regardless of file units:
    np.testing.assert_allclose(obs['data'], data, rtol=1e-7)
    np.testing.assert_allclose(obs['uncert'], uncert, rtol=1e-7)
