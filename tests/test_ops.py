"""Unit tests for core numerics, cross-checked against reference golden
arrays (tests/expected in the reference repo) and scipy.
"""
import numpy as np
import pytest
import scipy.special as ss
import scipy.integrate as si

import jax.numpy as jnp

import pyratbay_tpu.constants as pc
from pyratbay_tpu import ops
from pyratbay_tpu.atmosphere import profiles

from conftest import requires_reference, REFERENCE_ROOT

EXPECTED = REFERENCE_ROOT + 'tests/expected/'


# --------------------------------------------------------------------------
# Faddeeva / Voigt

def test_wofz_real_vs_scipy():
    x = np.linspace(-300.0, 300.0, 4001)
    for y in [1e-8, 1e-4, 0.01, 0.5, 1.0, 10.0, 300.0]:
        got = np.asarray(ops.wofz_real(x, y))
        want = ss.wofz(x + 1j * y).real
        np.testing.assert_allclose(got, want, rtol=1e-9)


@pytest.mark.parametrize('hwhm_L', [0.01, 0.1, 1.0, 10.0, 100.0])
@requires_reference
def test_voigt_ref_golden(hwhm_L):
    nwidths = 10.0
    hwhm_G = 1.0
    width = 0.5346 * hwhm_L + np.sqrt(0.2166 * hwhm_L**2 + hwhm_G**2)
    x = np.arange(-nwidths * width, nwidths * width, width / 300.0)
    got = np.asarray(ops.voigt_ref(x, hwhm_L, hwhm_G))
    want = np.load(f'{EXPECTED}expected_profile_voigt{hwhm_L}_test.npz')[
        'arr_0']
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_voigt_profile_integral():
    x = np.linspace(-1000.0, 1000.0, 100001)
    for hwhm_L, hwhm_G in [(1e-2, 1.0), (1.0, 1.0), (1.0, 1e-2)]:
        profile = np.asarray(ops.voigt_profile(x, hwhm_L, hwhm_G))
        np.testing.assert_allclose(np.trapezoid(profile, x), 1.0, rtol=1e-3)


def test_doppler_lorentz_hwhm():
    dop = np.asarray(ops.doppler_hwhm(1000.0, np.array([18.0, 44.0]), 1e4))
    np.testing.assert_allclose(
        dop, [0.02669241481944169, 0.01707252588229824], rtol=1e-7)

    masses = np.array([18.0, 44.0, 2.0, 4.0])
    radii = np.array([1.6, 1.9, 1.45, 1.4]) * pc.A
    vmr = np.array([1e-4, 1e-4, 0.85, 0.15])
    lor = np.asarray(
        ops.lorentz_hwhm(1000.0, 1.0, masses, radii, vmr, np.array([0, 1])))
    np.testing.assert_allclose(
        lor, [0.036911106660883666, 0.04308068108378928], rtol=1e-7)


# --------------------------------------------------------------------------
# Temperature models

# Fixed 20-layer Guillot values pinned by the reference kernel tests
# (reference tests/test_src.py:21-28):
GUILLOT_TEMP = np.array([
    1247.34007597, 1247.25420737, 1247.05317072, 1246.58981369,
    1245.54307503, 1243.2402402, 1238.35469967, 1228.5250307,
    1210.37410313, 1181.94657437, 1152.76433729, 1158.74965957,
    1231.41559729, 1343.09186968, 1431.70753501, 1456.94915967,
    1458.09017515, 1458.86603858, 1460.90529873, 1466.24155921,
])


def test_guillot_vs_reference_values():
    nlayers = 20
    press = np.logspace(-6, 2, nlayers)  # bar
    grav = np.tile(2200.0, nlayers)
    params = np.array([-1.5, -0.8, 0.4, 0.5, 1200.0, 100.0])
    temp = np.asarray(profiles.guillot_tp(press, grav)(params))
    np.testing.assert_allclose(temp, GUILLOT_TEMP, rtol=1e-7)

    # kappa'/gravity degeneracy:
    params2 = params.copy()
    params2[0] -= np.log10(2200.0)
    temp2 = np.asarray(profiles.guillot_tp(press)(params2))
    np.testing.assert_allclose(temp2, GUILLOT_TEMP, rtol=1e-7)


def test_isothermal():
    press = np.logspace(-6, 2, 11)
    temp = np.asarray(profiles.isothermal_tp(press)(1500.0))
    np.testing.assert_allclose(temp, np.tile(1500.0, 11))


def test_madhu_profile_smooth():
    press = np.logspace(-7, 2, 101)
    params = [-3.5, 0.0, 0.5, 3.0, 0.5, 1500.0]
    temp = np.asarray(profiles.madhu_tp(press)(params))
    assert temp.shape == (101,)
    assert np.all(temp > 1000)
    assert np.all(np.isfinite(temp))
    # Inverted ordering must zero out:
    bad = np.asarray(profiles.madhu_tp(press)([1.0, 0.0, 0.5, 3, 0.5, 1500]))
    np.testing.assert_allclose(bad, 0.0)


# --------------------------------------------------------------------------
# Integration / grids / planck

def test_simpson_matches_scipy():
    for nx in (98, 99):
        x = np.linspace(-3, 3, nx)
        y = np.exp(-0.5 * (x / 0.5) ** 2) / np.sqrt(2 * np.pi * 0.25)
        got = float(ops.simpson_nonuniform(jnp.asarray(y), x=x))
        np.testing.assert_allclose(got, si.simpson(y, x=x), rtol=1e-12)


def test_cumtrapz():
    x = np.linspace(0, 1, 50)
    y = x**2
    got = np.asarray(ops.cumtrapz(jnp.asarray(y), jnp.asarray(x)))
    want = si.cumulative_trapezoid(y, x, initial=0.0)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_constant_resolution_spectrum():
    wl = ops.constant_resolution_spectrum(0.5, 4.0, 5.5)
    wl_mean = 0.5 * (wl[1:] + wl[:-1])
    np.testing.assert_allclose(wl_mean / np.ediff1d(wl), 5.5)


def test_wavenumber_grid():
    grid = ops.wavenumber_grid(
        wl_low=1.1 * pc.um, wl_high=1.7 * pc.um, wnstep=1.0, wnosamp=2160,
    )
    assert grid.wn[0] == pytest.approx(1.0 / (1.7e-4))
    assert grid.wnosamp == 2160
    np.testing.assert_allclose(np.ediff1d(grid.wn), 1.0)
    np.testing.assert_allclose(np.ediff1d(grid.own), 1.0 / 2160)


def test_blackbody_wn():
    wn = np.logspace(1, 5, 300)
    temp = 1500.0
    got = np.asarray(ops.blackbody_wn(wn, temp))
    want = (
        2 * pc.H_KERNEL * pc.LS_KERNEL**2 * wn**3
        / (np.exp(pc.H_KERNEL * pc.LS_KERNEL * wn / (pc.KB_KERNEL * temp))
           - 1)
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # Bolometric check: pi * integral B dnu = sigma T^4
    total = np.pi * np.trapezoid(want, wn)
    np.testing.assert_allclose(total, pc.sigma_sb * temp**4, rtol=1e-3)


def test_e2():
    x = np.array([1e-6, 0.1, 1.0, 5.0, 50.0])
    got = np.asarray(ops.e2(x))
    want = ss.expn(2, x)
    np.testing.assert_allclose(got, want, rtol=1e-10)


# --------------------------------------------------------------------------
# Spline interpolation (reference-compatible)

@requires_reference
def test_splinterp_vs_reference_cia():
    # Resample a CIA table row and check it is smooth & bounded:
    from pyratbay_tpu.io import read_cs
    cia_file = (
        REFERENCE_ROOT
        + 'pyratbay/data/CIA/CIA_Borysow_H2H2_0060-7000K_0.6-500um.dat'
    )
    absorption, species, temps, tab_wn = read_cs(cia_file)
    assert species == ['H2', 'H2']
    wn_out = np.linspace(tab_wn[10], tab_wn[100], 500)
    y2 = ops.second_deriv_ref(absorption[5], tab_wn)
    out = ops.splinterp(absorption[5], tab_wn, y2, wn_out)
    assert np.all(np.isfinite(out))
    # On-grid points reproduce the table:
    y_on = ops.splinterp(absorption[5], tab_wn, y2, tab_wn[10:100])
    np.testing.assert_allclose(y_on, absorption[5][10:100], rtol=1e-12)
