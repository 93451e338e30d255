"""Standalone opacity-object golden tests against the reference's
stored expected arrays (tests/expected/expected_{alkali,cia}_*.npz and
the Gauss/Lorentz profile goldens) -- the reference's
test_opacity_alkali.py / test_opacity_cia.py / test_broadening.py
setups reproduced on this package's objects.

Densities come from this package's native equilibrium chemistry; on
these inert species sets it matches chemcat to ~3e-5, so extinction
coefficients are compared at the reference's rtol 1e-4 while the
chemistry-free cross sections pin at 1e-7.
"""
import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from pyratbay_tpu import atmosphere as atm
from pyratbay_tpu.atmosphere.chem import chemistry
from pyratbay_tpu.ops.grids import wavenumber_grid
from pyratbay_tpu.ops.special import Gauss, Lorentz

EXPECTED = REFERENCE_ROOT + 'tests/expected/'
CIA_FILE = (
    REFERENCE_ROOT
    + 'pyratbay/data/CIA/CIA_Borysow_H2H2_0060-7000K_0.6-500um.dat'
)

NLAYERS = 6
PRESSURE = np.asarray(atm.pressure('1e-8 bar', '1e2 bar', NLAYERS))


def _equilibrium_densities(species, temperature):
    net, specs, vmr = chemistry(
        'equilibrium', PRESSURE, temperature, species,
    )
    dens = np.asarray(
        atm.ideal_gas_density(vmr, PRESSURE, temperature),
    )
    return {spec: dens[:, i] for i, spec in enumerate(specs)}


def _resolution_grid(wl_low, wl_high, resolution):
    return np.asarray(wavenumber_grid(
        wnlow=1e4 / wl_high, wnhigh=1e4 / wl_low, resolution=resolution,
    ).wn)


# ---------------------------------------------------------------------
# Alkali (reference test_opacity_alkali.py:123-231):

@requires_reference
@pytest.mark.parametrize('species', ['Na', 'K'])
def test_alkali_opacity_golden(species):
    from pyratbay_tpu.opacity.alkali import SodiumVdW, PotassiumVdW

    if species == 'Na':
        wn = _resolution_grid(0.55, 0.65, 15000.0)
        model = SodiumVdW(PRESSURE, wn, cutoff=1000.0)
    else:
        wn = _resolution_grid(0.70, 0.84, 15000.0)
        model = PotassiumVdW(PRESSURE, wn, cutoff=1000.0)

    expected = np.load(f'{EXPECTED}expected_alkali_{species}_opacity.npz')
    temp1 = np.tile(1000.0, NLAYERS)
    temp2 = np.tile(2500.0, NLAYERS)

    cs1 = np.asarray(model.cross_section(temp1))
    np.testing.assert_allclose(cs1, expected['expected_cs1'], rtol=1e-7)
    cs2 = np.asarray(model.cross_section(temp2))
    np.testing.assert_allclose(cs2, expected['expected_cs2'], rtol=1e-7)

    # EC = CS x density; densities come from this package's chemistry,
    # which deviates from chemcat by up to ~6e-4 on the K abundance
    # (Na: ~3e-5), so the EC comparison is density-limited at 1e-3
    # while the CS above pins the physics at 1e-7:
    dens = _equilibrium_densities(
        ['Na', 'K', 'H2', 'H', 'He'], temp1,
    )[species]
    ec1 = np.asarray(model.extinction(temp1, dens))
    np.testing.assert_allclose(ec1, expected['expected_ec1'], rtol=1e-3)
    ec2 = np.asarray(model.extinction(temp2, dens))
    np.testing.assert_allclose(ec2, expected['expected_ec2'], rtol=1e-3)
    # And density-independent EC/CS consistency at machine precision:
    np.testing.assert_allclose(ec1, cs1 * dens[:, None], rtol=1e-12)


# ---------------------------------------------------------------------
# CIA H2-H2 (reference test_opacity_cia.py:99-165, shipped Borysow
# table):

@requires_reference
def test_cia_opacity_golden():
    from pyratbay_tpu.opacity.cia import CIA

    wn = _resolution_grid(0.5, 10.0, 15.0)
    cia = CIA(CIA_FILE, wn=wn)
    expected = np.load(f'{EXPECTED}expected_cia_H2H2_opacity.npz')

    temp1 = np.tile(1200.0, NLAYERS)
    cs1 = np.asarray(cia.cross_section(temp1))
    np.testing.assert_allclose(cs1, expected['expected_cs1'], rtol=1e-7)

    temp2 = np.tile(3050.0, NLAYERS)
    cs2 = np.asarray(cia.cross_section(temp2))
    np.testing.assert_allclose(cs2, expected['expected_cs2'], rtol=1e-7)

    # Scalar-temperature single layer:
    cs3 = np.asarray(cia.cross_section(1200.0))
    assert cs3.shape == (len(wn),)
    np.testing.assert_allclose(cs3, expected['expected_cs3'], rtol=1e-7)

    dens = _equilibrium_densities(['H2', 'H', 'He'], temp1)['H2']
    densities = np.stack([dens, dens], axis=1)
    ec1 = np.asarray(cia.extinction(temp1, densities))
    np.testing.assert_allclose(ec1, expected['expected_ec1'], rtol=1e-4)

    ec3 = np.asarray(cia.extinction(1200.0, densities[3]))
    assert ec3.shape == (len(wn),)
    np.testing.assert_allclose(ec3, expected['expected_ec3'], rtol=1e-4)


# ---------------------------------------------------------------------
# Gauss / Lorentz profile goldens (reference test_broadening.py):

@requires_reference
def test_lorentz_profile_golden():
    lor = Lorentz(x0=0.0, hwhm=1.0, scale=1.0)
    x = np.linspace(-10.0, 10.0, 1001)
    expected = np.load(
        f'{EXPECTED}expected_profile_lorentz_test.npz')['arr_0']
    np.testing.assert_allclose(np.asarray(lor(x)), expected, rtol=1e-7)
    # HWHM and unit area:
    xw = np.linspace(-1000.0, 1000.0, 100001)
    vals = np.asarray(lor(xw))
    np.testing.assert_approx_equal(np.trapezoid(vals, xw), 1.0, 3)


@requires_reference
def test_gauss_profile_golden():
    gauss = Gauss(x0=0.0, hwhm=1.0, scale=1.0)
    x = np.linspace(-5.0, 5.0, 1001)
    expected = np.load(
        f'{EXPECTED}expected_profile_gauss_test.npz')['arr_0']
    np.testing.assert_allclose(np.asarray(gauss(x)), expected, rtol=1e-7)
    xw = np.linspace(-100.0, 100.0, 100001)
    vals = np.asarray(gauss(xw))
    np.testing.assert_approx_equal(np.trapezoid(vals, xw), 1.0, 7)


@requires_reference
def test_voigt_object_limits():
    """Voigt object -> Gauss/Lorentz limits (reference
    test_broadening.py Voigt limit checks)."""
    from pyratbay_tpu.ops.special import Voigt

    x = np.linspace(-10.0, 10.0, 1001)
    # Gaussian limit (hwhm_L -> 0); atol floors the underflowed far
    # tails (the Gaussian reaches ~1e-30 at |x| = 10):
    voigt = Voigt(x0=0.0, hwhm_L=1e-10, hwhm_G=1.0)
    gauss = Gauss(x0=0.0, hwhm=1.0)
    np.testing.assert_allclose(
        np.asarray(voigt(x)), np.asarray(gauss(x)),
        rtol=1e-6, atol=1e-10,
    )
    # Lorentz limit (hwhm_G << hwhm_L; rational-approximation branch):
    voigt = Voigt(x0=0.0, hwhm_L=1.0, hwhm_G=1e-4)
    lor = Lorentz(x0=0.0, hwhm=1.0)
    np.testing.assert_allclose(
        np.asarray(voigt(x)), np.asarray(lor(x)), rtol=1e-4,
    )
