"""FULL-TEXT __str__ snapshots of every public object family
(reference-style full-object pinning, tests/test_str.py there is
804 LoC of exact dumps).  Any change to an inspection dump must be
deliberate: update the snapshot here when it is.

Generated from the flagship setup (21 layers, 1.1-1.3 um, wnstep=2);
the model snapshot stops before the run-dependent timestamps block.
"""
import numpy as np
import pytest


@pytest.fixture(scope='module')
def flagship(tmp_path_factory):
    from pyratbay_tpu.benchmark import make_flagship
    tmp = str(tmp_path_factory.mktemp('strfull') / 'flag')
    return make_flagship(tmp, nlayers=21, wl_low=1.1, wl_high=1.3,
                         wnstep=2.0)


def _obj(flagship, kind, name=None):
    model = flagship[0]
    if kind == 'model':
        return model
    if kind == 'obs':
        return flagship[1]
    if kind == 'ret':
        return flagship[2]
    for t, m, _ in model.opacity_models:
        if t == kind and (name is None or m.name == name):
            return m
    raise KeyError(kind)

def test_strfull_model(flagship):
    text = str(_obj(flagship, 'model')).split('Last-run timestamps')[0]
    assert text == "TPU-native radiative-transfer model:\nRun mode (runmode): spectrum\nRT path (rt_path): transit\nWavenumber range: 7692.31 -- 9090.31 cm-1 (700 samples)\nPressure range: 1.00e-06 -- 1.00e+02 bar (21 layers)\nSpecies: ['H2', 'He', 'H', 'Na', 'K', 'H2O', 'CH4', 'CO', 'CO2']\nOpacity models:\n  line sampling          (line_sample)  T = [300.0, 3000.0] K\n  sodium_vdw             (alkali)\n  CIA H2-H2              (cia)  T = [60.0, 3000.0] K\n  deck                   (cloud)\n  lecavelier             (cloud)\nTemperature model: guillot\nRadius model: hydro_m\nSystem:\n  Planet radius (rplanet): 1.000 rjup\n  Planet mass (mplanet): 0.600 mjup\n  Stellar radius (rstar): 1.270 rsun\n  Stellar temperature (tstar): 5800.0 K\n  Semi-major axis (smaxis): 0.0450 au\n"


def test_strfull_model_od_after_run(flagship):
    """The last-run optical-depth block (the reference's pyrat.od dump
    capability): maxdepth + ideep range appear after a run."""
    model = _obj(flagship, 'model')
    model.run()
    text = str(model)
    assert 'Optical depth (last run):' in text
    assert '  Maximum depth to integrate (maxdepth): 10.00' in text
    ideep = np.asarray(model.ideep)
    assert (
        f'  ideep range (first layer at maxdepth): '
        f'[{ideep.min():d}, {ideep.max():d}] of 21 layers' in text
    )


def test_strfull_observation(flagship):
    text = str(_obj(flagship, 'obs'))
    assert text == 'Observed data:\nNumber of data points (ndata): 0\nNumber of filter bands (nbands): 20\n  tophat                   wl0 = 1.1300 um\n  tophat                   wl0 = 1.1374 um\n  tophat                   wl0 = 1.1447 um\n  tophat                   wl0 = 1.1521 um\n  tophat                   wl0 = 1.1595 um\n  tophat                   wl0 = 1.1668 um\n  tophat                   wl0 = 1.1742 um\n  tophat                   wl0 = 1.1816 um\n  tophat                   wl0 = 1.1889 um\n  tophat                   wl0 = 1.1963 um\n  tophat                   wl0 = 1.2037 um\n  tophat                   wl0 = 1.2111 um\n  tophat                   wl0 = 1.2184 um\n  tophat                   wl0 = 1.2258 um\n  tophat                   wl0 = 1.2332 um\n  tophat                   wl0 = 1.2405 um\n  tophat                   wl0 = 1.2479 um\n  tophat                   wl0 = 1.2553 um\n  tophat                   wl0 = 1.2626 um\n  tophat                   wl0 = 1.2700 um\n'


def test_strfull_retrieval_params(flagship):
    text = str(_obj(flagship, 'ret'))
    assert text == "Retrieval parameters:\nNumber of parameters (nparams): 7\nNumber of free parameters (nfree): 6\n  pname                 value       pmin       pmax    pstep\n  log_kappa'            -4.67         -9          5      0.3\n  T_irr                  1486        100       3000       50\n  log_H2O                -3.4         -9         -1      0.5\n  R_planet                  1        0.5        4.5     0.03\n  log_p_cl                  2         -6          2      0.5\n  log_k_ray                 0         -4          4      0.5\n  alpha_ray                -4         -6          0        0\nSampler: None\nTemperature bounds (tlow, thigh): [300.0, 3000.0] K\n"


def test_strfull_alkali(flagship):
    text = str(_obj(flagship, 'alkali'))
    assert text == 'Alkali van der Waals opacity: sodium_vdw\nSpecies: Na\nLine centers (cm-1): [16960.87, 16978.07]\nDetuning cutoff (cutoff): 4500.0\n'


def test_strfull_cia(flagship):
    text = str(_obj(flagship, 'cia'))
    assert text == "Collision-induced absorption: CIA H2-H2\nSpecies: ['H2', 'H2']\nTemperature range: 60.0 -- 3000.0 K (15 samples)\nWavenumber samples (nwave): 700\n"


def test_strfull_deck(flagship):
    text = str(_obj(flagship, 'cloud', 'deck'))
    assert text == "Cloud opacity model: deck\nParameters (['log_p_cl']): [2.0]\n"


def test_strfull_lecavelier(flagship):
    text = str(_obj(flagship, 'cloud', 'lecavelier'))
    assert text == "Cloud opacity model: lecavelier\nParameters (['log_k_ray', 'alpha_ray']): [0.0, -4.0]\n"


def test_strfull_line_sample(flagship):
    text = str(_obj(flagship, 'line_sample'))
    assert text == 'Line-sampled cross-section opacity:\nNumber of species (nspec): 1\n  H2O\nTemperature range: 300.0 -- 3000.0 K (10 samples)\nWavenumber range: 7692.308 -- 9090.308 cm-1 (700 samples)\nPressure layers (nlayers): 21\n'


def test_strfull_rayleigh(flagship):
    from pyratbay_tpu.opacity import Rayleigh
    model = flagship[0]
    text = str(Rayleigh('H2', np.asarray(model.wn)))
    assert text == 'Rayleigh opacity model: rayleigh_H2\nSpecies: H2\nCross section range: 2.877e-29 -- 5.631e-29 cm2 molec-1\n'


def test_strfull_h_ion(flagship):
    from pyratbay_tpu.opacity import HydrogenIon
    model = flagship[0]
    text = str(HydrogenIon(np.asarray(model.wn)))
    assert text == "H- bound-free/free-free opacity (John 1988)\nSpecies: ['H', 'e-']\nWavenumber samples (nwave): 700\n"


def test_strfull_ccsgray(flagship):
    from pyratbay_tpu.opacity import CCSgray
    model = flagship[0]
    text = str(CCSgray(np.asarray(model.press), np.asarray(model.wn)))
    assert text == "Cloud opacity model: ccsgray\nParameters (['log_k_gray', 'log_p_top', 'log_p_bot']): [0.0, -4.0, 2.0]\n"


def test_strfull_rayleigh_species_variants():
    """Per-species Rayleigh dumps (the reference pins H/He/H2
    separately, test_str.py:178-223 there)."""
    from pyratbay_tpu.opacity.rayleigh import Rayleigh
    wn = np.arange(5882.0, 9091.0, 1.0)
    assert str(Rayleigh('H', wn)) == (
        'Rayleigh opacity model: rayleigh_H\n'
        'Species: H\n'
        'Cross section range: 7.001e-30 -- 4.041e-29 cm2 molec-1\n'
    )
    assert str(Rayleigh('He', wn)) == (
        'Rayleigh opacity model: rayleigh_He\n'
        'Species: He\n'
        'Cross section range: 6.576e-31 -- 3.759e-30 cm2 molec-1\n'
    )


def test_strfull_cia_h2he():
    """Second bundled Borysow table (the reference pins H2-H2 and
    H2-He, test_str.py:224-284 there)."""
    from pyratbay_tpu import data
    from pyratbay_tpu.opacity.cia import CIA
    wn = np.arange(5882.0, 9091.0, 1.0)
    cia = CIA(data.cia_file('H2He'), wn=wn)
    assert str(cia) == (
        'Collision-induced absorption: CIA H2-He\n'
        "Species: ['H2', 'He']\n"
        'Temperature range: 50.0 -- 3000.0 K (20 samples)\n'
        'Wavenumber samples (nwave): 3209\n'
    )


def test_strfull_eclipse_model(tmp_path):
    """The emission-geometry model dump (the reference pins a
    separate pyrat emission str, test_str.py:633-698 there)."""
    from pyratbay_tpu.benchmark import make_flagship
    model, *_ = make_flagship(
        str(tmp_path / 'ecl'), nlayers=21, wl_low=1.1, wl_high=1.3,
        wnstep=2.0, rt_path='eclipse',
    )
    text = str(model).split('Last-run timestamps')[0]
    assert 'RT path (rt_path): eclipse' in text
    assert text == (
        "TPU-native radiative-transfer model:\nRun mode (runmode): "
        "spectrum\nRT path (rt_path): eclipse\nWavenumber range: "
        "7692.31 -- 9090.31 cm-1 (700 samples)\nPressure range: "
        "1.00e-06 -- 1.00e+02 bar (21 layers)\nSpecies: ['H2', 'He', "
        "'H', 'Na', 'K', 'H2O', 'CH4', 'CO', 'CO2']\nOpacity models:\n"
        "  line sampling          (line_sample)  T = [300.0, 3000.0] K\n"
        "  sodium_vdw             (alkali)\n"
        "  CIA H2-H2              (cia)  T = [60.0, 3000.0] K\n"
        "  deck                   (cloud)\n"
        "  lecavelier             (cloud)\n"
        "Temperature model: guillot\nRadius model: hydro_m\nSystem:\n"
        "  Planet radius (rplanet): 1.000 rjup\n"
        "  Planet mass (mplanet): 0.600 mjup\n"
        "  Stellar radius (rstar): 1.270 rsun\n"
        "  Stellar temperature (tstar): 5800.0 K\n"
        "  Semi-major axis (smaxis): 0.0450 au\n"
    )
