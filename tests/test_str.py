"""__str__ snapshot tests: pin the inspection API of every public
object (the reference pins its Formatted_Write dumps the same way,
tests/test_str.py)."""
import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT


@pytest.fixture(scope='module')
def flagship(tmp_path_factory):
    from pyratbay_tpu.benchmark import make_flagship
    tmp = str(tmp_path_factory.mktemp('str') / 'flag')
    return make_flagship(tmp, nlayers=21, wl_low=1.1, wl_high=1.3,
                         wnstep=2.0)


def test_str_model(flagship):
    model = flagship[0]
    text = str(model)
    assert 'TPU-native radiative-transfer model:' in text
    assert 'Run mode (runmode): spectrum' in text
    assert 'RT path (rt_path): transit' in text
    assert 'Wavenumber range: 7692.31 -- 9090.31 cm-1 (700 samples)' \
        in text
    assert 'Pressure range: 1.00e-06 -- 1.00e+02 bar (21 layers)' in text
    assert 'line sampling' in text and 'sodium_vdw' in text
    assert 'Temperature model: guillot' in text
    assert 'Radius model: hydro_m' in text


def test_str_line_sample(flagship):
    model = flagship[0]
    ls = model.opacity_models[0][1]
    text = str(ls)
    assert text == (
        'Line-sampled cross-section opacity:\n'
        'Number of species (nspec): 1\n'
        '  H2O\n'
        'Temperature range: 300.0 -- 3000.0 K (10 samples)\n'
        'Wavenumber range: 7692.308 -- 9090.308 cm-1 (700 samples)\n'
        'Pressure layers (nlayers): 21\n'
    )


def test_str_cia(flagship):
    model = flagship[0]
    cia = [m for t, m, _ in model.opacity_models if t == 'cia'][0]
    text = str(cia)
    assert 'Collision-induced absorption: CIA H2-H2' in text
    assert "Species: ['H2', 'H2']" in text
    assert 'Temperature range: 60.0 -- 3000.0 K (15 samples)' in text


def test_str_alkali(flagship):
    model = flagship[0]
    alkali = [m for t, m, _ in model.opacity_models if t == 'alkali'][0]
    text = str(alkali)
    assert 'Alkali van der Waals opacity: sodium_vdw' in text
    assert 'Species: Na' in text
    assert 'Detuning cutoff (cutoff): 4500.0' in text


def test_str_clouds(flagship):
    model = flagship[0]
    clouds = [m for t, m, _ in model.opacity_models if t == 'cloud']
    texts = [str(m) for m in clouds]
    assert any('Cloud opacity model: deck' in t for t in texts)
    assert any('Cloud opacity model: lecavelier' in t for t in texts)
    deck_text = [t for t in texts if 'deck' in t][0]
    assert "Parameters (['log_p_cl']): [2.0]" in deck_text


def test_str_rayleigh():
    from pyratbay_tpu.opacity import Rayleigh
    wn = np.arange(5000.0, 5100.0, 1.0)
    text = str(Rayleigh('H2', wn))
    assert text.startswith('Rayleigh opacity model: rayleigh_H2\n')
    assert 'Species: H2' in text
    assert 'Cross section range:' in text


@requires_reference
def test_str_h_ion():
    from pyratbay_tpu.opacity import HydrogenIon
    wn = np.arange(5000.0, 5100.0, 1.0)
    text = str(HydrogenIon(wn))
    assert 'H- bound-free/free-free opacity (John 1988)' in text
    assert "Species: ['H', 'e-']" in text
    assert 'Wavenumber samples (nwave): 100' in text
