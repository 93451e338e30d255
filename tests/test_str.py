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


# ---------------------------------------------------------------------
# Exact full-text snapshots (frozen inspection surface, the
# reference's test_str.py style):

def test_str_tophat_snapshot():
    from pyratbay_tpu.spectrum.passbands import Tophat
    wn = np.arange(5882.0, 9091.0, 1.0)
    text = str(Tophat(1.4, 0.05, wn=wn))
    assert text == (
        'Instrument passband:\n'
        'Name (name): tophat\n'
        'Central wavelength (wl0): 1.4000 um\n'
        'Counting type: photon\n'
        'Wavelength range: 1.3499 -- 1.4501 um (513 samples)\n'
        'Resampled onto the model grid (idx set)\n'
    )


def test_str_wavenumber_grid_snapshot():
    from pyratbay_tpu.ops.grids import wavenumber_grid
    grid = wavenumber_grid(
        wl_low=1.1e-4, wl_high=1.7e-4, wnstep=1.0, wnosamp=2160,
    )
    assert str(grid) == (
        'Wavenumber sampling:\n'
        'Range: 5882.353 -- 9090.909 cm-1 (3209 samples)\n'
        'Constant wavenumber step (wnstep): 1.000 cm-1\n'
        'Fine grid: 6929281 samples (oversampling factor 2160)\n'
    )


def test_str_wavenumber_grid_resolution():
    from pyratbay_tpu.ops.grids import wavenumber_grid
    grid = wavenumber_grid(
        wnlow=5882.0, wnhigh=9091.0, resolution=5000.0,
    )
    text = str(grid)
    assert 'Constant resolving power (resolution): 5000.0' in text
    assert text.startswith('Wavenumber sampling:\n')


def test_str_voigt_grid_snapshot():
    from pyratbay_tpu.opacity.voigt_grid import VoigtGrid
    from pyratbay_tpu.ops.grids import wavenumber_grid
    grid = wavenumber_grid(
        wl_low=1.1e-4, wl_high=1.7e-4, wnstep=1.0, wnosamp=2160,
    )
    vg = VoigtGrid(
        1.0 / 2160, len(grid.own), grid.wn[0], grid.wn[-1],
        1e-6, 100.0, 1.0, 50.0, 1e-8, 3e-8, ndop=5, nlor=5,
    )
    assert str(vg) == (
        'Voigt-profile grid:\n'
        'Doppler HWHM range (dmin, dmax): '
        '[2.979e-03, 1.783e-01] cm-1 (5 samples)\n'
        'Lorentz HWHM range (lmin, lmax): '
        '[1.378e-08, 4.248e+01] cm-1 (5 samples)\n'
        'Profile extent (extent): 300.0 HWHM\n'
        'Profile cutoff (cutoff): 25.0 cm-1\n'
        'Doppler/Lorentz aliasing threshold (dlratio): 0.100\n'
        'Tabulated profile samples: 1248848\n'
    )


def test_str_observation_snapshot():
    from pyratbay_tpu.observation import Observation

    class _Cfg:
        data = [0.01, 0.02]
        uncert = [0.001, 0.001]
        filters = ['tophat 1.2 0.05', 'tophat 1.4 0.05']
        obsfile = None
        obsfile_hires = None
        dunits = None
        offset_inst = None
        uncert_scaling = None

    wn = np.arange(5882.0, 9091.0, 1.0)
    obs = Observation(_Cfg, wn)
    assert str(obs) == (
        'Observed data:\n'
        'Number of data points (ndata): 2\n'
        'Data (data):\n'
        '  [1.000000e-02 2.000000e-02]\n'
        'Uncertainties (uncert):\n'
        '  [1.000000e-03 1.000000e-03]\n'
        'Number of filter bands (nbands): 2\n'
        '  tophat                   wl0 = 1.2000 um\n'
        '  tophat                   wl0 = 1.4000 um\n'
    )


def test_str_retrieval_params(flagship):
    model, obs, ret = flagship[0], flagship[1], flagship[2]
    text = str(ret)
    assert text.startswith('Retrieval parameters:\n')
    assert 'Number of parameters (nparams): 7' in text
    assert "log_kappa'" in text and 'R_planet' in text
    assert 'Temperature bounds (tlow, thigh): [300.0, 3000.0] K' in text


def test_str_lbl(tmp_path):
    """Line-by-line engine inspection dump (the capability of the
    reference's pyrat/line_by_line.py __str__, test_str.py:285-366
    there): TLI files, databases, transition count, ranges, isotopes."""
    from conftest import REFERENCE_ROOT, reference_available
    import pytest as _pytest
    if not reference_available():
        _pytest.skip('reference inputs unavailable')
    from pyratbay_tpu.opacity.tli import make_tli
    from pyratbay_tpu.opacity.lbl import LineByLine
    from pyratbay_tpu.ops.grids import wavenumber_grid
    from pyratbay_tpu.io.io import species_properties

    tli = str(tmp_path / 'mock_h2o.tli')
    make_tli(
        [REFERENCE_ROOT + 'tests/inputs/Mock_HITRAN_H2O_1.00-1.01um.par'],
        ['tips'], ['hitran'], tli, 1.00, 1.01, 'um',
    )
    grid = wavenumber_grid(
        wl_low=1.001e-4, wl_high=1.009e-4, wnstep=1.0, wnosamp=2160,
    )
    species = ['H2', 'He', 'H2O']
    mass, radius = species_properties(species)
    lbl = LineByLine(
        tli, wn=grid.wn, species=species,
        mol_mass=mass, mol_radius=radius,
        own=np.asarray(grid.own), wnosamp=grid.wnosamp,
        ownstep=grid.ownstep, odivisors=np.asarray(grid.odivisors),
        pressure=np.logspace(-6, 2, 11),
    )
    text = str(lbl)
    assert text.startswith('Line-by-line opacity model:\n')
    assert 'Number of databases (ndb): 1' in text
    assert 'HITRAN H2O (4 isotopes)' in text
    assert 'Number of line transitions (ntransitions):' in text
    assert 'Wing cutoff (voigt_cutoff): 25.0 cm-1' in text
    assert '116' in text and '126' in text
