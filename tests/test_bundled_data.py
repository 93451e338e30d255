"""Bundled data files: CIA tables, instrument filter library, and solar
abundances ship with the package (converted to npz), so reference-style
configs run with zero user-supplied data files
(reference pyratbay/data/).
"""
import os

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from pyratbay_tpu import data as pdata

REF_CIA = REFERENCE_ROOT + 'pyratbay/data/CIA/'
REF_FILTERS = REFERENCE_ROOT + 'pyratbay/data/filters/'


def test_bundled_cia_listing():
    names = pdata.list_cia()
    assert len(names) == 4
    assert any('H2H2' in name for name in names)
    assert any('H2He' in name for name in names)
    # Species-pair and basename lookups:
    assert os.path.isfile(pdata.cia_file('H2H2'))
    assert os.path.isfile(
        pdata.cia_file('CIA_Borysow_H2H2_0060-7000K_0.6-500um.dat'))
    with pytest.raises(FileNotFoundError, match='No bundled CIA'):
        pdata.cia_file('XYZ')


@requires_reference
def test_bundled_cia_matches_reference_table():
    from pyratbay_tpu.opacity.cia import CIA
    ref = CIA(REF_CIA + 'CIA_Borysow_H2H2_0060-7000K_0.6-500um.dat')
    mine = CIA(pdata.cia_file('H2H2'))
    assert mine.species == ref.species
    np.testing.assert_allclose(mine.temps, ref.temps)
    np.testing.assert_allclose(mine.wn, ref.wn)
    np.testing.assert_allclose(
        np.asarray(mine.tab_cross_section),
        np.asarray(ref.tab_cross_section), rtol=1e-12,
    )


def test_bundled_filters_listing():
    names = pdata.list_filters()
    assert 'kepler' in names and 'tess' in names
    assert 'spitzer_irac1' in names
    wl, resp = pdata.filter_response('kepler')
    assert wl.shape == resp.shape
    assert 0.3 < wl.min() < wl.max() < 1.0  # Kepler band (um)
    with pytest.raises(FileNotFoundError, match='No bundled filter'):
        pdata.filter_response('jwst_miri')


@requires_reference
def test_bundled_filter_matches_reference_file():
    from pyratbay_tpu.spectrum.passbands import PassBand
    wn = np.linspace(1e4 / 1.0, 1e4 / 0.35, 2000)
    ref = PassBand(REF_FILTERS + 'kepler.dat', wn=wn)
    wl, resp = pdata.filter_response('kepler')
    mine = PassBand.from_arrays(wl, resp, 'kepler', wn=wn)
    np.testing.assert_allclose(mine.wl0, ref.wl0, rtol=1e-10)
    np.testing.assert_allclose(mine.response, ref.response, rtol=1e-10)
    rng = np.random.default_rng(0)
    spec = 1.0 + 0.1 * rng.random(len(wn))
    np.testing.assert_allclose(
        mine.integrate(spec), ref.integrate(spec), rtol=1e-12,
    )


def test_solar_abundances_bundled():
    from pyratbay_tpu.atmosphere.chem import SOLAR_ABUNDANCES
    assert 'asplund_2009' in SOLAR_ABUNDANCES
    assert 'asplund_2021' in SOLAR_ABUNDANCES
    a09 = SOLAR_ABUNDANCES['asplund_2009']
    assert abs(a09['H'] - 12.0) < 1e-9
    assert abs(a09['O'] - 8.69) < 1e-9


@requires_reference
def test_out_of_the_box_config(tmp_path):
    """A config naming reference-style CIA files and a bundled
    instrument filter runs with zero user-supplied data files."""
    from pyratbay_tpu.model import Model
    from pyratbay_tpu.observation import Observation
    from pyratbay_tpu.io import io as pio

    press = np.logspace(-6, 2, 21)
    species = ['H2', 'He', 'H']
    vmr = np.tile([0.85, 0.149, 1e-3], (21, 1))
    temp = np.full(21, 1200.0)
    atmfile = str(tmp_path / 'simple.atm')
    pio.write_atm(atmfile, press, temp, species, vmr, punits='bar')

    cfg_text = f"""[pyrat]
runmode = spectrum
verb = -1
rt_path = transit
atmfile = {atmfile}
continuum_cross_sec =
    CIA_Borysow_H2H2_0060-7000K_0.6-500um.dat
wl_low = 0.4 um
wl_high = 0.9 um
wnstep = 10.0
rstar = 1.0 rsun
mplanet = 1.0 mjup
rplanet = 1.0 rjup
refpressure = 0.1 bar
radmodel = hydro_m
filters = kepler
"""
    cfg_file = str(tmp_path / 'box.cfg')
    with open(cfg_file, 'w') as f:
        f.write(cfg_text)

    model = Model(cfg_file)
    model.run()
    assert np.all(np.isfinite(model.spectrum))
    obs = Observation(model.cfg, model.wn)
    assert obs.nbands == 1
    assert obs.filters[0].name == 'kepler'
    bandflux = np.asarray(obs.band_integrate(model.spectrum))
    assert np.isfinite(bandflux).all()
