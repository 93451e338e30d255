"""Line-by-line pipeline tests: line-list readers, TLI round trip,
Voigt profile grid, and the sampling engine.

The reference's 'tli' golden spectra require the full HITRAN2012 H2O
list (downloaded in its CI; not available offline), so validation here
uses the shipped mock line lists plus independent physics checks
(HITRAN tabulated intensities, exact-Voigt cross checks).
"""
import numpy as np
import pytest
import scipy.special as ss

from conftest import requires_reference, REFERENCE_ROOT

import pyratbay_tpu.constants as pc
from pyratbay_tpu.opacity.tli import make_tli, read_tli
from pyratbay_tpu.opacity.voigt_grid import (
    pierluissi_voigt, voigt_binned_profile,
)

INPUTS = REFERENCE_ROOT + 'tests/inputs/'
MOCK_PAR = INPUTS + 'Mock_HITRAN_H2O_1.00-1.01um.par'

_SQRTLN2 = 0.83255461115769775635


@pytest.fixture(scope='module')
def mock_tli(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('tli') / 'mock_h2o.tli')
    summaries = make_tli(
        [MOCK_PAR], ['tips'], ['hitran'], path, 1.00, 1.01, 'um',
    )
    return path, summaries


@requires_reference
def test_make_tli_hitran_counts(mock_tli):
    """Pinned counts from the reference test suite (test_tli.py:16-39)."""
    _, summaries = mock_tli
    s = summaries[0]
    assert s['name'] == 'HITRAN H2O'
    assert s['molecule'] == 'H2O'
    assert s['n_lines'] == 888
    assert list(s['isotopes']) == ['116', '118', '117', '126']
    assert s['n_lines_iso'] == [672, 148, 62, 6]
    assert s['ntemp'] == 1201


@requires_reference
def test_tli_round_trip(mock_tli):
    path, _ = mock_tli
    dbs, wn, gf, elow, iso = read_tli(path)
    assert len(wn) == 888
    assert dbs[0].molname == 'H2O'
    np.testing.assert_allclose(dbs[0].iso_mass[0], 18.01056)
    # Sorted by isotope then wavenumber:
    assert np.all(np.diff(iso) >= 0)
    for i in range(4):
        seg = wn[iso == i]
        assert np.all(np.diff(seg) >= 0)
    # Range extraction:
    _, wn2, _, _, _ = read_tli(path, 9950.0, 9980.0)
    assert np.all((wn2 >= 9950) & (wn2 <= 9980))


@requires_reference
def test_line_strengths_vs_hitran(mock_tli):
    """Computed strengths reproduce the HITRAN intensity field at 296K.

    The TLI chain never reads that field (it recomputes strengths from
    Einstein-A + TIPS partition functions), so agreement is an
    independent physics check.
    """
    path, _ = mock_tli
    iso_map = {'1': 0, '2': 1, '3': 2, '4': 3}
    wn_ref, s_ref, elow_ref = [], [], []
    with open(MOCK_PAR) as f:
        for line in f:
            if float(line[45:55]) <= 0:
                continue
            wn_ref.append(float(line[3:15]))
            s_ref.append(float(line[15:25]))
            elow_ref.append(float(line[45:55]))
    wn_ref = np.array(wn_ref)
    s_ref = np.array(s_ref)
    order = np.argsort(wn_ref)
    wn_ref, s_ref = wn_ref[order], s_ref[order]

    dbs, lwn, gf, elow, isoid = read_tli(path)
    db = dbs[0]
    temp = 296.0
    pf = np.array([
        np.interp(temp, db.temp, db.iso_pf[j]) for j in range(db.niso)
    ])
    k = (
        pc.SIGCTE * db.iso_ratio[isoid] * gf
        * np.exp(-pc.EXPCTE * elow / temp)
        * -np.expm1(-pc.EXPCTE * lwn / temp) / pf[isoid]
    )
    idx = np.clip(np.searchsorted(wn_ref, lwn), 0, len(wn_ref) - 1)
    matched = np.abs(wn_ref[idx] - lwn) < 1e-4
    assert matched.sum() == len(lwn)
    ratio = k[matched] / s_ref[idx][matched]
    # HITRAN intensities are rounded to ~4 digits; median must be tight:
    assert abs(np.median(ratio) - 1.0) < 1e-3
    assert np.percentile(np.abs(ratio - 1.0), 90) < 0.02


def test_pierluissi_voigt_accuracy():
    """Pierluissi approximation vs exact Faddeeva.

    ~1e-3 relative by design where the profile is significant; the
    approximation is known to degrade in the deep Gaussian tail
    (x ~ 3, y ~ 0, values < 1e-3 of peak) -- the reference shares
    that behavior since this is the same formula (voigt.h:147-217).
    """
    for a_dop, a_lor in [(0.05, 0.02), (0.01, 0.1), (0.03, 1e-4)]:
        x_wn = np.linspace(0, 3.0, 500)
        x = _SQRTLN2 * x_wn / a_dop
        y = _SQRTLN2 * a_lor / a_dop
        mine = pierluissi_voigt(x, y, a_dop)
        sigma = a_dop / np.sqrt(np.log(2))
        exact = ss.wofz((x_wn + 1j * a_lor) / sigma).real / (
            sigma * np.sqrt(np.pi))
        significant = exact > 1e-3 * exact.max()
        np.testing.assert_allclose(
            mine[significant], exact[significant], rtol=2e-3,
        )


def test_binned_profile_area():
    """Binned profiles conserve area (integral ~= 1 minus cut wings)."""
    dwn = 1.0 / 2160
    prof = voigt_binned_profile(5000, dwn, 0.02, 0.05)
    assert len(prof) == 10001
    np.testing.assert_allclose(prof.sum() * dwn, 1.0, rtol=0.01)
    # Bins average over [x_j, x_j+dwn] (reference voigt.h convention),
    # so the peak lands within half a bin of the center:
    assert np.argmax(prof) in (4999, 5000)


@requires_reference
def test_lbl_transmission_end_to_end(tmp_path, mock_tli):
    """Full chain: TLI -> Voigt grid -> sampling -> transit spectrum."""
    import configparser
    path, _ = mock_tli
    ini = configparser.ConfigParser()
    ini.optionxform = str
    ini.read(REFERENCE_ROOT + 'tests/configs/spectrum_transmission_test.cfg')
    for key in ('sampled_cross_sec', 'continuum_cross_sec', 'alkali',
                'clouds'):
        ini.remove_option('pyrat', key)
    ini.set('pyrat', 'tlifile', path)
    ini.set('pyrat', 'wl_low', '1.0 um')
    ini.set('pyrat', 'wl_high', '1.01 um')
    cfg = str(tmp_path / 'lbl.cfg')
    with open(cfg, 'w') as f:
        ini.write(f)

    from pyratbay_tpu.model import Model
    model = Model(cfg, root=REFERENCE_ROOT)
    model.run()
    spec = model.spectrum
    floor = (model.radius[-1] / model.rstar)**2
    assert np.all(np.isfinite(spec))
    assert np.all(spec >= floor * 0.9999)
    # H2O lines must absorb measurably in this window:
    assert spec.max() - floor > 1e-4 * floor

    # Sampled cross sections match a direct exact-Voigt evaluation
    # (different algorithm: no width grid, no profile binning, no
    # dynamic downsampling) to ~2% in the line-dominated region:
    lbl = model.opacity_models[0][1]
    temp = model.temp
    dens = np.asarray(
        __import__('pyratbay_tpu.atmosphere.hydro', fromlist=['x'])
        .ideal_gas_density(model.base_vmr, model.press, temp)
    )
    layer = 40
    cs_engine = lbl.cross_section(temp, dens, layer=layer)[layer]

    pf = lbl.iso_pf(np.array([temp[layer]]))[:, 0]
    alphal, alphad = lbl._layer_widths(temp[layer], dens[layer])
    wn_out = model.wn
    cs_exact = np.zeros(len(wn_out))
    k = (
        pc.SIGCTE * lbl.iso_ratio[lbl.isoid] * lbl.gf
        * np.exp(-pc.EXPCTE * lbl.elow / temp[layer])
        * -np.expm1(-pc.EXPCTE * lbl.lwn / temp[layer])
        / pf[lbl.isoid]
    )
    for ln in range(lbl.ntransitions):
        iso = lbl.isoid[ln]
        a_d = alphad[iso] * lbl.lwn[ln]
        a_l = alphal[iso]
        sigma = a_d / np.sqrt(np.log(2))
        dx = wn_out - lbl.lwn[ln]
        prof = ss.wofz((dx + 1j * a_l) / sigma).real / (
            sigma * np.sqrt(np.pi))
        prof[np.abs(dx) > lbl.cutoff] = 0.0
        cs_exact += k[ln] * prof
    strong = cs_exact > 0.05 * cs_exact.max()
    ratio = cs_engine[strong] / cs_exact[strong]
    assert np.median(np.abs(ratio - 1.0)) < 0.05
