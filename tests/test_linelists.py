"""Line-list readers vs the reference test suite's pinned counts."""
import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from pyratbay_tpu.opacity import partitions as pf
from pyratbay_tpu.opacity.tli import make_tli

INPUTS = REFERENCE_ROOT + 'tests/inputs/'


@requires_reference
def test_pands_chain(tmp_path):
    """Pinned counts: reference test_tli.py::test_pands."""
    pf_file = str(tmp_path / 'PF_kurucz_H2O.dat')
    pf_data, isos, temp = pf.kurucz(
        INPUTS + 'mock_h2opartfn.dat', outfile=pf_file,
    )
    assert isos == ['116', '117', '118', '126']
    summaries = make_tli(
        [INPUTS + 'mock_h2ofastfix.bin'], [pf_file], ['pands'],
        str(tmp_path / 'pands.tli'), 2.500, 2.501, 'um',
    )
    s = summaries[0]
    assert s['molecule'] == 'H2O'
    assert s['n_lines'] == 10183
    assert [str(i) for i in s['isotopes']] == ['116', '117', '118', '126']
    assert s['n_lines_iso'] == [9625, 207, 219, 132]
    assert s['ntemp'] == 5


@requires_reference
def test_exomol_chain(tmp_path):
    """Pinned counts: reference test_tli.py::test_exomol."""
    summaries = make_tli(
        [
            INPUTS + '14N-1H3__MockBYTe__04999-05000.trans',
            INPUTS + '15N-1H3__MockBYTe-15__04999-05000.trans',
        ],
        [INPUTS + 'PF_Exomol_NH3.dat'],
        ['exomol', 'exomol'],
        str(tmp_path / 'exomol.tli'), 2.0, 2.00002, 'um',
    )
    s = summaries[0]
    assert s['molecule'] == 'NH3'
    assert s['n_lines'] == 1000
    assert [str(i) for i in s['isotopes']] == ['4111', '5111']
    assert s['n_lines_iso'] == [500, 500]
    assert s['ntemp'] == 2000


@requires_reference
def test_repack_chain(tmp_path):
    """Pinned counts: reference test_tli.py::test_repack."""
    summaries = make_tli(
        [INPUTS + 'CO2_hitran_2.50-2.52um_repack-0.01_lbl.dat'],
        [INPUTS + 'PF_tips_CO2.dat'], ['repack'],
        str(tmp_path / 'repack.tli'), 2.50, 2.52, 'um',
    )
    s = summaries[0]
    assert s['molecule'] == 'CO2'
    assert s['n_lines'] == 720
    assert [str(i) for i in s['isotopes']] == ['266', '366', '628', '627']
    assert s['n_lines_iso'] == [670, 30, 12, 8]
    assert s['ntemp'] == 1001


@requires_reference
def test_tioschwenke_reader_registered():
    from pyratbay_tpu.opacity.linelists import get_linelist_reader
    for name in ('pands', 'tioschwenke', 'voplez', 'vald', 'hitran',
                 'exomol', 'repack'):
        assert get_linelist_reader(name) is not None
