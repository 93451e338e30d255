"""Config-validation error paths: every user-facing raise gets a
pinned message (the reference's largest test file,
tests/test_fails.py, is this matrix for its parser)."""
import configparser

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from pyratbay_tpu.config import parser as cfg_parser
from pyratbay_tpu.model import Model
from pyratbay_tpu.observation import Observation

BASE_CFG = REFERENCE_ROOT + 'tests/configs/spectrum_transmission_test.cfg'


def make_config(tmp_path, reset={}, remove=[], base=None):
    config = configparser.ConfigParser()
    config.optionxform = str
    config.read([base or BASE_CFG])
    # The base config points at a non-shipped opacity table; drop it
    # unless the test provides one:
    if 'sampled_cross_sec' not in reset:
        config.remove_option('pyrat', 'sampled_cross_sec')
    for var, val in reset.items():
        config.set('pyrat', var, val)
    for var in remove:
        config.remove_option('pyrat', var)
    cfg_file = str(tmp_path / 'fail.cfg')
    with open(cfg_file, 'w') as cfg:
        config.write(cfg)
    return cfg_file


def test_missing_config(tmp_path):
    with pytest.raises(
            FileNotFoundError,
            match="Configuration file 'nope.cfg' not found"):
        cfg_parser.parse('nope.cfg')


def test_no_pyrat_section(tmp_path):
    cfg = str(tmp_path / 'bad.cfg')
    with open(cfg, 'w') as f:
        f.write('[nopyrat]\nrunmode = spectrum\n')
    with pytest.raises(ValueError, match=r'no \[pyrat\] section'):
        cfg_parser.parse(cfg)


@requires_reference
@pytest.mark.parametrize('key,value,error', [
    ('runmode', 'nope', "Invalid runmode 'nope'"),
    ('rt_path', 'nope', "Invalid rt_path 'nope'"),
    ('tmodel', 'nope', "Invalid tmodel 'nope'"),
    ('radmodel', 'nope', "Invalid radmodel 'nope'"),
    ('chemistry', 'nope', "Invalid chemistry model 'nope'"),
    ('rayleigh', 'nope_nope', "Invalid Rayleigh model 'nope_nope'"),
    ('alkali', 'nope', "Invalid alkali model 'nope'"),
    ('clouds', 'nope 1.0', "Invalid cloud model 'nope'"),
])
def test_parser_invalid_choices(tmp_path, key, value, error):
    cfg = make_config(tmp_path, reset={key: value})
    with pytest.raises(ValueError, match=error):
        cfg_parser.parse(cfg, root=REFERENCE_ROOT)


@requires_reference
def test_model_missing_atmosphere(tmp_path):
    cfg = make_config(tmp_path, remove=['atmfile'])
    with pytest.raises(
            ValueError,
            match='Missing atmosphere: provide atmfile or '
                  'nlayers/ptop/pbottom'):
        Model(cfg, root=REFERENCE_ROOT)


@requires_reference
def test_model_tmodel_without_tpars(tmp_path):
    cfg = make_config(tmp_path, reset={'tmodel': 'guillot'})
    with pytest.raises(
            ValueError,
            match=r'Not all temperature parameters were defined '
                  r'\(tpars\)'):
        Model(cfg, root=REFERENCE_ROOT)


@requires_reference
def test_model_vmr_without_values(tmp_path):
    """Free-VMR variables without values (and no retrieval params to
    supply them) are a configuration error (reference
    test_emission_vert_model_no_molpars)."""
    cfg = make_config(
        tmp_path, reset={'vmr_vars': 'log_H2O', 'bulk': 'H2 He'},
    )
    with pytest.raises(
            ValueError,
            match=r'Not all vmr parameter values were defined '
                  r'\(vmr_vars\)'):
        Model(cfg, root=REFERENCE_ROOT)


@requires_reference
def test_model_vmr_invalid_species(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={'vmr_vars': 'log_NOPE -5', 'bulk': 'H2 He'},
    )
    with pytest.raises(
            ValueError,
            match="Invalid vmr_vars variable 'log_NOPE', species NOPE "
                  'is not in the atmosphere'):
        Model(cfg, root=REFERENCE_ROOT)


@requires_reference
def test_model_vmr_invalid_model(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={'vmr_vars': 'nope_H2O -5', 'bulk': 'H2 He'},
    )
    with pytest.raises(
            ValueError,
            match=r"Unrecognized VMR model \(vmr_vars\): 'nope_H2O'"):
        Model(cfg, root=REFERENCE_ROOT)


@requires_reference
def test_model_missing_bulk_species(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={'vmr_vars': 'log_H2O -5', 'bulk': 'H2 NOPE'},
    )
    with pytest.raises(
            ValueError,
            match='These bulk species are not present in the '
                  'atmosphere'):
        Model(cfg, root=REFERENCE_ROOT)


@requires_reference
def test_model_cloud_pars_mismatch(tmp_path):
    cfg = make_config(
        tmp_path, reset={'clouds': 'deck 1.0 2.0'},
    )
    with pytest.raises(
            ValueError,
            match=r'Number of input parameters \(2\) does not match '
                  r'required \(1\) for model'):
        Model(cfg, root=REFERENCE_ROOT)


@requires_reference
def test_opacity_missing_outfile(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={'runmode': 'opacity', 'tmin': '300', 'tmax': '3000',
               'tstep': '300'},
        remove=['sampled_cross_sec'],
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    with pytest.raises(
            ValueError,
            match=r'Undefined output cross-section file '
                  r'\(sampled_cross_sec\)'):
        model.compute_opacity()


@requires_reference
def test_opacity_missing_temps(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={'runmode': 'opacity',
               'sampled_cross_sec': str(tmp_path / 'out.npz')},
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    with pytest.raises(
            ValueError,
            match=r'Undefined temperature sampling \(tmin/tmax/tstep\)'):
        model.compute_opacity()


@requires_reference
def test_opacity_missing_tli(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={'runmode': 'opacity', 'tmin': '300', 'tmax': '3000',
               'tstep': '300',
               'sampled_cross_sec': str(tmp_path / 'out.npz')},
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    with pytest.raises(
            ValueError,
            match=r'Undefined input TLI files \(tlifile\)'):
        model.compute_opacity()


@requires_reference
def test_observation_data_bands_mismatch(tmp_path):
    cfg = make_config(tmp_path)
    model = Model(cfg, root=REFERENCE_ROOT)

    class _Cfg:
        data = [0.1, 0.2, 0.3]
        uncert = [0.01, 0.01, 0.01]
        filters = ['tophat 1.3 0.05']
        obsfile = None
        obsfile_hires = None
        dunits = None
        offset_inst = None
        uncert_scaling = None

    with pytest.raises(
            ValueError,
            match=r'Number of data points \(3\) does not match the '
                  r'number of filter bands \(1\)'):
        Observation(_Cfg, model.wn)


@requires_reference
def test_observation_missing_filter_file(tmp_path):
    cfg = make_config(tmp_path)
    model = Model(cfg, root=REFERENCE_ROOT)

    class _Cfg:
        data = None
        uncert = None
        filters = ['no_such_filter.dat nope']
        obsfile = None
        obsfile_hires = None
        dunits = None
        offset_inst = None
        uncert_scaling = None

    with pytest.raises(FileNotFoundError, match='does not exist'):
        Observation(_Cfg, model.wn)


@requires_reference
def test_observation_invalid_offset_inst(tmp_path):
    cfg = make_config(tmp_path)
    model = Model(cfg, root=REFERENCE_ROOT)

    class _Cfg:
        data = [0.1]
        uncert = [0.01]
        filters = ['tophat 1.3 0.05']
        obsfile = None
        obsfile_hires = None
        dunits = None
        offset_inst = 'offset_NOPE'
        uncert_scaling = None

    with pytest.raises(
            ValueError,
            match="Invalid instrumental offset parameter "
                  "'offset_NOPE'"):
        Observation(_Cfg, model.wn)


@requires_reference
def test_observation_invalid_uncert_scaling(tmp_path):
    cfg = make_config(tmp_path)
    model = Model(cfg, root=REFERENCE_ROOT)

    class _Cfg:
        data = [0.1]
        uncert = [0.01]
        filters = ['tophat 1.3 0.05']
        obsfile = None
        obsfile_hires = None
        dunits = None
        offset_inst = None
        uncert_scaling = 'err_nope_X'

    with pytest.raises(
            ValueError,
            match="Invalid error scaling parameter 'err_nope_X'"):
        Observation(_Cfg, model.wn)


@requires_reference
def test_hires_without_inst_resolution(tmp_path):
    cfg = make_config(tmp_path)
    model = Model(cfg, root=REFERENCE_ROOT)

    class _Cfg:
        data = None
        uncert = None
        filters = None
        obsfile = None
        obsfile_hires = 'hires.dat'
        inst_resolution = None
        dunits = None
        offset_inst = None
        uncert_scaling = None

    with pytest.raises(
            ValueError,
            match='Undefined inst_resolution, required when modeling '
                  'high-resolution data'):
        Observation(_Cfg, model.wn)


@requires_reference
def test_eclipse_without_star(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={'rt_path': 'eclipse'},
        remove=['tstar', 'sampled_cross_sec'],
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    with pytest.raises(
            ValueError,
            match='Undefined stellar flux model, required for eclipse'):
        model.run()


@requires_reference
def test_lbl_with_table_sampling(tmp_path):
    """tlifile + table-inherited sampling (no explicit rate) cannot
    build the fine grid line-by-line needs."""
    from pyratbay_tpu.benchmark import _synthetic_cs_table
    press = np.logspace(-6, 2, 5)
    wn = np.arange(5882.0, 9091.0, 1.0)
    table = str(tmp_path / 'table.npz')
    _synthetic_cs_table(table, wn, press)
    cfg = make_config(
        tmp_path,
        reset={'tlifile': 'whatever.tli', 'sampled_cross_sec': table},
        remove=['wnstep'],
    )
    with pytest.raises(
            ValueError,
            match=r'Line-by-line opacity \(tlifile\) requires an '
                  'explicit spectral sampling'):
        Model(cfg, root=REFERENCE_ROOT)


def test_invalid_isotope_ratios_entry(tmp_path):
    from pyratbay_tpu.opacity.line_sample import LineSample
    from pyratbay_tpu.benchmark import _synthetic_cs_table
    press = np.logspace(-6, 2, 5)
    wn = np.arange(5000.0, 5128.0, 1.0)
    f = str(tmp_path / 'H2O_161_cs.npz')
    _synthetic_cs_table(f, wn, press)
    with pytest.raises(
            ValueError, match='Invalid isotope_ratios entry'):
        LineSample([f], pressure=press, isotope_ratios='only_two f')


def test_invalid_isotope_filler(tmp_path):
    from pyratbay_tpu.opacity.line_sample import LineSample
    from pyratbay_tpu.benchmark import _synthetic_cs_table
    press = np.logspace(-6, 2, 5)
    wn = np.arange(5000.0, 5128.0, 1.0)
    f = str(tmp_path / 'H2O_161_cs.npz')
    _synthetic_cs_table(f, wn, press)
    with pytest.raises(
            ValueError, match='Invalid isotope_ratios filler'):
        LineSample(
            [f], pressure=press,
            isotope_ratios='161 161 fill_999',
        )


@requires_reference
def test_deprecated_keys_remap(tmp_path):
    """Renamed config keys warn and remap (reference parser shims)."""
    import warnings as _warnings
    cfg = make_config(
        tmp_path,
        reset={'wllow': '1.2 um', 'runmode': 'mcmc'},
        remove=['wl_low'],
    )
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter('always')
        parsed = cfg_parser.parse(cfg, root=REFERENCE_ROOT)
    messages = [str(w.message) for w in caught]
    assert any("'wllow' argument is deprecated" in m for m in messages)
    assert any("'mcmc' option" in m for m in messages)
    assert parsed.runmode == 'retrieval'
    assert parsed.wl_low is not None
