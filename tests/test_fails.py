"""Config-validation error paths: every user-facing raise gets a
pinned message (the reference's largest test file,
tests/test_fails.py, is this matrix for its parser)."""
import configparser
import re

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
@pytest.mark.parametrize('key,value,desc', [
    ('runmode', 'nope', 'running mode'),
    ('rt_path', 'nope', 'radiative-transfer observing geometry'),
    ('tmodel', 'nope', 'temperature model'),
    ('radmodel', 'nope', 'Radius-profile model'),
    ('chemistry', 'nope', 'Chemical model'),
    ('rayleigh', 'nope_nope', 'Rayleigh model'),
    ('alkali', 'nope', 'alkali model'),
    ('clouds', 'nope 1.0', 'cloud model'),
    ('h_ion', 'nope', 'H- opacity model'),
    ('sampler', 'nope', 'posterior sampler'),
])
def test_parser_invalid_choices(tmp_path, key, value, desc):
    # Reference get_choice message format (tools/parser.py:105-123):
    cfg = make_config(tmp_path, reset={key: value})
    bad = value.split()[0]
    error = re.escape(f"Invalid {desc} ({key}): '{bad}'. Select from: ")
    with pytest.raises(ValueError, match=error):
        cfg_parser.parse(cfg, root=REFERENCE_ROOT)


# ---------------------------------------------------------------------
# Typed-value parse errors (reference tools/parser.py:215-330,
# tests/test_fails.py:89-167):

@requires_reference
@pytest.mark.parametrize('value', ['10.5', '10 20', 'a', 'inf', 'True'])
def test_parser_invalid_integer_type(tmp_path, value):
    cfg = make_config(tmp_path, reset={'nlayers': value})
    error = re.escape(
        'Invalid data type for nlayers, could not convert string to '
        f"integer: '{value}'"
    )
    with pytest.raises(ValueError, match=error):
        cfg_parser.parse(cfg, root=REFERENCE_ROOT)


@requires_reference
@pytest.mark.parametrize('key', [
    'verb', 'wnosamp', 'nlayers', 'ndop', 'nlor', 'quadrature',
    'nsamples', 'nchains', 'burnin', 'thinning', 'ncpu', 'nlive',
])
def test_parser_invalid_integer_all_params(tmp_path, key):
    cfg = make_config(tmp_path, reset={key: 'abc'})
    error = re.escape(
        f'Invalid data type for {key}, could not convert string to '
        "integer: 'abc'"
    )
    with pytest.raises(ValueError, match=error):
        cfg_parser.parse(cfg, root=REFERENCE_ROOT)


@requires_reference
@pytest.mark.parametrize('value', ['100 200', 'a'])
def test_parser_invalid_float_type(tmp_path, value):
    cfg = make_config(tmp_path, reset={'tstar': value})
    error = re.escape(
        'Invalid data type for tstar, could not convert string to '
        f"float: '{value}'"
    )
    with pytest.raises(ValueError, match=error):
        cfg_parser.parse(cfg, root=REFERENCE_ROOT)


@requires_reference
@pytest.mark.parametrize('key', [
    'wnstep', 'resolution', 'tmin', 'tmax', 'tstep', 'ethresh',
    'voigt_extent', 'voigt_cutoff', 'fpatchy', 'maxdepth', 'qcap',
    'tlow', 'thigh', 'tstar', 'gplanet', 'tint',
])
def test_parser_invalid_float_all_params(tmp_path, key):
    cfg = make_config(tmp_path, reset={key: 'abc'})
    error = re.escape(
        f'Invalid data type for {key}, could not convert string to '
        "float: 'abc'"
    )
    with pytest.raises(ValueError, match=error):
        cfg_parser.parse(cfg, root=REFERENCE_ROOT)


@requires_reference
def test_parser_invalid_bool(tmp_path):
    cfg = make_config(tmp_path, reset={'resume': 'maybe'})
    error = re.escape(
        "Invalid data type for parameter 'resume', could not convert "
        "string 'maybe' to bool"
    )
    with pytest.raises(ValueError, match=error):
        cfg_parser.parse(cfg, root=REFERENCE_ROOT)


# ---------------------------------------------------------------------
# Unit-name validation (reference parser.py:763, 793, 809, 890, 1015):

@requires_reference
@pytest.mark.parametrize('key,desc', [
    ('wlunits', 'wavelength'),
    ('runits', 'radius'),
    ('punits', 'pressure'),
    ('mpunits', 'planet mass'),
    ('dunits', 'data'),
])
def test_parser_invalid_units(tmp_path, key, desc):
    cfg = make_config(tmp_path, reset={key: 'invalid'})
    error = re.escape(f'Invalid {desc} units ({key}): invalid')
    with pytest.raises(ValueError, match=error):
        cfg_parser.parse(cfg, root=REFERENCE_ROOT)


# ---------------------------------------------------------------------
# Numeric-bound validation (reference get_default messages,
# tools/parser.py:126-168; tests/test_fails.py:279-330):

@requires_reference
@pytest.mark.parametrize('key,value', [
    ('nlayers', '1'),
    ('wnstep', '0'),
    ('wnlow', '0'),
    ('wnhigh', '-1'),
    ('resolution', '0'),
    ('tmin', '-100'),
    ('tmax', '0'),
    ('tstep', '0'),
    ('ethresh', '0'),
    ('dlratio', '0'),
    ('qcap', '0'),
    ('nsamples', '0'),
    ('burnin', '0'),
    ('nlive', '0'),
    ('grnmin', '0'),
    ('tstar', '0'),
    ('gplanet', '-10'),
    ('inst_resolution', '0'),
])
def test_parser_greater_than(tmp_path, key, value):
    cfg = make_config(tmp_path, reset={key: value})
    error = re.escape(f'({key}) must be > ')
    with pytest.raises(ValueError, match=error):
        cfg_parser.parse(cfg, root=REFERENCE_ROOT)


@requires_reference
@pytest.mark.parametrize('key', [
    'wnosamp', 'ndop', 'nlor', 'thinning', 'nchains', 'ncpu', 'tint',
    'quadrature', 'grbreak', 'fpatchy', 'maxdepth', 'voigt_extent',
    'voigt_cutoff', 'f_dilution', 'dt_retrieval_snapshot',
])
def test_parser_greater_equal(tmp_path, key):
    cfg = make_config(tmp_path, reset={key: '-10'})
    error = re.escape(f'({key}) must be >= ')
    with pytest.raises(ValueError, match=error):
        cfg_parser.parse(cfg, root=REFERENCE_ROOT)


@requires_reference
def test_parser_lower_than(tmp_path):
    cfg = make_config(tmp_path, reset={'verb': '10'})
    error = re.escape('Verbosity (verb) must be < 5')
    with pytest.raises(ValueError, match=error):
        cfg_parser.parse(cfg, root=REFERENCE_ROOT)


@requires_reference
@pytest.mark.parametrize('key', ['fpatchy', 'qcap', 'f_dilution'])
def test_parser_lower_equal(tmp_path, key):
    cfg = make_config(tmp_path, reset={key: '1.1'})
    error = re.escape(f'({key}) must be <= ')
    with pytest.raises(ValueError, match=error):
        cfg_parser.parse(cfg, root=REFERENCE_ROOT)


# ---------------------------------------------------------------------
# Temperature-model / retrieval-params completeness (reference
# tmodels.py:20-32, retrieval.py:90-323):

@requires_reference
@pytest.mark.parametrize('tmodel,npars', [
    ('isothermal', 1), ('guillot', 6), ('madhu', 6),
])
def test_model_tpars_mismatch(tmp_path, tmodel, npars):
    cfg = make_config(
        tmp_path, reset={'tmodel': tmodel, 'tpars': '100.0 200.0'},
    )
    error = re.escape(
        'Number of temperature parameters (2) does not match the '
        f'required number of parameters ({npars}) of the {tmodel} model'
    )
    with pytest.raises(ValueError, match=error):
        Model(cfg, root=REFERENCE_ROOT).run()


@requires_reference
@pytest.mark.parametrize('ncolumns', [1, 3, 4, 6, 9])
def test_retrieval_params_invalid_entry(tmp_path, ncolumns):
    entry = 'T_iso 1500.0 300.0 3500.0 10.0 900.0 100.0 100.0 1.0'.split()
    ret_pars = ' '.join(entry[0:ncolumns])
    cfg = make_config(
        tmp_path,
        reset={'tmodel': 'isothermal', 'retrieval_params': ret_pars},
        remove=['tpars'],
    )
    error = re.escape(
        f"Invalid number of fields for retrieval_params entry\n'{ret_pars}'"
    )
    with pytest.raises(ValueError, match=error):
        model = Model(cfg, root=REFERENCE_ROOT)
        from pyratbay_tpu.retrieval import RetrievalParams
        RetrievalParams(model)


@requires_reference
def test_retrieval_params_invalid_pname(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={
            'tmodel': 'isothermal',
            'retrieval_params': 'not_a_param -3.0',
        },
        remove=['tpars'],
    )
    error = re.escape(
        "Invalid retrieval parameter 'not_a_param'. Possible values are:"
    )
    with pytest.raises(ValueError, match=error):
        model = Model(cfg, root=REFERENCE_ROOT)
        from pyratbay_tpu.retrieval import RetrievalParams
        RetrievalParams(model)


@requires_reference
def test_retrieval_params_repeated(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={'retrieval_params': 'R_planet 1.0\nR_planet 1.5'},
    )
    error = re.escape("Repeated parameter names: ['R_planet']")
    with pytest.raises(ValueError, match=error):
        model = Model(cfg, root=REFERENCE_ROOT)
        from pyratbay_tpu.retrieval import RetrievalParams
        RetrievalParams(model)


@requires_reference
def test_retrieval_params_insufficient_temp(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={
            'tmodel': 'isothermal',
            'retrieval_params': 'R_planet 1.0',
        },
        remove=['tpars'],
    )
    error = re.escape(
        'Not all temperature parameters were defined (tpars)'
    )
    with pytest.raises(ValueError, match=error):
        model = Model(cfg, root=REFERENCE_ROOT)
        from pyratbay_tpu.retrieval import RetrievalParams
        RetrievalParams(model)


@requires_reference
def test_retrieval_params_insufficient_vmr(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={
            'vmr_vars': 'log_H2O',
            'bulk': 'H2 He',
            'retrieval_params': 'R_planet 1.0',
        },
    )
    error = re.escape(
        'Not all vmr parameter values were defined (vmr_vars)'
    )
    with pytest.raises(ValueError, match=error):
        model = Model(cfg, root=REFERENCE_ROOT)
        from pyratbay_tpu.retrieval import RetrievalParams
        RetrievalParams(model)


@requires_reference
def test_retrieval_params_undefined_cloud(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={
            'clouds': 'deck',
            'retrieval_params': 'R_planet 1.0',
        },
    )
    error = re.escape("Undefined parameter values for cloud model 'deck'")
    with pytest.raises(ValueError, match=error):
        model = Model(cfg, root=REFERENCE_ROOT)
        from pyratbay_tpu.retrieval import RetrievalParams
        RetrievalParams(model)


@requires_reference
def test_retrieval_params_patch_cloud_from_retrieval(tmp_path):
    """Cloud values supplied by retrieval_params are patched in
    (reference retrieval.py:258-259) -- no error."""
    from pyratbay_tpu.retrieval import RetrievalParams
    cfg = make_config(
        tmp_path,
        reset={
            'clouds': 'deck',
            'retrieval_params': 'log_p_cl -2.5',
        },
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    RetrievalParams(model)
    deck = [m for t, m, _ in model.opacity_models if t == 'cloud'][0]
    np.testing.assert_allclose(deck.pars, [-2.5])


@requires_reference
def test_observation_uncert_mismatch(tmp_path):
    cfg = make_config(
        tmp_path, reset={'data': '1.0 2.0', 'uncert': '0.1'},
    )
    error = re.escape(
        'Number of data uncertainty values (1) does not match the '
        'number of data points (2)'
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    with pytest.raises(ValueError, match=error):
        Observation(model.cfg, model.wn, root=REFERENCE_ROOT)


@requires_reference
def test_observation_filters_mismatch(tmp_path):
    cfg = make_config(
        tmp_path,
        reset={
            'data': '1.0 2.0',
            'uncert': '0.1 0.1',
            'filters': REFERENCE_ROOT
            + 'tests/filters/filter_test_WFC3_G141_1.133um.dat',
        },
    )
    error = re.escape(
        'Number of filter bands (1) does not match the number of '
        'data points (2)'
    )
    model = Model(cfg, root=REFERENCE_ROOT)
    with pytest.raises(ValueError, match=error):
        Observation(model.cfg, model.wn, root=REFERENCE_ROOT)


@requires_reference
def test_spectrum_inconsistent_wl_bounds(tmp_path):
    cfg = make_config(
        tmp_path, reset={'wl_low': '2.0 um', 'wl_high': '1.0 um'},
    )
    error = re.escape(
        'Wavenumber low boundary (10000.0 cm-1) must be larger than '
        'the high boundary (5000.0 cm-1)'
    )
    with pytest.raises(ValueError, match=error):
        Model(cfg, root=REFERENCE_ROOT)


@requires_reference
def test_model_missing_atmosphere(tmp_path):
    # Reference check_pressure message (pyrat/atmosphere.py:960-964):
    cfg = make_config(tmp_path, remove=['atmfile'])
    error = re.escape(
        'Cannot compute pressure profile, either set {ptop, pbottom, '
        'nlayers} parameters, or provide an input PT profile (ptfile) '
        'or atmospheric file (atmfile)'
    )
    with pytest.raises(ValueError, match=error):
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
            match=r'Number of filter bands \(1\) does not match the '
                  r'number of data points \(3\)'):
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
