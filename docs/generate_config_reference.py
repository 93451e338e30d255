"""Generate docs/CONFIG_REFERENCE.md from the parser's own option
tables (the reference ships a hand-written spec in its sphinx docs;
here the key list, types, and bounds come straight from
config/parser.py so the reference can never drift from the code --
tests/test_docs.py regenerates and diffs it).

    python docs/generate_config_reference.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

from pyratbay_tpu.config import parser as P  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   'CONFIG_REFERENCE.md')

# One-line purpose per key.  Keys with bounds inherit the parser's own
# description; everything else is curated here.  The generator FAILS
# if a parser key has no description (so new options must be
# documented to land).
DESCRIPTIONS = {
    # -- run control
    'runmode': "What to run: 'tli', 'atmosphere', 'opacity', "
               "'spectrum', 'radeq', or 'retrieval'",
    'logfile': 'Path of the screen-output log file',
    'verb': 'Verbosity level (-1 quiet ... 4 debug)',
    'ncpu': 'Number of host processors for parallel stages',
    'resume': 'Resume a retrieval from its checkpoint file',
    'post_processing': 'Run posterior post-processing after sampling',
    # -- spectral sampling
    'wl_low': "Spectrum lower wavelength boundary (e.g. '1.1 um')",
    'wl_high': "Spectrum upper wavelength boundary (e.g. '1.7 um')",
    'wnlow': 'Spectrum lower wavenumber boundary (cm-1)',
    'wnhigh': 'Spectrum upper wavenumber boundary (cm-1)',
    'wnstep': 'Constant sampling step in wavenumber (cm-1)',
    'wlstep': 'Constant sampling step in wavelength',
    'resolution': 'Constant resolving power R = lambda/dlambda',
    'wnosamp': 'Fine-grid oversampling factor for line-by-line',
    'wl_thinning': 'Wavelength-sampling thinning factor for '
                   'Line_Sample opacities',
    'wlunits': "Default wavelength units (e.g. 'um')",
    # -- atmosphere
    'atmfile': 'Input atmosphere file (pressure/T/VMR profiles)',
    'output_atmfile': 'Output atmosphere file to write',
    'nlayers': 'Number of atmospheric layers',
    'ptop': "Pressure at the top of the atmosphere (e.g. '1e-6 bar')",
    'pbottom': 'Pressure at the bottom of the atmosphere',
    'punits': 'Default pressure units',
    'tmodel': "Temperature model: 'isothermal', 'guillot', or 'madhu'",
    'tpars': 'Temperature-model parameters',
    'chemistry': "Composition model: 'uniform' or 'tea' "
                 '(thermochemical equilibrium)',
    'species': 'Atmospheric species names',
    'uniform_vmr': 'Uniform volume mixing ratios (one per species)',
    'vmr_vars': 'Parametric VMR models (log_X, scale_X, slant_X, ...) '
                'with optional initial values',
    'bulk': 'Bulk (filler) species that balance the VMR sum to 1',
    'solar': 'Solar elemental-abundances file (equilibrium chemistry)',
    'xsolar': 'Metallicity scale factor for equilibrium chemistry',
    'ptfile': 'Output pressure-temperature profile file',
    'molfile': 'Molecular-properties file (mass, radius)',
    'qcap': 'Metals volume-mixing-ratio cap',
    # -- system
    'rplanet': "Planetary radius (e.g. '1.0 rjup')",
    'mplanet': 'Planetary mass',
    'mpunits': 'Default planetary-mass units',
    'gplanet': 'Planetary surface gravity (cm s-2)',
    'refpressure': 'Reference pressure at rplanet',
    'radmodel': "Radius-profile model: 'hydro_m' or 'hydro_g'",
    'rstar': "Stellar radius (e.g. '1.27 rsun')",
    'mstar': 'Stellar mass',
    'tstar': 'Stellar effective temperature (K)',
    'gstar': 'Stellar surface gravity (cm s-2)',
    'log_gstar': 'log10 of the stellar surface gravity',
    'smaxis': 'Orbital semi-major axis',
    'distance': 'Distance to the system (f_lambda fluxes)',
    'tint': 'Planetary internal temperature (K)',
    'beta_irr': 'Irradiation redistribution factor (radeq)',
    'runits': 'Default radius units',
    # -- opacity sources
    'tlifile': 'TLI line-transition file(s) for line-by-line opacity',
    'dblist': 'Input line-list database files (runmode=tli)',
    'dbtype': "Line-list formats: 'hitran', 'exomol', 'kurucz', ... "
              '(runmode=tli)',
    'pflist': 'Partition-function sources (one per database)',
    'sampled_cross_sec': 'Pre-tabulated (sampled) cross-section '
                         'npz file(s)',
    'continuum_cross_sec': 'Continuum/CIA cross-section file(s)',
    'alkali': "Alkali models: 'sodium_vdw', 'potassium_vdw'",
    'alkali_cutoff': 'Alkali profiles hard cutoff from line center '
                     '(cm-1)',
    'rayleigh': "Rayleigh models: 'rayleigh_H2', 'lecavelier', ...",
    'h_ion': "H- bound-free/free-free model: 'h_ion_john1988'",
    'clouds': "Cloud models: 'deck', 'ccsgray', 'lecavelier'",
    'fpatchy': 'Patchy-cloud fraction',
    'single_isotope': 'Restrict line-by-line opacity to one isotope',
    'isotope_ratios': 'Retrievable isotope-ratio scalings '
                      '(line-sample opacity)',
    'ethresh': 'Extinction-coefficient threshold',
    # -- voigt / line-by-line grids
    'voigt_extent': 'Voigt profile extent in HWHM',
    'voigt_cutoff': 'Voigt profile cutoff in cm-1',
    'ndop': 'Number of Doppler-width samples',
    'nlor': 'Number of Lorentz-width samples',
    'dmin': 'Minimum Doppler HWHM (cm-1)',
    'dmax': 'Maximum Doppler HWHM (cm-1)',
    'lmin': 'Minimum Lorentz HWHM (cm-1)',
    'lmax': 'Maximum Lorentz HWHM (cm-1)',
    'dlratio': 'Doppler/Lorentz-width ratio threshold',
    # -- opacity tabulation
    'tmin': 'Minimum temperature of opacity grid (K)',
    'tmax': 'Maximum temperature of opacity grid (K)',
    'tstep': "Opacity grid's temperature sampling step (K)",
    # -- radiative transfer
    'rt_path': "Geometry: 'transit', 'eclipse', 'emission', "
               "'f_lambda', 'emission_two_stream', "
               "'eclipse_two_stream'",
    'maxdepth': 'Maximum optical depth to integrate',
    'raygrid': 'Emission angles in degrees (plane-parallel)',
    'quadrature': 'Number of Gaussian-quadrature points',
    'f_dilution': 'Flux dilution factor',
    'specfile': 'Output spectrum file',
    # -- stellar spectra
    'starspec': 'Input stellar spectrum file (or T-gridded SED)',
    'kurucz': 'Kurucz stellar model file (.pck)',
    'marcs': 'MARCS stellar model file',
    'phoenix': 'PHOENIX stellar model file',
    # -- observations
    'obsfile': 'Observations file: band data/uncertainties/filters',
    'obsfile_hires': 'High-resolution observations file',
    'inst_resolution': 'Instrumental resolution for the high-res '
                       'channel',
    'data': 'Observed band depths/fluxes (inline alternative to '
            'obsfile)',
    'uncert': 'Data uncertainties',
    'dunits': 'Data units (none, percent, ppt, ppm)',
    'filters': 'Filter passband files or inline tophats',
    'offset_inst': 'Instrument tags with retrievable data offsets',
    'uncert_scaling': 'Retrievable uncertainty scaling (scale_* or '
                      'quadrature_*)',
    # -- retrieval
    'retrieval_params': 'Free-parameter block: name, initial value, '
                        'pmin, pmax, pstep per line',
    'sampler': "Posterior sampler: 'snooker' (DEMC) or "
               "'multinest' (nested)",
    'nsamples': 'Number of MCMC samples',
    'nchains': 'Number of MCMC parallel chains',
    'burnin': 'Number of burn-in samples per chain',
    'thinning': 'MCMC posterior thinning',
    'nlive': 'Number of Nested Sampling live points',
    'grbreak': 'Gelman-Rubin convergence criterion',
    'grnmin': 'Gelman-Rubin convergence fraction',
    'tlow': 'Lower temperature retrieval boundary (K)',
    'thigh': 'Upper temperature retrieval boundary (K)',
    'params': 'Initial free-parameter values (legacy array form)',
    'pstep': 'Free-parameter step scales (0 = fixed)',
    'pmin': 'Free-parameter lower bounds',
    'pmax': 'Free-parameter upper bounds',
    'prior': 'Gaussian prior centers',
    'priorlow': 'Gaussian prior lower sigma',
    'priorup': 'Gaussian prior upper sigma',
    'mcmcfile': 'Output posterior npz file',
    'dt_retrieval_snapshot': 'Seconds between retrieval checkpoint '
                             'snapshots',
    'escale': 'Legacy alias of uncert_scaling',
    'statistics': "Posterior summary statistic: 'med_central', "
                  "'max_like', ...",
    # -- distributed execution
    'dist_coordinator': 'jax.distributed coordinator address '
                        '(host:port)',
    'dist_nprocs': 'Number of distributed processes',
    'dist_procid': 'This process id in the distributed group',
    # -- plotting
    'theme': 'Plot color theme',
    'data_color': 'Plot color for the data points',
    'logxticks': 'Logarithmic x-axis tick positions',
    'yran': 'Plot y-axis range',
}


def _kind(key):
    kinds = []
    if key in P._STR_KEYS:
        kinds.append('string')
    if key in P._INT_KEYS:
        kinds.append('integer')
    if key in P._FLOAT_KEYS:
        kinds.append('float')
    if key in P._BOOL_KEYS:
        kinds.append('bool')
    if key in P._ARRAY_KEYS:
        kinds.append(
            'string list' if key in P._STRING_ARRAYS else 'array')
    if key in P._PATH_KEYS or key in P._PATH_ARRAY_KEYS:
        kinds.append('path')
    return ', '.join(kinds)


def _bounds(key):
    if key not in P._BOUNDS:
        return ''
    _, gt, ge, lt, le = P._BOUNDS[key]
    parts = []
    if gt is not None:
        parts.append(f'> {gt}')
    if ge is not None:
        parts.append(f'>= {ge}')
    if lt is not None:
        parts.append(f'< {lt}')
    if le is not None:
        parts.append(f'<= {le}')
    return ', '.join(parts)


SECTIONS = [
    ('Run control', ['runmode', 'logfile', 'verb', 'ncpu', 'resume',
                     'post_processing']),
    ('Spectral sampling', ['wl_low', 'wl_high', 'wnlow', 'wnhigh',
                           'wnstep', 'wlstep', 'resolution', 'wnosamp',
                           'wl_thinning', 'wlunits']),
    ('Atmosphere', ['atmfile', 'output_atmfile', 'nlayers', 'ptop',
                    'pbottom', 'punits', 'tmodel', 'tpars',
                    'chemistry', 'species', 'uniform_vmr', 'vmr_vars',
                    'bulk', 'solar', 'xsolar', 'ptfile', 'molfile',
                    'qcap']),
    ('System', ['rplanet', 'mplanet', 'mpunits', 'gplanet',
                'refpressure', 'radmodel', 'rstar', 'mstar', 'tstar',
                'gstar', 'log_gstar', 'smaxis', 'distance', 'tint',
                'beta_irr', 'runits']),
    ('Opacity sources', ['tlifile', 'dblist', 'dbtype', 'pflist',
                         'sampled_cross_sec', 'continuum_cross_sec',
                         'alkali', 'alkali_cutoff', 'rayleigh',
                         'h_ion', 'clouds', 'fpatchy',
                         'single_isotope', 'isotope_ratios',
                         'ethresh']),
    ('Voigt profiles', ['voigt_extent', 'voigt_cutoff', 'ndop',
                        'nlor', 'dmin', 'dmax', 'lmin', 'lmax',
                        'dlratio']),
    ('Opacity tabulation', ['tmin', 'tmax', 'tstep']),
    ('Radiative transfer', ['rt_path', 'maxdepth', 'raygrid',
                            'quadrature', 'f_dilution', 'specfile']),
    ('Stellar spectra', ['starspec', 'kurucz', 'marcs', 'phoenix']),
    ('Observations', ['obsfile', 'obsfile_hires', 'inst_resolution',
                      'data', 'uncert', 'dunits', 'filters',
                      'offset_inst', 'uncert_scaling']),
    ('Retrieval', ['retrieval_params', 'sampler', 'nsamples',
                   'nchains', 'burnin', 'thinning', 'nlive',
                   'grbreak', 'grnmin', 'tlow', 'thigh', 'params',
                   'pstep', 'pmin', 'pmax', 'prior', 'priorlow',
                   'priorup', 'mcmcfile', 'dt_retrieval_snapshot',
                   'escale', 'statistics']),
    ('Distributed execution', ['dist_coordinator', 'dist_nprocs',
                               'dist_procid']),
    ('Plotting', ['theme', 'data_color', 'logxticks', 'yran']),
]


def generate():
    all_keys = (set(P._STR_KEYS) | set(P._INT_KEYS)
                | set(P._FLOAT_KEYS) | set(P._BOOL_KEYS)
                | set(P._ARRAY_KEYS))
    documented = {k for _, keys in SECTIONS for k in keys}
    missing = sorted(all_keys - documented)
    if missing:
        raise SystemExit(
            f'Parser keys missing from SECTIONS: {missing}')
    undescribed = sorted(documented - set(DESCRIPTIONS))
    if undescribed:
        raise SystemExit(
            f'Keys missing a DESCRIPTIONS entry: {undescribed}')
    extra = sorted(documented - all_keys)
    if extra:
        raise SystemExit(f'Documented keys unknown to parser: {extra}')

    lines = [
        '# Configuration-file reference',
        '',
        '<!-- GENERATED by docs/generate_config_reference.py; do not',
        '     edit by hand -- regenerate after parser changes. -->',
        '',
        'Every key of the `[pyrat]` configuration section, generated',
        'from the parser\'s own option tables (config/parser.py).',
        'Values with units accept a `value units` pair (e.g.',
        '`rplanet = 1.0 rjup`); see `pyratbay_tpu.constants` for the',
        'unit registry.  The key set and semantics match the',
        'reference package\'s configuration spec.',
        '',
        f'Total keys: {len(all_keys)}',
        '',
    ]
    for title, keys in SECTIONS:
        lines += [f'## {title}', '',
                  '| key | type | constraints | description |',
                  '|---|---|---|---|']
        for key in keys:
            lines.append(
                f'| `{key}` | {_kind(key)} | {_bounds(key)} '
                f'| {DESCRIPTIONS[key]} |'
            )
        lines.append('')
    return '\n'.join(lines) + '\n'


if __name__ == '__main__':
    text = generate()
    with open(OUT, 'w') as f:
        f.write(text)
    print(f'wrote {OUT} ({len(text.splitlines())} lines)')
