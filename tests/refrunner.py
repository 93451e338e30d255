"""Run the reference implementation locally to generate golden outputs.

The reference (read-only at /root/reference) is copied to a scratch
directory, its C extensions are compiled with the local toolchain
(same flags as its setup.py:19-30), and its missing dependencies (mc3,
chemcat) are replaced with minimal stubs -- enough for the tli /
opacity / spectrum run modes used to generate parity goldens from the
mock inputs it ships.  Each run executes in a subprocess so the
reference's module state never mixes with ours.

Used by tests/test_ref_parity.py for live reference-vs-repo chain
comparisons (TLI compilation -> opacity tabulation -> spectra), the
variants whose stored golden files depend on non-shipped downloads.
"""
import glob
import os
import shutil
import subprocess
import sys
import sysconfig
import textwrap

import numpy as np

REFERENCE_ROOT = '/root/reference/'
BUILD_DIR = '/tmp/pbt_refrun'
# Bump when build contents or the run template change (invalidates the
# .build_ok marker and the per-test npz caches):
BUILD_VERSION = '2'

_MC3_UTILS = '''
"""Minimal mc3.utils stand-in: the Log screen+file tee."""
import sys

class Log:
    def __init__(self, logname=None, verb=2, width=80, append=False):
        self.logname = logname
        self.verb = verb
        self.width = width
        self.sep = 70 * ':'
        self.warnings = []
        self.file = None
        if logname is not None:
            self.file = open(logname, 'a' if append else 'w')

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def write(self, text):
        if self.file is not None and not self.file.closed:
            self.file.write(text + '\\n')

    def head(self, message, indent=0, si=None):
        if self.verb >= 1:
            print(message)
        self.write(message)

    def msg(self, message, indent=0, si=None, width=None):
        if self.verb >= 2:
            print(message)
        self.write(message)

    def debug(self, message, indent=0):
        self.write(message)

    def warning(self, message):
        self.warnings.append(message)
        if self.verb >= 0:
            print('Warning:', message)
        self.write('Warning: ' + message)

    def error(self, message, tracklev=None):
        self.write('Error: ' + message)
        self.close()
        raise ValueError(message)

    def close(self):
        if self.file is not None and not self.file.closed:
            self.file.close()


def burn(Zdict=None, burnin=None, Z=None, zchain=None, sort=True):
    raise NotImplementedError('mc3 stub: burn')
'''

_MC3_PLOTS = '''
"""Minimal mc3.plots stand-in (never exercised in golden runs)."""
class Theme:
    def __init__(self, color=None, **kw):
        self.color = color
        self.dark_color = color
        self.light_color = color

class _Themes(dict):
    def __missing__(self, key):
        return Theme(key)

THEMES = _Themes()

def _unavailable(*args, **kwargs):
    raise NotImplementedError('mc3 stub: plotting unavailable')

Posterior = trace = subplot = alphatize = _unavailable
'''

_MC3_STATS = '''
"""Minimal mc3.stats stand-in (never exercised in golden runs)."""
def _unavailable(*args, **kwargs):
    raise NotImplementedError('mc3 stub: stats unavailable')

Loglike = Prior_transform = calc_sample_statistics = _unavailable
summary_stats = cred_region = _unavailable
'''

_MC3_INIT = '''
from . import utils
from . import plots
from . import stats
from .utils import Log
__version__ = '3.2.5'

def sample(*args, **kwargs):
    raise NotImplementedError('mc3 stub: sampler unavailable')
'''

_CHEMCAT = '''
"""Minimal chemcat stand-in (equilibrium chemistry is never exercised
in the golden runs, which use uniform-VMR input atmospheres)."""
__version__ = '1.0.0'

def Network(*args, **kwargs):
    raise NotImplementedError('chemcat stub: TEA unavailable')
'''


def build_reference(dest=BUILD_DIR):
    """Copy + compile the reference into `dest`; returns the import
    root (prepend to PYTHONPATH) or None when unavailable."""
    marker = os.path.join(dest, '.build_ok')
    if os.path.isfile(marker) and open(marker).read() == BUILD_VERSION:
        return dest
    if not os.path.isdir(REFERENCE_ROOT + 'pyratbay'):
        return None
    try:
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        os.makedirs(dest)
        shutil.copytree(
            REFERENCE_ROOT + 'pyratbay', os.path.join(dest, 'pyratbay'),
        )
        # The reference resolves {ROOT} to its install dir; mirror its
        # tests tree (mock inputs + configs + filters) and a writable
        # outputs/:
        for sub in ('tests/inputs', 'tests/configs', 'tests/expected',
                    'tests/filters'):
            shutil.copytree(
                REFERENCE_ROOT + sub, os.path.join(dest, sub),
            )
        os.makedirs(os.path.join(dest, 'tests', 'outputs'))
        # Stub packages:
        mc3_dir = os.path.join(dest, 'mc3')
        os.makedirs(mc3_dir)
        for name, src in [
                ('__init__.py', _MC3_INIT), ('utils.py', _MC3_UTILS),
                ('plots.py', _MC3_PLOTS), ('stats.py', _MC3_STATS)]:
            with open(os.path.join(mc3_dir, name), 'w') as f:
                f.write(textwrap.dedent(src))
        with open(os.path.join(dest, 'chemcat.py'), 'w') as f:
            f.write(textwrap.dedent(_CHEMCAT))
        # C extensions (reference setup.py flags):
        src_c = REFERENCE_ROOT + 'src_c'
        inc_py = sysconfig.get_paths()['include']
        inc_np = np.get_include()
        libdir = os.path.join(dest, 'pyratbay', 'lib')
        for cfile in glob.glob(f'{src_c}/*.c'):
            name = os.path.splitext(os.path.basename(cfile))[0]
            cmd = [
                'gcc', '-shared', '-fPIC', '-O3', '-ffast-math',
                f'-I{src_c}/include', f'-I{inc_py}', f'-I{inc_np}',
                cfile, '-o', f'{libdir}/{name}.so', '-lm',
            ]
            result = subprocess.run(cmd, capture_output=True)
            if result.returncode != 0:
                return None
        with open(marker, 'w') as f:
            f.write(BUILD_VERSION)
        return dest
    except (OSError, subprocess.SubprocessError):
        return None


_RUN_TEMPLATE = '''
import os, sys
import numpy as np
sys.path.insert(0, {dest!r})
os.chdir(os.path.join({dest!r}, 'tests'))
import pyratbay as pb

skip = {skip!r}
if skip:
    result = pb.Pyrat({cfg!r})
    result.run(skip=skip)
else:
    result = pb.run({cfg!r}, with_log=False)
out = {{}}
if hasattr(result, 'spec') and result.spec is not None \\
        and getattr(result.spec, 'spectrum', None) is not None:
    out['spectrum'] = np.asarray(result.spec.spectrum)
    out['wn'] = np.asarray(result.spec.wn)
    for attr in ('clear', 'cloudy'):
        val = getattr(result.spec, attr, None)
        if val is not None:
            out[attr] = np.asarray(val)
if hasattr(result, 'ex') and getattr(result.ex, 'etable', None) is not None:
    out['etable'] = np.asarray(result.ex.etable)
    out['temp'] = np.asarray(result.ex.temp)
# Arbitrary extra extraction code (has `result`, `out`, `np` in scope):
{post}
np.savez({out!r}, **out)
'''


def run_reference(cfg_file, out_file, skip=None, timeout=600, post=''):
    """Run `pb.run(cfg_file)` in a subprocess; returns the loaded npz
    dict, or raises on failure.

    post: extra python code executed after the run with `result` (the
    Pyrat object), `out` (the npz dict), and `np` in scope -- used to
    extract diagnostics beyond the spectrum (contribution functions,
    per-model extinction, eval() outputs).
    """
    dest = build_reference()
    if dest is None:
        raise RuntimeError('reference build unavailable')
    script = _RUN_TEMPLATE.format(
        dest=dest, cfg=cfg_file, out=out_file, skip=skip or [],
        post=post,
    )
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PYTHONPATH', None)
    proc = subprocess.run(
        [sys.executable, '-c', script],
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f'reference run failed:\n{proc.stdout}\n{proc.stderr}'
        )
    return dict(np.load(out_file))
