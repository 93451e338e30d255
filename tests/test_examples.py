"""Cookbook scripts must actually run (the reference CI-exercises its
docs cookbooks through the test configs; here each examples/*.py runs
as a subprocess with plotting forced headless)."""
import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, 'examples', '*.py')))


@pytest.mark.parametrize(
    'script', EXAMPLES, ids=[os.path.basename(s) for s in EXAMPLES],
)
def test_example_runs(script, tmp_path):
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    env['MPLBACKEND'] = 'Agg'
    env['JAX_PLATFORMS'] = 'cpu'
    # Keep the demos short in CI (scripts honor these when present):
    env['PBT_EXAMPLE_FAST'] = '1'
    proc = subprocess.run(
        [sys.executable, script], env=env, cwd=str(tmp_path),
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f'{os.path.basename(script)} failed:\n'
        + (proc.stdout + proc.stderr)[-3000:]
    )
