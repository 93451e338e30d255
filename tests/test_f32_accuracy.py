"""True-float32 end-to-end accuracy: the flagship forward model and the
DirectLBL cross section computed in an x32 subprocess (float32 device
arrays throughout -- jax_enable_x64 never set) must match this
process's float64 evaluation at the published 1e-4 relative target
(BASELINE.md accuracy row).

This is what the scale-invariant formulations (radius-normalized
geometry, log-space line strengths, hi/lo float-pair dnu splits,
amagat-normalized CIA) exist to guarantee.
"""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tests', 'f32_worker.py')


def test_f32_pipeline_matches_f64(tmp_path):
    import f32_worker

    workdir = str(tmp_path / 'flagship')
    out_file = str(tmp_path / 'f32.npz')

    # float64 evaluation in-process (conftest enables x64):
    spec64, band64, sigma64 = f32_worker.compute(workdir)
    assert spec64.dtype == np.float64

    # float32 evaluation in a pristine x32 subprocess:
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env.pop('XLA_FLAGS', None)
    env.pop('JAX_ENABLE_X64', None)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    env['PBT_F32_WORKDIR'] = workdir
    env['PBT_F32_OUT'] = out_file
    proc = subprocess.run(
        [sys.executable, WORKER], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    f32 = np.load(out_file)
    assert f32['spectrum'].dtype == np.float32

    np.testing.assert_allclose(
        f32['spectrum'].astype(np.float64), spec64, rtol=1e-4,
    )
    np.testing.assert_allclose(
        f32['bandflux'].astype(np.float64), band64, rtol=1e-4,
    )
    # LBL cross section: 1e-4 relative on all significant values
    # (1e-6 of the peak floors the pruned far wings):
    sigma32 = f32['sigma'].astype(np.float64)
    floor = 1e-6 * sigma64.max()
    strong = sigma64 > floor
    assert strong.sum() > 100
    np.testing.assert_allclose(
        sigma32[strong], sigma64[strong], rtol=1e-4,
    )
