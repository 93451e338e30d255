"""Hardware-only kernel checks, run in a subprocess on the default
(TPU) platform; skipped when no TPU is attached.  The main suite forces
CPU (conftest), so this is the only coverage of TPU-only code paths
like the approximate-reciprocal fast path (advisor round-3 finding).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tests', 'tpu_recip_worker.py')


def test_wing_kernel_approx_recip_matches_divide(tmp_path):
    out_file = str(tmp_path / 'recip.npz')
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env.pop('XLA_FLAGS', None)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    env['PBT_RECIP_OUT'] = out_file
    proc = subprocess.run(
        [sys.executable, WORKER], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = np.load(out_file)
    if str(out['backend']) != 'tpu':
        pytest.skip(f"no TPU attached (backend={out['backend']})")
    approx = out['approx'].astype(np.float64)
    exact = out['exact'].astype(np.float64)
    # One Newton step on the hardware approximate reciprocal leaves
    # ~1e-7 relative error, far below the wing tolerance; pin at 1e-5
    # of each tile's peak to keep the check hardware-margin safe:
    scale = np.abs(exact).max(axis=-1, keepdims=True)
    assert np.all(np.abs(approx - exact) <= 1e-5 * scale + 1e-30)
    # And the outputs must not be trivially zero:
    assert np.abs(exact).max() > 0


def test_multispec_lbl_pallas_on_hardware(tmp_path):
    """Multi-species pallas LBL == f32-precision XLA, ON THE CHIP
    (Mosaic lowering failures are invisible to the interpreter)."""
    worker = os.path.join(REPO, 'tests', 'tpu_multispec_worker.py')
    out_file = str(tmp_path / 'ms.npz')
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env.pop('XLA_FLAGS', None)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    env['PBT_MS_OUT'] = out_file
    proc = subprocess.run(
        [sys.executable, worker], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = np.load(out_file)
    if str(out['backend']) != 'tpu':
        pytest.skip(f"no TPU attached (backend={out['backend']})")
    sig_p = out['pallas'].astype(np.float64)
    sig_x = out['xla'].astype(np.float64)
    assert sig_p.shape == sig_x.shape and sig_p.ndim == 3
    scale = np.abs(sig_x).max(axis=-1, keepdims=True) + 1e-300
    assert np.max(np.abs(sig_p - sig_x) / scale) < 2e-4
