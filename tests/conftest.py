"""Test configuration.

Accuracy parity with the reference's float64 golden files requires x64;
tests run on CPU with a virtual 8-device mesh so multi-chip sharding
paths are exercised without TPU hardware.  (Benchmarks run separately
on the real chip in float32.)
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # force: the env presets 'axon' (TPU)
flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import pytest  # noqa: E402

# Reference installation (read-only), used for golden-file cross checks:
REFERENCE_ROOT = '/root/reference/'


def reference_available():
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason='reference golden files not available',
)


@pytest.fixture
def ref_root():
    return REFERENCE_ROOT
