"""float32 accuracy worker (launched by test_f32_accuracy.py).

Runs the flagship forward model and a DirectLBL cross section in a
TRUE x32 process (jax_enable_x64 never set, so every device array is
float32) and writes the outputs for the float64 parent to compare.
Shared helpers live here so both precisions evaluate identical inputs.
"""
import os
import sys

import numpy as np


def synthetic_lines(nlines=20_000, seed=3):
    """Deterministic synthetic H2O-like line list (numpy only)."""
    rng = np.random.default_rng(seed)

    class _Lines:
        wn = np.arange(5882.0, 9091.0, 1.0)
        lwn = np.sort(rng.uniform(5800.0, 9200.0, nlines))
        gf = rng.lognormal(-8, 3, nlines)
        elow = rng.uniform(0, 15000, nlines)
        isoid = rng.integers(0, 4, nlines)
        iso_mass = np.array([18.011, 20.015, 19.015, 19.017])
        iso_ratio = np.array([0.997, 2e-3, 3.7e-4, 3.1e-4])
        iso_spec_index = np.zeros(4, int)
        iso_atm_index = np.full(4, 5)
        nspec = 1
        mol_radius = np.array(
            [1.445, 1.4, 1.1, 2.2, 2.8, 1.6, 2.0, 1.9, 1.97]) * 1e-8
        mol_mass = np.array(
            [2.016, 4.003, 1.008, 22.99, 39.098, 18.015, 16.04, 28.01,
             44.01])
        cutoff = 25.0
        tmin = 100.0
        tmax = 3000.0

        @staticmethod
        def iso_pf(t):
            t = np.atleast_1d(t)
            return np.tile(174.0 * (t / 296.0)**1.5, (4, 1))

    return _Lines()


def lbl_inputs():
    """One (T, densities) tabulation cell shared by both precisions."""
    temp = 1400.0
    vmr = np.array([0.85, 0.149, 1e-6, 3e-6, 5e-8, 4e-4, 1e-4, 5e-4,
                    1e-7])
    dens = vmr * 1.01e6 * 0.05 / (1.380649e-16 * temp)
    return temp, dens


def compute(workdir):
    """Flagship spectrum/bandflux + DirectLBL sigma at the session's
    active precision."""
    import jax
    import jax.numpy as jnp
    from pyratbay_tpu.benchmark import make_flagship
    from pyratbay_tpu.opacity.lbl_tpu import DirectLBL

    model, obs, ret, forward, p0 = make_flagship(workdir)
    out = jax.jit(forward)(jnp.asarray(p0))
    spectrum = np.asarray(out['spectrum'])
    bandflux = np.asarray(out['bandflux'])

    lines = synthetic_lines()
    direct = DirectLBL(lines, tile=128)
    temp, dens = lbl_inputs()
    sigma = np.asarray(direct.cross_section(temp, dens))
    return spectrum, bandflux, sigma


def main():
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    assert not jax.config.jax_enable_x64, 'worker must run in x32'

    workdir = os.environ['PBT_F32_WORKDIR']
    spectrum, bandflux, sigma = compute(workdir)
    assert spectrum.dtype == np.float32, spectrum.dtype
    assert sigma.dtype == np.float32, sigma.dtype
    np.savez(
        os.environ['PBT_F32_OUT'],
        spectrum=spectrum, bandflux=bandflux, sigma=sigma,
    )
    return 0


if __name__ == '__main__':
    sys.exit(main())
