"""TPU worker (launched by test_tpu_hw.py): multi-species DirectLBL
cross sections through the pallas kernels vs the f32-precision XLA
lowering, on real hardware.  The interpreter cannot catch Mosaic
lowering failures (round 4 found the original multispec kernels never
compiled on a TPU at all), so this must run on the chip.
"""
import os
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    out_file = os.environ['PBT_MS_OUT']
    if jax.default_backend() != 'tpu':
        np.savez(out_file, backend=jax.default_backend())
        return
    jax.config.update('jax_default_matmul_precision', 'float32')

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'bench', os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'bench.py'))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from pyratbay_tpu.opacity.lbl_tpu import DirectLBL

    lines = bench._synthetic_lines(nlines=20000)
    lines.iso_spec_index = np.array([0, 0, 1, 1])
    lines.nspec = 2
    block = 4
    temps = np.linspace(700.0, 2900.0, block)
    vmr = np.array([0.85, 0.149, 1e-6, 3e-6, 5e-8, 4e-4, 1e-4, 5e-4,
                    1e-7])
    dens = vmr[None, :] * (
        np.logspace(-4, 1, block)[:, None] * 1.01e6
        / (1.380649e-16 * temps[:, None])
    )
    pf = lines.iso_pf(temps).T
    t_args = (
        jnp.asarray(temps, jnp.float32), jnp.asarray(dens, jnp.float32),
        jnp.asarray(pf, jnp.float32),
    )
    direct = DirectLBL(lines, tile=128)
    assert direct._pallas_mode() is True
    sig_pallas = np.asarray(jax.jit(direct._cross_section_batch)(
        direct.tables(), *t_args))
    direct2 = DirectLBL(lines, tile=128, use_pallas=False)
    sig_xla = np.asarray(jax.jit(direct2._cross_section_batch)(
        direct2.tables(), *t_args))
    np.savez(out_file, backend='tpu', pallas=sig_pallas, xla=sig_xla)


if __name__ == '__main__':
    main()
