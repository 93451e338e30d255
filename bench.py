"""Benchmark driver: flagship forward-model throughput on this chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.json config 1): HD 209458 b-like transmission
retrieval forward -- line-sampled H2O + H2-H2 CIA + Na alkali +
deck/haze clouds + hydrostatic radii, 51 layers x 3209 wavenumbers,
float32, batched over a 512-chain ensemble (the retrieval hot loop).

Baseline: the reference's C forward path (interp_ec + alkali +
CIA interp + per-impact-parameter optdepth + transmission integral,
gcc -O3 -ffast-math, same shapes) timed on this host, scaled by the
host core count (the reference parallelizes chains over cores with
multiprocessing).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pyratbay_tpu.benchmark import make_flagship, reference_c_baseline

    batch = int(os.environ.get('PBT_BENCH_BATCH', 512))
    n_iter = int(os.environ.get('PBT_BENCH_ITER', 10))

    model, obs, ret, forward, p0 = make_flagship()
    nwave = model.nwave
    backend = jax.default_backend()

    batched = jax.jit(jax.vmap(lambda p: forward(p)['bandflux']))
    rng = np.random.default_rng(0)
    params = (
        np.tile(p0, (batch, 1))
        + 0.01 * rng.standard_normal((batch, len(p0)))
    ).astype(np.float32)

    result = batched(params)
    result.block_until_ready()
    sample = np.asarray(result)
    if not np.all(np.isfinite(sample)):
        print(json.dumps({
            'metric': 'forward-model throughput',
            'value': 0.0,
            'unit': 'spectra/s',
            'vs_baseline': 0.0,
            'error': 'non-finite output',
        }))
        return 1

    start = time.perf_counter()
    for _ in range(n_iter):
        batched(params).block_until_ready()
    elapsed = (time.perf_counter() - start) / n_iter
    spectra_per_s = batch / elapsed

    # Reference C baseline (per host core x core count):
    try:
        base_core = reference_c_baseline(nwave, model.nlayers, n_eval=10)
    except Exception:
        base_core = None
    ncores = os.cpu_count() or 1
    vs_baseline = None
    baseline_total = None
    if base_core is not None:
        baseline_total = base_core * ncores
        vs_baseline = spectra_per_s / baseline_total

    # Secondary metric: direct line-by-line sampling throughput
    # (the LBL kernel over a 50k-line synthetic list):
    lbl_pairs_per_s = lbl_points_per_s = None
    try:
        lbl_pairs_per_s, lbl_points_per_s = _lbl_kernel_rate()
    except Exception:
        pass

    print(json.dumps({
        'metric': f'forward-model throughput ({backend}, batch={batch}, '
                  f'{model.nlayers}x{nwave} grid, f32)',
        'value': round(spectra_per_s, 1),
        'unit': 'spectra/s',
        'vs_baseline': (
            None if vs_baseline is None else round(vs_baseline, 2)
        ),
        'baseline_c_per_core': (
            None if base_core is None else round(base_core, 1)
        ),
        'baseline_cores': ncores,
        'lbl_line_pairs_per_s': lbl_pairs_per_s,
        'lbl_grid_points_per_s': lbl_points_per_s,
        'single_chip': True,
    }))
    return 0


def _lbl_kernel_rate(nlines=50_000, n_iter=10):
    """Direct-Voigt LBL sampling rate on this chip (pairs/s, points/s)."""
    import time as _time
    import jax
    import jax.numpy as jnp
    from pyratbay_tpu.opacity.lbl_tpu import DirectLBL

    rng = np.random.default_rng(0)

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

        @staticmethod
        def iso_pf(t):
            t = np.atleast_1d(t)
            return np.tile(174.0 * (t / 296.0)**1.5, (4, 1))

    lines = _Lines()
    direct = DirectLBL(lines, tile=128)
    temp = 1400.0
    vmr = np.array([0.85, 0.149, 1e-6, 3e-6, 5e-8, 4e-4, 1e-4, 5e-4,
                    1e-7])
    dens = vmr * 1.01e6 / (1.380649e-16 * temp)
    pf0 = lines.iso_pf(temp)[:, 0]
    args = (
        direct.tables(),
        jnp.asarray(temp, jnp.float32),
        jnp.asarray(dens, jnp.float32),
        jnp.asarray(pf0, jnp.float32),
    )
    for _ in range(2):
        direct._jit_cs(*args).block_until_ready()
    start = _time.perf_counter()
    for _ in range(n_iter):
        direct._jit_cs(*args).block_until_ready()
    dt = (_time.perf_counter() - start) / n_iter
    pairs = direct.ntiles * direct.tile * direct.lmax
    return round(pairs / dt / 1e9, 2), round(direct.nwave / dt, 1)


if __name__ == '__main__':
    sys.exit(main())
