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
        'single_chip': True,
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
