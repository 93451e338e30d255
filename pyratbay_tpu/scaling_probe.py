"""Wave-sharding scaling probe: one device-count measurement.

Run as `python -m pyratbay_tpu.scaling_probe N [resolution]` in a fresh
process: forces the CPU backend with N virtual devices, wave-shards the
flagship model's spectral tables over a (1, N) mesh, times the jitted
vmapped forward, and prints one JSON line.

Strong scaling (fixed total work): perfect sharding keeps wall time
constant as N grows on one host, so efficiency(N) = t(1)/t(N) measures
the overhead of the wavenumber-domain decomposition (partitioning +
GSPMD collectives; the BASELINE.md >= 80% target).  Round-3 probed only
the small flagship grid (401 pts/shard at N=8, too little work to
amortize overhead); pass a constant-R `resolution` for shard-worthy
grids (R115k: ~6.3k pts/shard at N=8).

Weak scaling: pick resolution proportional to N (e.g. 15k*N), so
per-shard work stays constant; weak efficiency = t(1)/t(N).

The reference never decomposes wavenumber at all -- each fork worker
recomputes the full spectrum (pyrat/extinction.py:110-119).

Env knobs: PBT_PROBE_BATCH (default 16), PBT_PROBE_ITERS (default 20),
PBT_PROBE_PASSES (default 3).
"""
import json
import os
import sys
import time


def main(n_devices, resolution=None):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + f' --xla_force_host_platform_device_count={n_devices}'
    ).strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from .benchmark import make_flagship
    from .parallel.sharded import shard_model_tables
    from .retrieval.forward import build_forward

    batch = int(os.environ.get('PBT_PROBE_BATCH', 16))
    n_iter = int(os.environ.get('PBT_PROBE_ITERS', 20))
    passes = int(os.environ.get('PBT_PROBE_PASSES', 3))

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices

    kw = {}
    if resolution:
        kw = dict(wnstep=None, resolution=float(resolution))
    model, obs, ret, forward, p0 = make_flagship(**kw)
    if n_devices > 1:
        mesh = Mesh(
            np.asarray(devices).reshape(1, n_devices), ('chains', 'wave'),
        )
        shard_model_tables(model, obs, mesh)
        forward = build_forward(model, obs, ret)

    batched = jax.jit(jax.vmap(lambda p: forward(p)['bandflux']))
    rng = np.random.default_rng(0)
    params = jnp.asarray(
        (np.tile(p0, (batch, 1))
         + 0.01 * rng.standard_normal((batch, len(p0)))
         ).astype(np.float32),
    )
    np.asarray(batched(params))  # compile + warm up
    # Best-of-N passes: host-contention noise (the probe shares a small
    # CPU with everything else) only ever inflates a pass, never
    # deflates it.
    dt = float('inf')
    for _ in range(passes):
        start = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = batched(params)
        np.asarray(out)
        dt = min(dt, (time.perf_counter() - start) / n_iter)
    print(json.dumps({
        'n_devices': n_devices,
        'sec_per_batch': dt,
        'spectra_per_s': batch / dt,
        'nwave': int(model.nwave),
        'wave_pts_per_shard': int(model.nwave) // n_devices,
        'batch': batch,
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1,
        float(sys.argv[2]) if len(sys.argv) > 2 else None,
    ))
