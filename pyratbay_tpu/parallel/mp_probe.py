"""Multi-process throughput probe: 2 processes x 4 virtual CPU devices.

`python -m pyratbay_tpu.parallel.mp_probe` (no env) spawns itself
twice as a jax.distributed process group, times DEMC generations of the
wave-sharded flagship retrieval (the same program the correctness test
tests/test_distributed.py pins against single-process execution), and
prints one JSON line with the sustained ensemble rate.

This is the throughput companion to the round-3 correctness-only
multi-process test (the reference's analog: MPI-parallel MultiNest,
tools/retrieval_tools.py:233-307).
"""
import json
import os
import socket
import subprocess
import sys
import time


def _worker():
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count='
        + os.environ.get('PBT_LOCAL_DEVICES', '4')
    ).strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')
    # f64 like the correctness test (tests/dist_worker.py): in f32 the
    # per-process synthesized observations differ in the last bit and
    # the multi-host device_put consistency check rejects them.
    jax.config.update('jax_enable_x64', True)
    import numpy as np
    from jax import random

    from .distributed import initialize_distributed, process_index
    from .sharded import make_mesh, build_flagship_sharded

    initialize_distributed()
    mesh = make_mesh(jax.devices())
    model, obs, ret, log_post, step, chains, logp_sharding = (
        build_flagship_sharded(
            mesh, nlayers=21, wl_low=1.1, wl_high=1.3, wnstep=4.0,
        )
    )
    logp = jax.jit(
        jax.vmap(log_post), out_shardings=logp_sharding,
    )(chains)

    n_iter = int(os.environ.get('PBT_MP_ITERS', 20))
    # Warm-up generation (compiles the step):
    chains, logp = step(chains, logp, random.PRNGKey(0))
    chains.block_until_ready()
    start = time.perf_counter()
    for i in range(n_iter):
        chains, logp = step(chains, logp, random.PRNGKey(i + 1))
    chains.block_until_ready()
    np.asarray(jax.jit(lambda x: x.sum())(logp))
    dt = (time.perf_counter() - start) / n_iter
    nchains = chains.shape[0]
    if process_index() == 0:
        print(json.dumps({
            'nprocs': int(os.environ.get('PBT_NPROCS', 1)),
            'local_devices': int(os.environ.get('PBT_LOCAL_DEVICES', 4)),
            'nchains': int(nchains),
            'sec_per_generation': round(dt, 5),
            'chain_evals_per_s': round(nchains / dt, 1),
        }), flush=True)
    return 0


def _free_port():
    with socket.socket() as sock:
        sock.bind(('localhost', 0))
        return sock.getsockname()[1]


def main(nprocs=2, local_devices=4):
    if 'PBT_PROCID' in os.environ:
        return _worker()

    env_base = dict(os.environ)
    env_base.pop('JAX_PLATFORMS', None)
    env_base.pop('XLA_FLAGS', None)
    env_base['PBT_LOCAL_DEVICES'] = str(local_devices)
    env_base['PBT_COORDINATOR'] = f'localhost:{_free_port()}'
    env_base['PBT_NPROCS'] = str(nprocs)

    procs = []
    for rank in range(nprocs):
        env = dict(env_base)
        env['PBT_PROCID'] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, '-m', 'pyratbay_tpu.parallel.mp_probe'],
            env=env, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True,
        ))
    line = ''
    for proc in procs:
        out, _ = proc.communicate(timeout=850)
        for cand in (out or '').strip().splitlines():
            if cand.startswith('{'):
                line = cand
    if line:
        print(line)
        return 0
    print(json.dumps({'error': 'no output from process group'}))
    return 1


if __name__ == '__main__':
    sys.exit(main())
