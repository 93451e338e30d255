"""Multi-process distributed worker (launched by test_distributed.py).

One process of an N-process jax.distributed group on CPU: initializes
the process group through the repo's own bootstrap
(pyratbay_tpu.parallel.distributed.initialize_distributed, the
equivalent of the reference's MPI rank/size discovery,
tools/mpi_tools.py:66-116), builds the flagship retrieval with
wave-sharded tables over the GLOBAL device mesh, evaluates the
log-posterior of a deterministic chain ensemble, runs two DEMC steps,
and (process 0) writes the all-gathered results to PBT_OUT.

Environment contract:
  PBT_COORDINATOR / PBT_NPROCS / PBT_PROCID  -- process-group config
      (consumed by initialize_distributed);
  PBT_LOCAL_DEVICES -- virtual CPU devices per process;
  PBT_OUT -- output .npz path (written by process 0 only).
"""
import os
import sys

import numpy as np

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + ' --xla_force_host_platform_device_count='
    + os.environ.get('PBT_LOCAL_DEVICES', '2')
).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402
from jax import random  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    from pyratbay_tpu.parallel.distributed import (
        initialize_distributed, process_index, process_count,
    )
    from pyratbay_tpu.parallel.sharded import (
        make_mesh, build_flagship_sharded,
    )

    multi = initialize_distributed()
    nprocs = int(os.environ.get('PBT_NPROCS', 1))
    assert process_count() == nprocs, (
        f'process_count {process_count()} != PBT_NPROCS {nprocs}'
    )
    assert multi == (nprocs > 1)
    assert process_index() == int(os.environ.get('PBT_PROCID', 0))

    mesh = make_mesh(jax.devices())
    model, obs, ret, log_post, step, chains, logp_sharding = (
        build_flagship_sharded(
            mesh, nlayers=21, wl_low=1.1, wl_high=1.3, wnstep=4.0,
        )
    )

    # Deterministic initial log-posterior of the ensemble:
    logp0 = jax.jit(
        jax.vmap(log_post),
        out_shardings=logp_sharding,
    )(chains)

    # Two DEMC generations with fixed keys:
    logp = logp0
    for i in range(2):
        chains, logp = step(chains, logp, random.PRNGKey(i))
    chains.block_until_ready()

    # All-gather to fully-replicated so every process can fetch:
    replicate = jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, P()),
    )
    logp0_full = np.asarray(replicate(logp0))
    chains_full = np.asarray(replicate(chains))
    logp_full = np.asarray(replicate(logp))

    assert np.all(np.isfinite(chains_full))
    if process_index() == 0:
        np.savez(
            os.environ['PBT_OUT'],
            logp0=logp0_full, chains=chains_full, logp=logp_full,
            ndevices=len(jax.devices()), nprocs=process_count(),
        )
    return 0


if __name__ == '__main__':
    sys.exit(main())
