"""Multi-chip SPMD execution: chains x wavenumber device meshes.

The scaling model (jax.sharding + GSPMD; the "annotate shardings, let
XLA insert collectives" recipe):

* `chains` axis -- data parallel over retrieval chains: the vmapped
  forward is partitioned chain-wise, no communication until the
  sampler's cross-chain moves (an all-gather of the small [nchains,
  npars] state).
* `wave` axis -- sequence-parallel over the wavenumber grid: every
  spectral table (cross sections, CIA, Rayleigh, band weights) is
  sharded along its wavenumber dimension, each shard computes its
  wavelength chunk of extinction + optical depth + spectrum locally
  (the transit RT is independent per wavelength), and only the band
  integration contracts over wavenumber -- XLA turns that matvec into
  a local partial product plus one psum over the `wave` axis, riding
  ICI.

This module provides the tables-as-arguments forward + one DEMC
generation ("training step") jitted over the mesh; it is what
`__graft_entry__.dryrun_multichip` compiles and runs.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import random
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'shard_tables', 'sharded_retrieval_step']


def make_mesh(devices=None, chains_axis=None):
    """Build a (chains, wave) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if chains_axis is None:
        # Favor a square-ish split; wave axis gets the larger factor:
        chains_axis = 1
        for f in range(int(np.sqrt(n)), 0, -1):
            if n % f == 0:
                chains_axis = f
                break
    wave_axis = n // chains_axis
    mesh_devices = np.asarray(devices).reshape(chains_axis, wave_axis)
    return Mesh(mesh_devices, ('chains', 'wave'))


def make_demo_tables(nlayers=10, nwave=256, nspec=2, ntemp=5, nbands=4,
                     seed=0):
    """Tiny synthetic spectral tables for the dry-run step."""
    rng = np.random.default_rng(seed)
    press = np.logspace(-6, 2, nlayers)
    radius0 = np.linspace(1.06, 0.99, nlayers)  # in R_planet units
    tables = {
        'press': press,
        'temps': np.linspace(300.0, 3000.0, ntemp),
        'cs_table': rng.random((nspec, ntemp, nlayers, nwave)) * 1e-22,
        'cia_table': rng.random((ntemp, nwave)) * 1e-7,
        'rayleigh_cs': rng.random(nwave) * 1e-27,
        'band_matrix': np.abs(rng.random((nbands, nwave))) / nwave,
        'radius0': radius0,
        'data': np.full(nbands, 0.0066),
        'uncert': np.full(nbands, 2e-5),
    }
    return {k: np.asarray(v, np.float32) for k, v in tables.items()}


def table_shardings(mesh):
    """PartitionSpecs: every spectral table sharded along wavenumber."""
    return {
        'press': NamedSharding(mesh, P()),
        'temps': NamedSharding(mesh, P()),
        'cs_table': NamedSharding(mesh, P(None, None, None, 'wave')),
        'cia_table': NamedSharding(mesh, P(None, 'wave')),
        'rayleigh_cs': NamedSharding(mesh, P('wave')),
        'band_matrix': NamedSharding(mesh, P(None, 'wave')),
        'radius0': NamedSharding(mesh, P()),
        'data': NamedSharding(mesh, P()),
        'uncert': NamedSharding(mesh, P()),
    }


def shard_tables(tables, mesh):
    """Place the demo tables onto the mesh with wave sharding."""
    specs = table_shardings(mesh)
    return {
        key: jax.device_put(val, specs[key])
        for key, val in tables.items()
    }


def _forward_bandflux(tables, params):
    """Minimal transmission forward over sharded tables.

    params = [T_scale, log_vmr, log_haze]; returns bandflux [nbands].
    Mirrors the real forward's structure (table T-interp -> extinction
    -> chord matmul -> masked transmission -> band matvec) on tiny
    shapes.
    """
    press = tables['press']
    temps = tables['temps']
    nlayers = press.shape[0]
    ntemp = temps.shape[0]

    temp = 1000.0 * params[0] * jnp.ones(nlayers)
    vmr = 10.0 ** params[1]
    dens = press * 1.0e6 / (1.380658e-16 * temp)

    tlo = jnp.clip(
        jnp.searchsorted(temps, temp, side='right') - 1, 0, ntemp - 2,
    )
    w_hi = (temp - temps[tlo]) / (temps[tlo + 1] - temps[tlo])
    lay = jnp.arange(nlayers)
    cs = (
        tables['cs_table'][:, tlo, lay, :] * (1.0 - w_hi)[None, :, None]
        + tables['cs_table'][:, tlo + 1, lay, :] * w_hi[None, :, None]
    )
    ec = jnp.sum(cs, axis=0) * (vmr * dens)[:, None]
    cia = (
        tables['cia_table'][tlo] * (1.0 - w_hi)[:, None]
        + tables['cia_table'][tlo + 1] * w_hi[:, None]
    )
    ec = ec + cia * (dens / 2.68678e19)[:, None] ** 2
    ec = ec + 10.0 ** params[2] * tables['rayleigh_cs'][None, :] \
        * dens[:, None]

    # Transit chords (radius in R_planet units; scale folded into ec):
    radius = tables['radius0']
    r2 = radius**2
    s = jnp.sqrt(jnp.maximum(r2[None, :] - r2[:, None], 0.0))
    seg = s[:, :-1] - s[:, 1:]
    rows = jnp.arange(nlayers)[:, None]
    cols = jnp.arange(nlayers - 1)[None, :]
    path = jnp.where(cols < rows, seg, 0.0) * 7.1492e9
    depth = path @ (ec[:-1] + ec[1:])

    integ = jnp.exp(-depth) * radius[:, None]
    h = radius[1:] - radius[:-1]
    spectrum = (
        radius[0]**2
        + 2.0 * jnp.sum(0.5 * h[:, None] * (integ[:-1] + integ[1:]), 0)
    ) / 10.0**2

    # Band integration: contracts over the sharded wave axis (psum):
    return tables['band_matrix'] @ spectrum


def sharded_retrieval_step(mesh, nchains=16, npars=3):
    """Jitted DEMC generation with (chains, wave) shardings.

    Returns (step_fn, init_state) where
    step_fn(tables, chains, logp, key) -> (chains, logp).
    """
    chain_sharding = NamedSharding(mesh, P('chains', None))
    scalar_sharding = NamedSharding(mesh, P('chains'))

    def log_post(tables, params):
        bandflux = _forward_bandflux(tables, params)
        resid = (bandflux - tables['data']) / tables['uncert']
        return -0.5 * jnp.sum(resid**2)

    def step(tables, chains, logp, key):
        k1, k2, k3, k4 = random.split(key, 4)
        n = chains.shape[0]
        r1 = random.randint(k1, (n,), 0, n)
        r2 = random.randint(k2, (n,), 0, n)
        gamma = 2.38 / jnp.sqrt(2.0 * npars)
        noise = 1e-4 * random.normal(k3, chains.shape)
        prop = chains + gamma * (chains[r1] - chains[r2]) + noise
        logp_prop = jax.vmap(lambda p: log_post(tables, p))(prop)
        accept = (
            jnp.log(random.uniform(k4, (n,))) < logp_prop - logp
        )
        new_chains = jnp.where(accept[:, None], prop, chains)
        new_logp = jnp.where(accept, logp_prop, logp)
        return new_chains, new_logp

    jitted = jax.jit(
        step,
        in_shardings=(
            table_shardings(mesh), chain_sharding, scalar_sharding, None,
        ),
        out_shardings=(chain_sharding, scalar_sharding),
    )

    rng = np.random.default_rng(1)
    chains0 = np.asarray(
        np.stack([
            1.2 + 0.1 * rng.standard_normal(nchains),
            -3.5 + 0.2 * rng.standard_normal(nchains),
            0.0 + 0.2 * rng.standard_normal(nchains),
        ], axis=1),
        np.float32,
    )
    return jitted, chains0
