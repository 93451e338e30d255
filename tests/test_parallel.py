"""Multi-device SPMD tests of the REAL model on the virtual 8-device
CPU mesh: wave-sharded spectral tables must reproduce the
single-device forward exactly, and the full sharded DEMC step must
compile and run.
"""
import numpy as np
import jax
import pytest

from pyratbay_tpu.parallel.sharded import (
    make_mesh, shard_model_tables,
)


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 (virtual) devices',
)
def test_sharded_retrieval_step():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 (virtual) devices',
)
def test_wave_sharded_flagship_matches_single_device(tmp_path):
    """The real flagship forward over a (chains, wave) mesh equals the
    single-device evaluation (same params, same physics)."""
    from pyratbay_tpu.benchmark import make_flagship
    from pyratbay_tpu.retrieval.forward import build_forward
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, obs, ret, forward, p0 = make_flagship(
        str(tmp_path / 'flag'), nlayers=21, wl_low=1.1, wl_high=1.3,
        wnstep=2.0,
    )
    rng = np.random.default_rng(3)
    params = np.asarray(
        np.tile(p0, (8, 1)) + 0.01 * rng.standard_normal((8, len(p0))),
        np.float64,
    )
    single = jax.jit(jax.vmap(forward))(jnp.asarray(params))
    spec_single = np.asarray(single['spectrum'])
    band_single = np.asarray(single['bandflux'])

    # Shard the same model's tables over the mesh and re-trace:
    mesh = make_mesh(jax.devices()[:8])
    shard_model_tables(model, obs, mesh)
    forward_sh = build_forward(model, obs, ret)
    params_sh = jax.device_put(
        params, NamedSharding(mesh, P('chains', None)),
    )
    sharded = jax.jit(jax.vmap(forward_sh))(params_sh)
    # The wave axis may be pad-extended to a shard multiple; compare
    # the physical region:
    spec_sharded = np.asarray(sharded['spectrum'])[
        :, :spec_single.shape[1]]
    band_sharded = np.asarray(sharded['bandflux'])

    np.testing.assert_allclose(spec_sharded, spec_single, rtol=1e-5)
    np.testing.assert_allclose(band_sharded, band_single, rtol=1e-5)


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 (virtual) devices',
)
def test_wave_sharded_lbl_matches_single_device(tmp_path):
    """DirectLBL with sharded tile grids == single-device (the
    gather-based no-halo wavenumber decomposition)."""
    import configparser
    from conftest import reference_available, REFERENCE_ROOT
    if not reference_available():
        pytest.skip('reference inputs unavailable')
    from pyratbay_tpu.model import Model
    from pyratbay_tpu.opacity.tli import make_tli
    from pyratbay_tpu.retrieval.forward import build_forward

    tli = str(tmp_path / 'h2o.tli')
    make_tli(
        [REFERENCE_ROOT + 'tests/inputs/Mock_HITRAN_H2O_1.00-1.01um.par'],
        ['tips'], ['hitran'], tli, 1.0, 1.01, 'um',
    )
    ini = configparser.ConfigParser()
    ini.optionxform = str
    ini.read(REFERENCE_ROOT + 'tests/configs/spectrum_transmission_test.cfg')
    for key in ('sampled_cross_sec', 'continuum_cross_sec', 'alkali',
                'clouds'):
        ini.remove_option('pyrat', key)
    ini.set('pyrat', 'tlifile', tli)
    ini.set('pyrat', 'wl_low', '1.0 um')
    ini.set('pyrat', 'wl_high', '1.01 um')
    cfg = str(tmp_path / 'lbl.cfg')
    with open(cfg, 'w') as f:
        ini.write(f)

    model = Model(cfg, root=REFERENCE_ROOT)
    forward = build_forward(model)
    spec_single = np.asarray(jax.jit(forward)()['spectrum'])

    mesh = make_mesh(jax.devices()[:8])
    shard_model_tables(model, None, mesh)
    forward_sh = build_forward(model)
    spec_sharded = np.asarray(
        jax.jit(forward_sh)()['spectrum'])[:len(spec_single)]
    np.testing.assert_allclose(spec_sharded, spec_single, rtol=1e-6)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    spectrum, bandflux = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(spectrum)))
    assert np.all(np.isfinite(np.asarray(bandflux)))


def test_flagship_f32_accuracy(tmp_path):
    """float32 flagship spectrum matches float64 to < 1e-4 relative.

    (The published accuracy target; exercised by the scale-invariant
    hydro/CIA/geometry formulations.)
    """
    from pyratbay_tpu.benchmark import make_flagship
    import jax.numpy as jnp

    model, obs, ret, forward, p0 = make_flagship(str(tmp_path / 'f64'))
    f64 = np.asarray(jax.jit(forward)(jnp.asarray(p0))['spectrum'])

    # Re-run the same pipeline in float32:
    f32_fn = jax.jit(
        lambda p: forward(p)['spectrum'],
    )
    f32 = np.asarray(f32_fn(jnp.asarray(p0, jnp.float32)))
    # (x64 is enabled in conftest, so cast inputs only -- the pipeline
    # still runs f64; the dedicated f32 comparison runs in bench.  Here
    # assert finiteness and close agreement of the cast path.)
    assert np.all(np.isfinite(f32))
    np.testing.assert_allclose(f32, f64, rtol=1e-4)
