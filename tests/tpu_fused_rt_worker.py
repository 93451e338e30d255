"""TPU worker (launched by test_tpu_hw.py): run the fused ensemble RT
kernels -- batched transit (ensemble_pallas) and plane-parallel
emission (emission_pallas) -- plus the grouped-wing LBL pipeline on
real hardware and save kernel-vs-XLA pairs.  The main suite only
exercises these in the pallas interpreter, which round 3/4 showed can
accept programs Mosaic rejects or miscompiles.
"""
import os

import numpy as np


def main():
    import jax

    out_file = os.environ['PBT_FUSED_OUT']
    backend = jax.default_backend()
    if backend != 'tpu':
        np.savez(out_file, backend=backend)
        return

    import jax.numpy as jnp

    from pyratbay_tpu.atmosphere.geometry import transit_path_matrix
    from pyratbay_tpu.ops.planck import blackbody_wn
    from pyratbay_tpu.spectrum import rt
    from pyratbay_tpu.spectrum.emission_pallas import (
        emission_flux_ensemble,
    )
    from pyratbay_tpu.spectrum.ensemble_pallas import (
        transit_spectrum_ensemble,
    )

    rng = np.random.default_rng(5)
    nb, nl, nw = 12, 40, 1500
    f32 = np.float32

    # ---- Transit ensemble kernel vs per-chain XLA:
    radius = (np.linspace(1.10, 1.00, nl)[None, :]
              * (1 + 0.005 * rng.standard_normal((nb, 1)))).astype(f32)
    ec = (rng.lognormal(-3.0, 2.0, (nb, nl, nw))
          * np.exp(np.linspace(0, 8, nl))[None, :, None]).astype(f32)
    rstar = f32(12.0)
    paths = np.stack([
        np.asarray(transit_path_matrix(jnp.asarray(radius[b])))
        for b in range(nb)
    ]).astype(f32)

    transit_fused = np.asarray(transit_spectrum_ensemble(
        [jnp.asarray(ec)], jnp.asarray(paths), jnp.asarray(radius),
        rstar, jnp.zeros(nb, np.int32), jnp.full(nb, nl, np.int32),
        maxdepth=10.0, chain_block=8,
    ))

    def transit_one(ec_i, path_i, rad_i):
        depth, ideep = rt.transit_depth(ec_i, path_i, 10.0, 0, nl)
        return rt.transmission_spectrum(depth, ideep, rad_i, rstar, 0)

    transit_xla = np.asarray(jax.jit(jax.vmap(transit_one))(
        jnp.asarray(ec), jnp.asarray(paths), jnp.asarray(radius),
    ))

    # ---- Emission ensemble kernel vs per-chain XLA:
    radius_e = (np.linspace(7.2e9, 7.0e9, nl)[None, :]
                * (1 + 0.01 * rng.standard_normal((nb, 1)))).astype(f32)
    temp = (1200 + 500 * rng.random((nb, nl))).astype(f32)
    ec_e = (rng.lognormal(-25.0, 2.0, (nb, nl, nw))
            * np.exp(np.linspace(0, 10, nl))[None, :, None]).astype(f32)
    wn = np.linspace(2000.0, 9000.0, nw)
    mu, weights = rt.gauss_quadrature(5)

    emission_fused = np.asarray(emission_flux_ensemble(
        [jnp.asarray(ec_e)], jnp.asarray(radius_e), jnp.asarray(temp),
        wn, mu, weights, jnp.zeros(nb, np.int32),
        jnp.full(nb, nl, np.int32), maxdepth=10.0, chain_block=8,
    ))

    def emission_one(ec_i, rad_i, t_i):
        depth, ideep = rt.plane_parallel_depth(ec_i, rad_i, 10.0, 0, nl)
        bb = blackbody_wn(jnp.asarray(wn, jnp.float32), t_i[:, None])
        inten = rt.plane_parallel_intensity(
            depth, bb, jnp.asarray(mu, jnp.float32), ideep, 0)
        return jnp.sum(
            inten * jnp.asarray(weights, jnp.float32)[:, None], axis=0)

    emission_xla = np.asarray(jax.jit(jax.vmap(emission_one))(
        jnp.asarray(ec_e), jnp.asarray(radius_e), jnp.asarray(temp),
    ))

    # ---- Grouped-wing LBL pipeline (pallas) vs XLA lowering:
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _synthetic_lines
    from pyratbay_tpu.opacity.lbl_tpu import DirectLBL

    lines = _synthetic_lines(nlines=8000)
    block = 4
    temps_l = np.linspace(700.0, 2900.0, block)
    vmr = np.array([0.85, 0.149, 1e-6, 3e-6, 5e-8, 4e-4, 1e-4, 5e-4,
                    1e-7])
    dens = vmr[None, :] * (
        np.logspace(-4, 1, block)[:, None] * 1.01e6
        / (1.380649e-16 * temps_l[:, None])
    )
    pf = lines.iso_pf(temps_l).T
    dp = DirectLBL(lines, tile=128)
    dx = DirectLBL(lines, tile=128, use_pallas=False)
    args = (
        jnp.asarray(temps_l, jnp.float32),
        jnp.asarray(dens, jnp.float32),
        jnp.asarray(pf, jnp.float32),
    )
    lbl_pallas = np.asarray(jax.jit(dp._cross_section_batch)(
        dp.tables(), *args))
    lbl_xla = np.asarray(jax.jit(dx._cross_section_batch)(
        dx.tables(), *args))

    # ---- Flagship batched forward (in-kernel LS + CIA + fused RT)
    # vs per-chain vmap, both f32 on the chip -- covers the whole
    # ensemble assembly (retrieval/batched.py), not just the kernels:
    import tempfile

    from pyratbay_tpu.benchmark import make_flagship
    from pyratbay_tpu.retrieval.batched import build_forward_batched

    workdir = tempfile.mkdtemp(prefix='pbt_hw_flag_')
    model, obs, ret, forward, p0 = make_flagship(
        workdir, nlayers=21, wl_low=1.1, wl_high=1.3, wnstep=2.0,
    )
    fb = build_forward_batched(model, obs, ret)
    pb = jnp.asarray(np.tile(
        np.asarray(p0, np.float32), (6, 1)))
    flag_batched = np.asarray(jax.jit(
        lambda p: fb(p)['spectrum'])(pb))
    flag_vmap = np.asarray(jax.jit(jax.vmap(
        lambda p: forward(p)['spectrum']))(pb))

    np.savez(
        out_file, backend=backend,
        transit_fused=transit_fused, transit_xla=transit_xla,
        emission_fused=emission_fused, emission_xla=emission_xla,
        lbl_pallas=lbl_pallas, lbl_xla=lbl_xla,
        flag_batched=flag_batched, flag_vmap=flag_vmap,
    )


if __name__ == '__main__':
    main()
