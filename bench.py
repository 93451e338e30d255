"""Benchmark driver: flagship forward-model throughput on this chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Workload (BASELINE.json config 1): HD 209458 b-like transmission
retrieval forward -- line-sampled H2O + H2-H2 CIA + Na alkali +
deck/haze clouds + hydrostatic radii, 51 layers x 3209 wavenumbers,
float32, batched over a 512-chain ensemble (the retrieval hot loop).

Baseline: the reference's C forward path (interp_ec + alkali +
CIA interp + per-impact-parameter optdepth + transmission integral,
gcc -O3 -ffast-math, same shapes) timed on this host, scaled by the
host core count (the reference parallelizes chains over cores with
multiprocessing).

Timing methodology: on the axon TPU tunnel, block_until_ready() can
return before the device finishes and a per-call host sync costs a
~25 ms round trip, so every rate here is measured as N pipelined
dispatches followed by ONE device-to-host fetch, divided by N --
the sustained device throughput.

Secondary metrics:
  * lbl_line_pairs_per_s -- DirectLBL (point, line)-pair rate over a
    50k-line synthetic list at the flagship grid (pairs counted over
    the full cutoff window, the same definition as round 1), with
    cells batched 8-per-program as in real tabulation;
  * lbl_grid_points_per_s -- wavenumber points sampled per second in
    the same workload;
  * tabulation_points_per_s -- DirectLBL.tabulate() (T, layer, wave)
    grid points per second (the runmode=opacity workload);
  * highres_spectra_per_s -- forward throughput at R = 25,000
    (~10,900 wavenumbers), batch 64.
"""
import json
import os
import sys
import time

import numpy as np


_T0 = time.perf_counter()


def _stage(msg):
    """Progress stamp on stderr (stdout carries only the JSON line)."""
    print(f'[bench +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


def _sync(x):
    """Force a real device->host sync (see module docstring)."""
    return np.asarray(x)


def _rate(fn, n_iter):
    """Sustained rate: pipelined dispatches + one final fetch."""
    _sync(fn())  # warm-up / compile
    start = time.perf_counter()
    out = None
    for _ in range(n_iter):
        out = fn()
    _sync(out)
    return (time.perf_counter() - start) / n_iter


def _rate_stats(fn, n_iter, repeats=3):
    """Repeat _rate and report (median_dt, spread_pct).

    Run-to-run variance on the shared axon tunnel reached tens of
    percent in round 4 (README quoted a builder run 28% above the
    driver capture); every headline metric now carries its own
    within-run spread so single numbers can be read with error bars.
    spread_pct = 100 * (max - min) / median over `repeats` repeats.
    """
    dts = sorted(_rate(fn, n_iter) for _ in range(repeats))
    med = dts[len(dts) // 2] if repeats % 2 else (
        0.5 * (dts[repeats // 2 - 1] + dts[repeats // 2]))
    spread = 100.0 * (dts[-1] - dts[0]) / med if med > 0 else 0.0
    return med, round(spread, 1)


def main():
    import jax
    # Persistent compilation cache: tunnel compiles of the big vmapped
    # programs take minutes; repeat bench runs should pay them once.
    try:
        jax.config.update(
            'jax_compilation_cache_dir',
            os.path.expanduser('~/.cache/jax_pbt'),
        )
        jax.config.update(
            'jax_persistent_cache_min_compile_time_secs', 1.0,
        )
    except Exception:
        pass
    import jax.numpy as jnp
    from pyratbay_tpu.benchmark import make_flagship, reference_c_baseline

    batch = int(os.environ.get('PBT_BENCH_BATCH', 512))
    n_iter = int(os.environ.get('PBT_BENCH_ITER', 25))

    _stage('flagship: build + compile')
    model, obs, ret, forward, p0 = make_flagship()
    nwave = model.nwave
    backend = jax.default_backend()

    # Ensemble hot path (retrieval/batched.py): layout-copy-free
    # opacity assembly + the fused transit-RT pallas kernel:
    from pyratbay_tpu.retrieval.batched import build_forward_batched
    forward_b = build_forward_batched(model, obs, ret)
    batched = jax.jit(lambda p: forward_b(p)['bandflux'])
    rng = np.random.default_rng(0)
    params = jnp.asarray((
        np.tile(p0, (batch, 1))
        + 0.01 * rng.standard_normal((batch, len(p0)))
    ).astype(np.float32))

    # Roofline bookkeeping straight from the compiled program:
    compiled = batched.lower(params).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    bytes_per_batch = float(cost.get('bytes accessed', 0.0))
    flops_per_batch = float(cost.get('flops', 0.0))

    sample = _sync(batched(params))
    if not np.all(np.isfinite(sample)):
        print(json.dumps({
            'metric': 'forward-model throughput',
            'value': 0.0,
            'unit': 'spectra/s',
            'vs_baseline': 0.0,
            'error': 'non-finite output',
        }))
        return 1

    elapsed, spread_pct = _rate_stats(lambda: batched(params), n_iter)
    spectra_per_s = batch / elapsed
    _stage('flagship: measured')

    _stage('reference C baseline')
    # Reference C baseline (per host core x core count):
    try:
        base_core = reference_c_baseline(nwave, model.nlayers, n_eval=10)
    except Exception:
        base_core = None
    ncores = os.cpu_count() or 1
    vs_baseline = None
    if base_core is not None:
        vs_baseline = spectra_per_s / (base_core * ncores)

    extras = {}
    # Roofline attribution from the compiled program's cost analysis
    # (the forward is HBM-bandwidth-bound; these quantify how close):
    try:
        extras.update(_roofline_metrics(
            bytes_per_batch, flops_per_batch, elapsed, batch,
        ))
    except Exception as exc:
        extras['flops_error'] = f'{type(exc).__name__}: {exc}'[:120]
    # Line-sample path ablation: the einsum+layout-copy route (the
    # default) vs the in-kernel VPU contraction, with the copy bytes
    # quantified from the compiled programs' own cost analyses --
    # the round-4 verdict's 'fuse it or prove the floor' item:
    _stage('line-sample path ablation')
    try:
        extras['ls_ablation'] = _ls_ablation(
            model, obs, ret, params, batch, bytes_per_batch,
            spectra_per_s,
        )
    except Exception as exc:
        extras['ls_ablation_error'] = (
            f'{type(exc).__name__}: {exc}'[:200])
    # Secondary: direct line-by-line sampling + tabulation throughput:
    _stage('lbl rates')
    try:
        extras.update(_lbl_rates())
    except Exception as exc:
        extras['lbl_error'] = f'{type(exc).__name__}: {exc}'[:120]
    # Secondary: high-resolution forward model (R = 25,000):
    _stage('highres rate')
    try:
        extras.update(_highres_rate())
    except Exception as exc:
        extras['highres_error'] = f'{type(exc).__name__}: {exc}'[:120]
    # Secondary: eclipse-retrieval rate (fused emission ensemble):
    _stage('emission retrieval rate')
    try:
        extras.update(_emission_retrieval_rate())
    except Exception as exc:
        extras['emission_retrieval_error'] = (
            f'{type(exc).__name__}: {exc}'[:120])
    # Secondary: high-res retrieval rate (batched hires channel):
    _stage('hires retrieval rate')
    try:
        extras.update(_hires_retrieval_rate())
    except Exception as exc:
        extras['hires_retrieval_error'] = (
            f'{type(exc).__name__}: {exc}'[:120])
    # Secondary: radiative-equilibrium iteration rate (runmode=radeq):
    _stage('radeq rate')
    try:
        extras.update(_radeq_rate())
    except Exception as exc:
        extras['radeq_error'] = f'{type(exc).__name__}: {exc}'[:120]
    # Batch x grid throughput curve (single chip):
    if os.environ.get('PBT_BENCH_CURVES', '1') != '0':
        _stage('throughput curve')
        try:
            extras['throughput_curve'] = _throughput_curve()
        except Exception as exc:
            extras['curve_error'] = f'{type(exc).__name__}: {exc}'[:120]
    # Production-scale workloads (SURVEY sizes):
    if os.environ.get('PBT_BENCH_PRODUCTION', '1') != '0':
        _stage('production table (~1.2e9 pts)')
        try:
            extras.update(_production_table())
        except Exception as exc:
            extras['production_table_error'] = (
                f'{type(exc).__name__}: {exc}'[:200])
        _stage('production retrieval (1024 chains)')
        try:
            extras.update(_production_retrieval())
        except Exception as exc:
            extras['production_retrieval_error'] = (
                f'{type(exc).__name__}: {exc}'[:200])
    # Wave-sharding scaling efficiency (CPU virtual devices, fixed
    # total work; see pyratbay_tpu/scaling_probe.py):
    if os.environ.get('PBT_BENCH_SCALING', '1') != '0':
        _stage('scaling efficiency (CPU)')
        try:
            extras['scaling'] = _scaling_efficiency()
        except Exception as exc:
            extras['scaling_error'] = f'{type(exc).__name__}: {exc}'[:120]

    print(json.dumps({
        'metric': f'forward-model throughput ({backend}, batch={batch}, '
                  f'{model.nlayers}x{nwave} grid, f32)',
        'value': round(spectra_per_s, 1),
        'value_spread_pct': spread_pct,
        'unit': 'spectra/s',
        'vs_baseline': (
            None if vs_baseline is None else round(vs_baseline, 2)
        ),
        'baseline_c_per_core': (
            None if base_core is None else round(base_core, 1)
        ),
        'baseline_cores': ncores,
        'single_chip': True,
        **extras,
    }))
    return 0


def _ls_ablation(model, obs, ret, params, batch, bytes_einsum,
                 einsum_rate, n_iter=15):
    """Measure the in-kernel line-sample contraction against the
    default einsum + layout-copy path on the SAME chip session.

    The in-kernel variant (ensemble_pallas ls_w/ls_tab operands)
    eliminates the [B, nlayers, nwave] contribution buffer and its
    batch-minor layout copy; the ablation quantifies those bytes (the
    cost-analysis delta between the two compiled programs) and shows
    which path actually wins (v5e, round 5: the MXU einsum despite
    the copy -- see tuning.ENS_INKERNEL_LS).
    """
    import jax

    from pyratbay_tpu import tuning
    from pyratbay_tpu.retrieval.batched import build_forward_batched

    saved = tuning.ENS_INKERNEL_LS
    saved_cb = tuning.ENS_CHAIN_BLOCK
    try:
        tuning.set_tuning(ens_inkernel_ls=32, ens_chain_block=8)
        fb = build_forward_batched(model, obs, ret)
        fn = jax.jit(lambda p: fb(p)['bandflux'])
        compiled = fn.lower(params).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        bytes_inkernel = float(cost.get('bytes accessed', 0.0))
        dt, spread = _rate_stats(lambda: fn(params), n_iter)
    finally:
        tuning.set_tuning(
            ens_inkernel_ls=saved, ens_chain_block=saved_cb)
    return {
        'einsum_spectra_per_s': round(einsum_rate, 1),
        'inkernel_spectra_per_s': round(batch / dt, 1),
        'inkernel_spread_pct': spread,
        'einsum_bytes_per_forward_mb': round(
            bytes_einsum / batch / 1e6, 2),
        'inkernel_bytes_per_forward_mb': round(
            bytes_inkernel / batch / 1e6, 2),
        'ls_copy_and_buffer_mb_per_forward': round(
            max(bytes_einsum - bytes_inkernel, 0.0) / batch / 1e6, 2),
        'default_path': 'einsum' if saved == 0 else 'inkernel',
    }


def _synthetic_lines(nlines=50_000, seed=0):
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


def _lbl_rates(n_iter=50, block=8):
    """DirectLBL pair rate (8-cell blocks, the tabulation workload)
    plus full tabulate() throughput.

    n_iter = 50: every rate here is (n dispatches + ONE ~25 ms tunnel
    fetch) / n, so small n understates the sustained device rate by
    ~2.5 ms/call at n=10 -- the round-2 -> round-3 'regression'
    (14.1 -> 13.5 Gpair/s) was mostly this artifact + host contention.

    Reported rates:
      * lbl_line_pairs_per_s -- padded candidate-window pairs (the
        round-1 definition, kept comparable across rounds);
      * lbl_effective_pairs_per_s -- pairs inside the physical cutoff
        window only (the work the reference's C kernel would do,
        src_c/_extcoeff.c:270-308); the ratio is the masked-work
        overhead of the static-tile formulation."""
    import jax
    import jax.numpy as jnp
    from pyratbay_tpu.opacity.lbl_tpu import DirectLBL

    lines = _synthetic_lines()
    direct = DirectLBL(lines, tile=128)
    rng = np.random.default_rng(1)
    temps = np.linspace(700.0, 2900.0, block)
    vmr = np.array([0.85, 0.149, 1e-6, 3e-6, 5e-8, 4e-4, 1e-4, 5e-4,
                    1e-7])
    dens = vmr[None, :] * (
        np.logspace(-4, 1, block)[:, None] * 1.01e6
        / (1.380649e-16 * temps[:, None])
    )
    pf = lines.iso_pf(temps).T

    # The batched entry routes the wing/core passes through the pallas
    # kernels on TPU (opacity/lbl_pallas.py); PBT_LBL_PALLAS=0 falls
    # back to the XLA lowering.  Measured as an 8-block lax.map sweep
    # (how tabulate() actually runs): the axon tunnel serializes a
    # ~0.9 ms host dispatch with each device program, so single-block
    # dispatch rates understate the device by ~1.7x -- that overhead
    # is reported separately below:
    from jax import lax
    nblk = 8
    tb = direct.tables()
    t_all = np.tile(temps, nblk).reshape(nblk, block)
    d_all = np.tile(dens, (nblk, 1)).reshape(nblk, block, -1)
    p_all = np.tile(pf, (nblk, 1)).reshape(nblk, block, -1)
    sweep = jax.jit(lambda t, d, p: jnp.sum(lax.map(
        lambda a: direct._cross_section_batch(tb, *a), (t, d, p),
    )))
    sweep_args = (
        jnp.asarray(t_all, jnp.float32),
        jnp.asarray(d_all, jnp.float32),
        jnp.asarray(p_all, jnp.float32),
    )
    batched = jax.jit(direct._cross_section_batch)
    args = (
        tb,
        jnp.asarray(temps, jnp.float32),
        jnp.asarray(dens, jnp.float32),
        jnp.asarray(pf, jnp.float32),
    )
    # Full n_iter here too: short loops let one slow dispatch (or the
    # pipeline fill) dominate -- n=6 measured 5-8 G/s where n=40
    # sustains 15+ on the same program:
    dt_sweep, spread_pct = _rate_stats(
        lambda: sweep(*sweep_args), n_iter)
    dt = dt_sweep / nblk
    dt_single, _ = _rate_stats(lambda: batched(*args), n_iter)
    # Padded pairs = the pallas wing layout's actual pair count
    # (grouped fine sub-tiles, opacity/lbl_pallas.py::
    # wing_sigma_grouped) + the core pass:
    lpad_wf = -(-direct.lmax_wf // 128) * 128
    ntpad_wf = (
        -(-direct.ntiles_wf // direct.wing_group) * direct.wing_group
    )
    core_group = max(1, 128 // direct.tile_core)
    lpad_c = -(-direct.lmax_core // 128) * 128
    ntpad_c = -(-direct.ntiles_core // core_group) * core_group
    pairs = block * (
        ntpad_wf * direct.tile_wing * lpad_wf
        + ntpad_c * direct.tile_core * lpad_c
    )
    line_density = len(lines.lwn) / (lines.lwn[-1] - lines.lwn[0])
    eff_pairs = (
        block * direct.nwave * 2.0 * direct.cutoff * line_density
    )
    rates = {
        'lbl_line_pairs_per_s': round(pairs / dt / 1e9, 2),
        'lbl_effective_pairs_per_s': round(float(eff_pairs / dt / 1e9), 2),
        'lbl_rate_spread_pct': spread_pct,
        'lbl_grid_points_per_s': round(block * direct.nwave / dt, 1),
        'lbl_wing_subtile_pts': int(direct.tile_wing),
        # Per-dispatch host overhead on this tunnel (single-block
        # dispatch minus the sweep-amortized device time):
        'lbl_dispatch_overhead_ms': round(
            max(dt_single - dt, 0.0) * 1e3, 2),
    }

    # Full opacity-tabulation throughput (10 T x 51 layers).
    # Sustained rate (same methodology as every other metric here):
    # the first call compiles the sweep program (one-time, cached by
    # XLA across tables/runs -- production tables are hundreds of
    # times larger than this probe); the timed call measures the
    # device-bound steady state.
    press = np.logspace(-6, 2, 51)
    tab_temps = np.linspace(300.0, 3000.0, 10)
    vmr_prof = np.tile(vmr, (51, 1))
    start = time.perf_counter()
    direct.tabulate(tab_temps, press, vmr_prof)  # compile + run
    dt_compile = time.perf_counter() - start
    start = time.perf_counter()
    table = direct.tabulate(tab_temps, press, vmr_prof)
    dt_tab = time.perf_counter() - start
    npoints = table.size

    # The end-to-end number above INCLUDES fetching the ~6.5 MB table
    # through the tunnel's 5-30 MB/s d2h path, which dominates it and
    # made it swing 8x between rounds (5.90M r03 vs 0.70M r04 -- a
    # measurement artifact, not a kernel regression).  The device-
    # bound rate times the same sweep program with a single scalar
    # sync instead:
    sweep = direct._sweep
    tbl = direct.tables()
    cells_t = np.repeat(tab_temps, 51).astype(np.float32)
    dens_c = (vmr_prof[None].repeat(10, 0).reshape(510, -1)
              * (np.tile(press, 10)[:, None] * 1.01325e6
                 / (1.380649e-16 * cells_t[:, None]))).astype(np.float32)
    pf_c = lines.iso_pf(cells_t).T.astype(np.float32)
    tab_block = 64  # tabulate()'s default: reuses its compiled sweep
    nb = -(-510 // tab_block)
    pad = nb * tab_block - 510
    targs3 = tuple(
        jnp.asarray(np.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                           mode='edge')
                    .reshape(nb, tab_block, -1).squeeze())
        for a in (cells_t, dens_c, pf_c)
    )
    # Scalar-reduced output: _rate's syncs then move 4 bytes, not the
    # 6.5 MB table (the sweep itself still runs in full):
    dev_fn = jax.jit(lambda: jnp.sum(sweep(tbl, *targs3)))
    dt_dev, tab_spread = _rate_stats(dev_fn, max(3, n_iter // 10))
    rates['tabulation_points_per_s'] = round(npoints / dt_dev, 1)
    rates['tabulation_rate_spread_pct'] = tab_spread
    rates['tabulation_device_seconds'] = round(dt_dev, 3)
    rates['tabulation_with_fetch_seconds'] = round(dt_tab, 2)
    rates['tabulation_with_fetch_points_per_s'] = round(
        npoints / dt_tab, 1)
    rates['tabulation_compile_seconds'] = round(dt_compile, 2)
    return rates


def _roofline_metrics(bytes_per_batch, flops_per_batch, elapsed,
                      batch):
    """Measured roofline position of the flagship ensemble forward.

    bytes/flops come from the compiled XLA program's own cost
    analysis (fusion-aware HBM traffic), elapsed from the pipelined
    timing loop.  Peaks: TPU v5e ~819 GB/s HBM, ~197 TFLOP/s bf16
    (f32 VPU work peaks far lower, so MFU is quoted against bf16 to
    stay conservative).  The forward is HBM-bandwidth-bound: round-4
    profiling cut bytes/forward 16.5 -> ~4.7 MB (fused pallas RT +
    single-matmul interps) for a 31k -> ~100k spectra/s gain; the
    remaining gap to peak is the line-sample dot's layout copy plus
    sub-peak streaming of the small per-chain tiles.
    """
    gbps = bytes_per_batch / elapsed / 1e9
    tflops = flops_per_batch / elapsed / 1e12
    pct = 100.0 * gbps / 819.0
    return {
        'bytes_per_forward_mb': round(bytes_per_batch / batch / 1e6, 2),
        'achieved_hbm_gbps': round(gbps, 1),
        'hbm_peak_gbps': 819.0,
        'pct_hbm_peak': round(pct, 1),
        'est_flops_per_forward': round(
            flops_per_batch / batch / 1e6, 2),  # MFLOP
        'est_device_tflops': round(tflops, 3),
        'est_mfu_vs_bf16_peak_pct': round(100.0 * tflops / 197.0, 3),
        # Round 5 cut bytes/forward 4.73 -> 2.7 MB (layer-major
        # line-sample parts, no layout copy): HBM stopped being the
        # saturated resource, so the label follows the measurement:
        'bound': (
            'hbm-bandwidth' if pct >= 55.0
            else 'vpu-compute/dispatch (hbm not saturated)'
        ),
    }


def _throughput_curve(n_iter=20):
    """Batch x grid throughput points (spectra/s) on this chip.

    Grids: wnstep=1 (~3.2k), R=25k (~10.9k), R=115k (~50k points over
    1.1-1.7 um).  Combos whose vmapped intermediates exceed the HBM
    budget are skipped and listed in 'skipped' (no silent caps).

    Every (grid, batch) point is a separate XLA program; on the
    remote-compile tunnel each costs minutes the first time, so the
    default sweep is one representative batch per grid (big batch on
    the small grid, small batch on the big grid).  PBT_BENCH_CURVES=
    full restores the 3x3 matrix.
    """
    import jax
    import jax.numpy as jnp
    from pyratbay_tpu.benchmark import make_flagship

    full = os.environ.get('PBT_BENCH_CURVES') == 'full'
    grids = [
        ('wnstep1', dict(wnstep=1.0), [64, 512, 4096] if full
            else [2048]),
        ('R25k', dict(wnstep=None, resolution=25000.0),
            [64, 512, 4096] if full else [512]),
        ('R115k', dict(wnstep=None, resolution=115000.0),
            [64, 512, 4096] if full else [64]),
    ]
    hbm_budget = 10e9
    points = []
    skipped = []
    from pyratbay_tpu.retrieval.batched import build_forward_batched
    for gname, gkw, batches in grids:
        model, obs, ret, forward, p0 = make_flagship(**gkw)
        forward_b = build_forward_batched(model, obs, ret)
        batched = jax.jit(lambda p: forward_b(p)['bandflux'])
        rng = np.random.default_rng(4)
        for batch in batches:
            # ~4 [L, W] f32 intermediates per chain in flight:
            est_bytes = batch * model.nlayers * model.nwave * 4 * 4
            if est_bytes > hbm_budget:
                skipped.append({
                    'grid': gname, 'batch': batch,
                    'reason': f'est {est_bytes / 1e9:.1f} GB > HBM budget',
                })
                continue
            params = jnp.asarray(
                (np.tile(p0, (batch, 1))
                 + 0.01 * rng.standard_normal((batch, len(p0)))
                 ).astype(np.float32),
            )
            dt = _rate(lambda: batched(params), n_iter)
            points.append({
                'grid': gname, 'nwave': int(model.nwave), 'batch': batch,
                'spectra_per_s': round(batch / dt, 1),
                'wave_points_per_s': round(batch * model.nwave / dt, 1),
            })
    return {'points': points, 'skipped': skipped}


def _probe_run(n, resolution=None, batch=8, iters=5, passes=2,
               timeout=900):
    """One scaling_probe subprocess -> dict (or {'error': ...})."""
    import json as _json
    import subprocess

    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env.pop('XLA_FLAGS', None)
    env['PBT_PROBE_BATCH'] = str(batch)
    env['PBT_PROBE_ITERS'] = str(iters)
    env['PBT_PROBE_PASSES'] = str(passes)
    cmd = [sys.executable, '-m', 'pyratbay_tpu.scaling_probe', str(n)]
    if resolution:
        cmd.append(str(resolution))
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ''
    if proc.returncode != 0 or not line.startswith('{'):
        return {'error': (proc.stderr or 'no output')[-200:]}
    return _json.loads(line)


def _scaling_efficiency(device_counts=(1, 2, 4, 8)):
    """Wave-sharding efficiency on N virtual CPU devices.

    Strong scaling (fixed work, R115k grid: ~6.3k wave pts/shard at
    N=8 -- round 3 probed the small flagship grid, 401 pts/shard,
    where GSPMD overhead dominated) and weak scaling (R = 15k x N, so
    per-shard work is constant).  Physical host cores are recorded:
    with virtual devices on an oversubscribed host, efficiency
    measures the sharded-program overhead, not hardware speedup.
    """
    try:
        physical = len(os.sched_getaffinity(0))
    except AttributeError:
        physical = os.cpu_count()

    def block(counts, res_of_n, weak=False):
        times, eff, shard_pts = {}, {}, {}
        for n in counts:
            r = _probe_run(n, resolution=res_of_n(n))
            if 'error' in r:
                times[str(n)] = r
                continue
            times[str(n)] = round(r['sec_per_batch'], 5)
            shard_pts[str(n)] = r['wave_pts_per_shard']
        base = times.get('1')
        if isinstance(base, float):
            for n in counts:
                t_n = times.get(str(n))
                if isinstance(t_n, float):
                    # Strong (fixed work): ideal keeps t constant ->
                    # t1/tN.  Weak (work ~ N on the SAME oversubscribed
                    # host): ideal processes N units in N*t1 ->
                    # N*t1/tN (a plain t1/tN would conflate host
                    # throughput with sharding overhead).
                    ideal = base * n if weak else base
                    eff[str(n)] = round(ideal / t_n, 3)
        return {
            'sec_per_batch': times,
            'efficiency_vs_1dev': eff,
            'wave_pts_per_shard': shard_pts,
        }

    out = {
        'mode': 'wave sharding (virtual CPU devices)',
        'host_logical_cpus': os.cpu_count(),
        'host_affinity_cpus': physical,
        # What these numbers can and cannot show: N virtual devices
        # share the host cores above, so 'efficiency' here measures
        # GSPMD sharding OVERHEAD (ideal = 1.0 means partitioning
        # adds no cost), NOT hardware speedup -- real multi-chip
        # scaling is unknowable on this 1-chip host.  Strong: fixed
        # R115k work, ideal keeps sec_per_batch flat.  Weak: work
        # grows ~N on the same cores, ideal is N*t1/tN:
        'interpretation': (
            'efficiency == sharded-program overhead on an '
            'oversubscribed host, not multi-chip speedup'
        ),
        'strong_R115k': block(device_counts, lambda n: 115000.0),
        'weak_R15k_per_dev': block(
            device_counts, lambda n: 15000.0 * n, weak=True),
    }
    try:
        out['multiprocess_2x4'] = _multiproc_throughput()
    except Exception as exc:
        out['multiprocess_2x4'] = {
            'error': f'{type(exc).__name__}: {exc}'[:200]}
    return out


def _multiproc_throughput(timeout=900):
    """2 processes x 4 virtual devices: jax.distributed throughput of
    the wave-sharded log-posterior ensemble (parallel/mp_probe.py)."""
    import json as _json
    import subprocess

    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env.pop('XLA_FLAGS', None)
    proc = subprocess.run(
        [sys.executable, '-m', 'pyratbay_tpu.parallel.mp_probe'],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ''
    if proc.returncode != 0 or not line.startswith('{'):
        return {'error': (proc.stderr or 'no output')[-200:]}
    return _json.loads(line)


def _radeq_rate(nsamples=250):
    """Radiative-equilibrium iterations per second (runmode=radeq).

    The whole adaptive loop (wobble-damped dT, smoothing) runs as one
    device lax.scan in 25-iteration chunks (spectrum/radeq.py), so the
    rate is device-bound -- vs ~11 it/s when the reference-style loop
    pays one tunnel round trip per iteration.
    """
    from pyratbay_tpu.benchmark import make_radeq
    from pyratbay_tpu.spectrum.radeq import radiative_equilibrium

    model = make_radeq()
    # Warm-up: compiles the chunked scan (one 25-iteration program).
    radiative_equilibrium(model, nsamples=25)
    start = time.perf_counter()
    radiative_equilibrium(
        model, nsamples=nsamples,
        radeq_temps=model.radeq_temps, dt_scale=model._dt_scale,
    )
    dt = time.perf_counter() - start
    return {
        'radeq_iters_per_s': round(nsamples / dt, 2),
        'radeq_nlayers': int(model.nlayers),
        'radeq_nwave': int(model.nwave),
    }


def _production_table(nspec=5, ntemp=24, nlayers=51, nwave=200_000):
    """Production-scale opacity tabulation: nspec independent
    line-list tables over (ntemp x nlayers x nwave) -- ~1.2e9 grid
    points at the defaults (the SURVEY-scale workload; the small
    tabulation probe above is a 1.6M-point sample).

    Wall-clock covers the full device sweep of every (T, layer) cell
    of every species with ONE host fetch at the end (production
    tables stream to npz per species; the axon tunnel's device-to-host
    path is not the device's tabulation rate).  Compile time is
    reported separately (one program serves all species).
    """
    import jax
    import jax.numpy as jnp
    from pyratbay_tpu.opacity.lbl_tpu import DirectLBL

    block = 8
    press = np.logspace(-6, 2, nlayers)
    temps = np.linspace(300.0, 3000.0, ntemp)
    vmr = np.array([0.85, 0.149, 1e-6, 3e-6, 5e-8, 4e-4, 1e-4, 5e-4,
                    1e-7])
    cells_t = np.repeat(temps, nlayers)
    press_cells = np.tile(press, ntemp)
    ncells = ntemp * nlayers
    nblocks = -(-ncells // block)
    npad = nblocks * block - ncells
    cells_t = np.pad(cells_t, (0, npad), mode='edge')
    press_cells = np.pad(press_cells, (0, npad), mode='edge')

    t_compile = 0.0
    t0_all = time.perf_counter()
    # Every block's output stays DEVICE-RESIDENT until the end (round
    # 4 overwrote `out` per block, so dropped buffers could be
    # recycled in ways a real tabulation -- which must keep or stream
    # every [block, nspec, nwave] result -- cannot; the table here is
    # nspec * ncells * nwave * 4 B ~ 4.9 GB, held on HBM like a real
    # sweep would before streaming to npz):
    resident = []
    for ispec in range(nspec):
        lines = _synthetic_lines(seed=ispec)
        lines.wn = np.linspace(5882.0, 9091.0, nwave)
        direct = DirectLBL(lines, tile=128)
        dens = vmr[None, :] * (
            press_cells[:, None] * 1.01325e6
            / (1.380649e-16 * cells_t[:, None])
        )
        pf = lines.iso_pf(cells_t).T
        batched = jax.jit(direct._cross_section_batch)
        tbl = jax.device_put(direct.tables())
        for lo in range(0, nblocks * block, block):
            t_args = (
                jnp.asarray(cells_t[lo:lo + block], jnp.float32),
                jnp.asarray(dens[lo:lo + block], jnp.float32),
                jnp.asarray(pf[lo:lo + block], jnp.float32),
            )
            if ispec == 0 and lo == 0:
                t_c = time.perf_counter()
                out = batched(tbl, *t_args)
                jax.block_until_ready(out)
                t_compile = time.perf_counter() - t_c
                resident.append(out)
            else:
                resident.append(batched(tbl, *t_args))
    # np.asarray on the LAST block is the real sync (in-order device
    # stream; block_until_ready can return early on the axon tunnel):
    _sync(resident[-1])
    wall = time.perf_counter() - t0_all - t_compile
    n_resident = len(resident)
    del resident
    points = nspec * ntemp * nlayers * nwave
    return {
        'production_table': {
            'nspec': nspec, 'ntemp': ntemp, 'nlayers': nlayers,
            'nwave': nwave, 'points': points,
            'device_resident_blocks': n_resident,
            'device_seconds': round(wall, 1),
            'compile_seconds': round(t_compile, 1),
            'points_per_s': round(points / wall, 1),
        },
    }


def _production_retrieval(nchains=1024, chunk_gens=500, max_chunks=70,
                          gr_target=1.01):
    """End-to-end retrieval at production ensemble size: 1024 DEMC
    chains on the flagship model against WFC3-grade synthesized
    observations (30 ppm), run in 500-generation chunks with
    acceptance-adaptive DE steps until the Gelman-Rubin factor over a
    sliding 2000-generation window drops below 1.01 (or the cap).
    """
    import jax
    import jax.numpy as jnp
    from pyratbay_tpu.benchmark import make_flagship
    from pyratbay_tpu.retrieval import sample_demc
    from pyratbay_tpu.retrieval.batched import (
        build_log_posterior_batched,
    )

    def gr_np(hist):
        """Gelman-Rubin on host numpy (uploading the history to the
        device for the jnp version costs seconds per check on the
        tunnel)."""
        ngen, nchains_, _ = hist.shape
        cmeans = hist.mean(axis=0)
        gmean = cmeans.mean(axis=0)
        between = ngen / (nchains_ - 1) * ((cmeans - gmean)**2).sum(0)
        within = hist.var(axis=0, ddof=1).mean(axis=0)
        var_est = (ngen - 1) / ngen * within + between / ngen
        return np.sqrt(var_est / np.where(within > 0, within, 1.0))

    model, obs, ret, forward, p0 = make_flagship()
    if obs.data is None:
        band = np.asarray(jax.jit(forward)(jnp.asarray(p0))['bandflux'])
        rng = np.random.default_rng(11)
        obs.data = band + rng.normal(0.0, 3e-5, band.shape)
        obs.uncert = np.full(band.shape, 3e-5)
    from pyratbay_tpu.retrieval import build_log_posterior
    log_post = build_log_posterior(model, obs, ret)
    log_post_b = jax.jit(build_log_posterior_batched(model, obs, ret))

    # Warm-started ensemble (tight around the truth): the bench
    # measures stationary sampling throughput + convergence
    # confirmation, not burn-in length from a cold prior:
    rng = np.random.default_rng(12)
    pstep = np.asarray(ret.pstep, float)
    init = (
        np.tile(np.asarray(p0), (nchains, 1))
        + 0.05 * pstep * rng.standard_normal((nchains, len(p0)))
    )
    chains = jnp.asarray(np.clip(init, ret.pmin, ret.pmax))
    hist = []
    t_start = time.perf_counter()
    t_sustained = None
    gens = 0
    grfactor = None
    gamma = None
    acc = None
    for chunk in range(max_chunks):
        results = sample_demc(
            log_post,
            chains,
            nsamples=nchains * chunk_gens,
            key=jax.random.PRNGKey(100 + chunk),
            nchains=nchains,
            pstep=ret.pstep, pmin=ret.pmin, pmax=ret.pmax,
            log_post_batched=log_post_b,
            adapt_gamma=True, target_acceptance=0.10,
            gamma_init=gamma,
        )
        chains = results['chains']
        gamma = results['gamma_final']
        acc = float(np.asarray(results['acceptance_rate']))
        gens += np.asarray(results['chain_history']).shape[0]
        # GR window: every 5th generation of the last <= 30k (the
        # sliding-window GR floor is ~1 + c*tau/window; the previous
        # 15k window bottomed out at ~1.016 with tau ~ 1e2):
        hist.append(np.asarray(results['chain_history'])[::5])
        if t_sustained is None:
            t_sustained = time.perf_counter()   # excl. first-chunk compile
            gens_at_sustained = gens
        hist = hist[-60:]
        window = np.concatenate(hist, axis=0)
        grfactor = float(np.max(gr_np(window)))
        if grfactor < gr_target and chunk >= 1:
            break
        budget = float(os.environ.get('PBT_BENCH_RET_BUDGET', 540.0))
        if time.perf_counter() - t_start > budget:
            break  # honest cap: 'converged' stays False
    wall = time.perf_counter() - t_start
    sustained = time.perf_counter() - t_sustained
    sus_gens = gens - gens_at_sustained
    return {
        'production_retrieval': {
            'nchains': nchains,
            'generations': gens,
            'gelman_rubin_max': round(grfactor, 4),
            'gr_window_gens': 60 * 500,
            'gr_window_thin': 5,
            'acceptance_rate': (
                None if acc is None else round(acc, 3)),
            'converged': bool(grfactor < gr_target),
            'wall_seconds': round(wall, 1),
            'chain_evals_per_s': (
                round(nchains * sus_gens / sustained, 1)
                if sus_gens > 0 else None
            ),
        },
    }


def _emission_retrieval_rate(n_iter=20, batch=256):
    """Eclipse-retrieval chain evaluations per second on the batched
    hot path (fused plane-parallel emission kernel with in-kernel
    Planck, spectrum/emission_pallas.py) -- the round-4 verdict's
    missing mode (it fell back to per-chain vmap with its layout
    copies)."""
    import jax
    import jax.numpy as jnp
    from pyratbay_tpu.benchmark import make_flagship
    from pyratbay_tpu.retrieval.batched import (
        build_log_posterior_batched,
    )

    model, obs, ret, forward, p0 = make_flagship(rt_path='eclipse')
    if obs.data is None:
        band = np.asarray(jax.jit(forward)(jnp.asarray(p0))['bandflux'])
        obs.data = band
        obs.uncert = np.maximum(np.abs(band) * 0.03, 1e-12)
    log_post_b = build_log_posterior_batched(model, obs, ret)
    assert not getattr(log_post_b, 'is_fallback', False)
    batched = jax.jit(log_post_b)
    rng = np.random.default_rng(3)
    params = jnp.asarray((
        np.tile(p0, (batch, 1))
        + 0.01 * rng.standard_normal((batch, len(p0)))
    ).astype(np.float32))
    dt, spread = _rate_stats(lambda: batched(params), n_iter)
    return {
        'emission_retrieval_evals_per_s': round(batch / dt, 1),
        'emission_retrieval_spread_pct': spread,
    }


def _hires_retrieval_rate(n_iter=20, batch=64):
    """High-res retrieval (instrumental convolution + retrieved RV +
    resampled likelihood) on the batched hot path -- round 4 forced
    the vmap fallback for any hires channel."""
    import tempfile

    import jax
    import jax.numpy as jnp
    from pyratbay_tpu.benchmark import make_flagship
    from pyratbay_tpu.io import io as pio
    from pyratbay_tpu.observation import Observation
    from pyratbay_tpu.retrieval import RetrievalParams
    from pyratbay_tpu.retrieval.batched import (
        build_log_posterior_batched,
    )

    workdir = tempfile.mkdtemp(prefix='pbt_hires_ret_')
    model, obs0, ret0, fwd0, p0 = make_flagship(workdir)
    wl_hires = np.linspace(1.15, 1.65, 4000)
    hires_file = workdir + '/hires_obs.dat'
    pio.write_observations(
        hires_file, np.full(4000, 0.0066), np.full(4000, 1e-4),
        [f'{wl:.6f} 0.0001 HIRES' for wl in wl_hires],
    )
    cfg = model.cfg
    cfg.obsfile_hires = hires_file
    cfg.inst_resolution = 25000.0
    cfg.retrieval_params = cfg.retrieval_params + \
        '\n    rv_shift   10.0  -100.0  100.0  5.0'
    obs = Observation(cfg, model.wn)
    ret = RetrievalParams(model, obs)
    log_post_b = build_log_posterior_batched(model, obs, ret)
    batched = jax.jit(log_post_b)
    rng = np.random.default_rng(4)
    params = jnp.asarray((
        np.tile(np.asarray(ret.params), (batch, 1))
        + 0.01 * rng.standard_normal((batch, len(ret.params)))
    ).astype(np.float32))
    dt, spread = _rate_stats(lambda: batched(params), n_iter)
    return {
        'hires_retrieval_evals_per_s': round(batch / dt, 1),
        'hires_retrieval_spread_pct': spread,
        'hires_retrieval_npoints': 4000,
    }


def _highres_rate(n_iter=20, batch=64):
    """Flagship forward at R = 25,000 (realistic high-res grid)."""
    import jax
    import jax.numpy as jnp
    from pyratbay_tpu.benchmark import make_flagship

    from pyratbay_tpu.retrieval.batched import build_forward_batched
    model, obs, ret, forward, p0 = make_flagship(
        wnstep=None, resolution=25000.0,
    )
    forward_b = build_forward_batched(model, obs, ret)
    batched = jax.jit(lambda p: forward_b(p)['bandflux'])
    rng = np.random.default_rng(2)
    params = jnp.asarray((
        np.tile(p0, (batch, 1))
        + 0.01 * rng.standard_normal((batch, len(p0)))
    ).astype(np.float32))
    dt = _rate(lambda: batched(params), n_iter)
    return {
        'highres_spectra_per_s': round(batch / dt, 1),
        'highres_nwave': model.nwave,
    }


if __name__ == '__main__':
    sys.exit(main())
