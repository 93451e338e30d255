"""Ensemble plane-parallel emission-RT pallas kernel.

The emission analog of ensemble_pallas.py: one fused kernel computes,
per (wave-tile, chain-block) grid cell,

    ec sum (+ in-kernel CIA)
    -> cumulative-trapezoid optical depth as TWO [l, l] x [l, wt]
       MXU matmuls (depth at rows j and j+1; the cumsum lowers to a
       per-chain lower-triangular matrix built on the host, so the
       kernel needs no sublane shifts)
    -> in-kernel Planck functions B(wn, T_j), B(wn, T_{j+1}) from the
       per-chain temperature columns (the [B, l, nwave] blackbody grid
       is never materialized in HBM)
    -> ideep early stop, deck-surface override, and the
       I = B_last e^{-tau/mu} - 0.5 sum m_j (B_j + B_{j+1})
       (e^{-tau_{j+1}/mu} - e^{-tau_j/mu}) intensity integral,
       statically unrolled over the (few) quadrature angles
    -> Gauss-quadrature flux [cb, wt] written once.

HBM per batch = one read of each extinction part + small per-chain
operands + the [B, nwave] flux write -- same traffic class as the
transit ensemble kernel.

Numerics match spectrum/rt.py::plane_parallel_depth +
plane_parallel_intensity + the quadrature sum exactly (modulo f32
reassociation), including maxdepth/ideep semantics, the deck
blackbody-surface override, and the single-interval short circuit.
Reference: pyratbay/src_c/_trapezoid.c:175-213 (cumtrapz depth),
304-341 (intensity), pyratbay/pyrat/spectrum.py:42-64 (quadrature).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as pc
from .rt_pallas import _wave_tile

__all__ = ['emission_flux_ensemble', 'prep_emission_chain']

# Planck kernel-parity constants (constants.h:13-15):
_PLANCK_C1 = 2.0 * pc.H_KERNEL * pc.LS_KERNEL**2   # 2 h c^2
_PLANCK_C2 = pc.H_KERNEL * pc.LS_KERNEL / pc.KB_KERNEL  # h c / k


def prep_emission_chain(radius, temp, itop, ibottom, deck_itop,
                        deck_tsurf, dt, nlayers):
    """Per-chain kernel operands for the emission ensemble kernel.

    Returns (scal [8], cum [l, l], cum_next [l, l], temp_col [l, 1],
    temp_next_col [l, 1]).  Vmappable; all deck/itop dependence is
    folded in here so the kernel sees only dense operands.
    """
    radius = jnp.asarray(radius, dt)
    temp = jnp.asarray(temp, dt)
    itop_f = jnp.asarray(itop, dt)
    rows = jnp.arange(nlayers)

    # Cumulative-trapezoid matrices: depth[k] = cum[k] @ ec with
    # cum[k, i] = 0.5*(dr[i]*[itop<=i<=k-1] + dr[i-1]*[itop<=i-1<=k-1])
    # (plane_parallel_depth's step j >= itop masking):
    dr = radius[:-1] - radius[1:]                  # [l-1], positive
    dr_at = jnp.concatenate([dr, jnp.zeros(1, dt)])       # dr[i]
    dr_prev = jnp.concatenate([jnp.zeros(1, dt), dr])     # dr[i-1]
    ii = rows[None, :]
    kk = rows[:, None]
    term1 = jnp.where((ii >= itop) & (ii <= kk - 1), dr_at[None, :], 0.0)
    term2 = jnp.where(
        (ii - 1 >= itop) & (ii - 1 <= kk - 1), dr_prev[None, :], 0.0,
    )
    cum = 0.5 * (term1 + term2)                    # [l, l]
    # Row-shifted variant (depth at layer j+1); its last row is only
    # read under an always-false mask:
    cum_next = jnp.concatenate([cum[1:], cum[-1:]], axis=0)

    # Integration bottom: min(ibottom, l-1), clipped to the deck
    # surface (Model._run_emission's ideep = clip(ideep, 0, deck_itop)):
    bottom = jnp.minimum(jnp.asarray(ibottom, dt), float(nlayers - 1))
    if deck_itop is not None:
        bottom = jnp.minimum(bottom, jnp.asarray(deck_itop, dt))
        # Blackbody surface override B[deck_itop] = B(tsurf): both
        # temperature columns pick up tsurf where they sample that row:
        tsurf = jnp.asarray(deck_tsurf, dt)
        temp_col = jnp.where(rows == deck_itop, tsurf, temp)
        temp_next = jnp.where(
            rows == deck_itop - 1, tsurf,
            jnp.concatenate([temp[1:], temp[-1:]]),
        )
    else:
        temp_col = temp
        temp_next = jnp.concatenate([temp[1:], temp[-1:]])

    scal = jnp.stack([
        itop_f, bottom, jnp.zeros((), dt), jnp.zeros((), dt),
        jnp.zeros((), dt), jnp.zeros((), dt), jnp.zeros((), dt),
        jnp.zeros((), dt),
    ])
    return scal, cum, cum_next, temp_col[:, None], temp_next[:, None]


def _planck(wn_row, wn3_row, temp_col):
    """B(wn, T) = c1 wn^3 / (exp(c2 wn / T) - 1), [l,1]x[1,wt].

    exp(x)-1 instead of expm1 (Mosaic has no expm1 lowering); at
    f32 the difference only matters for h c nu << k T, i.e. x
    below ~1e-3 (wn < ~1 cm-1 at 1000 K), far off any IR grid.
    """
    return _PLANCK_C1 * wn3_row / (
        jnp.exp(_PLANCK_C2 * wn_row / temp_col) - 1.0
    )


def _emission_kernel(scal_ref, cum_ref, cumn_ref, t_ref, tn_ref,
                     wn_ref, *rest, maxdepth, l8, cb, has_cia, n_ls,
                     mu, weights, n_lbw=0, n_r1=0):
    rest = list(rest)
    out_ref = rest.pop()
    lsw_ref = lst_ref = ciaw_ref = ciat_ref = None
    if n_ls:
        lst_ref = rest.pop()
        lsw_ref = rest.pop()
    if has_cia:
        ciat_ref = rest.pop()
        ciaw_ref = rest.pop()
    r1c_ref = r1r_ref = None
    if n_r1:
        r1r_ref = rest.pop()
        r1c_ref = rest.pop()
    lbw_refs = []
    for _ in range(n_lbw):
        lbw_refs.insert(0, rest.pop())
    part_refs = rest

    wn_row = wn_ref[...]                          # [1, wt]
    wn3_row = wn_row * wn_row * wn_row
    dt = wn_row.dtype

    for c in range(cb):
        if part_refs:
            ec = part_refs[0][c]                  # [l8, wt]
            for ref in part_refs[1:]:
                ec = ec + ref[c]
        else:
            ec = jnp.zeros(
                (l8, out_ref.shape[-1]), out_ref.dtype,
            )
        for ref in lbw_refs:
            # Layer-major [l, B, w] contributions (no layout copy):
            ec = ec + ref[:, c]
        for r in range(n_r1):
            # Rank-1 sources: layer column x wave row in VMEM:
            ec = ec + r1c_ref[c, r] * r1r_ref[c, r]
        if has_cia:
            ec = ec + jnp.dot(
                ciaw_ref[c], ciat_ref[...],
                preferred_element_type=ec.dtype,
            )
        if n_ls:
            # In-kernel line-sample contraction (ensemble_pallas
            # pattern): chain-invariant [K, l8, wt] slab x per-chain
            # per-layer weight columns:
            for k in range(n_ls):
                ec = ec + lsw_ref[c, k] * lst_ref[k]
        # HIGHEST precision: the XLA reference computes this depth as
        # an exact-f32 cumsum; default (bf16-pass) MXU precision costs
        # ~3e-3 relative here because exp(-tau/mu) amplifies tau error:
        depth = jnp.dot(
            cum_ref[c], ec, preferred_element_type=ec.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )                                         # tau at row j
        depth_n = jnp.dot(
            cumn_ref[c], ec, preferred_element_type=ec.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )                                         # tau at row j+1

        rtop = scal_ref[c, 0]
        bottom = scal_ref[c, 1]
        rows = jax.lax.broadcasted_iota(
            jnp.int32, depth.shape, 0,
        ).astype(dt)

        # ideep: first row > rtop where tau >= maxdepth, else bottom
        # (plane_parallel_depth:141-145 + the deck clip, both folded
        # into `bottom` by prep_emission_chain):
        stop = (depth >= maxdepth) & (rows > rtop)
        first = jnp.min(
            jnp.where(stop, rows, float(l8)), axis=0, keepdims=True,
        )
        ideep = jnp.where(
            first < float(l8), jnp.minimum(first, bottom), bottom,
        )                                         # [1, wt]

        is_last = rows == ideep
        taumax = jnp.sum(
            jnp.where(is_last, depth, 0.0), axis=0, keepdims=True,
        )
        bb = _planck(wn_row, wn3_row, t_ref[c])   # [l8, wt]
        bb_n = _planck(wn_row, wn3_row, tn_ref[c])
        b_last = jnp.sum(
            jnp.where(is_last, bb, 0.0), axis=0, keepdims=True,
        )
        mask = (rows >= rtop) & (rows < ideep)
        bsum = jnp.where(mask, bb + bb_n, 0.0)
        single = (ideep - rtop) == 1.0

        flux = jnp.zeros_like(taumax)
        for mu_k, w_k in zip(mu, weights):        # static unroll
            inv_mu = 1.0 / mu_k
            d_etau = (
                jnp.exp(-depth_n * inv_mu) - jnp.exp(-depth * inv_mu)
            )
            integral = 0.5 * jnp.sum(
                bsum * d_etau, axis=0, keepdims=True,
            )
            inten = b_last * jnp.exp(-taumax * inv_mu) - integral
            inten = jnp.where(single, b_last, inten)
            flux = flux + w_k * inten
        out_ref[c:c + 1, :] = flux


def emission_flux_ensemble(
        ec_parts, radius, temp, wn, mu, weights, itop, ibottom,
        deck_itop=None, deck_tsurf=None, cia_w=None, cia_tab=None,
        ls_w=None, ls_tab=None, ec_parts_lbw=(),
        r1_cols=None, r1_rows=None, *,
        maxdepth=np.inf, interpret=False, chain_block=None,
        max_lanes=None,
    ):
    """Batched emergent emission flux in one fused kernel.

    Parameters
    ----------
    ec_parts: list of [B, nlayers, nwave] extinction contributions.
    radius: [B, nlayers] (cm); temp: [B, nlayers] (K).
    wn: [nwave] wavenumber grid (cm-1, static host array).
    mu, weights: quadrature angles/weights (static host arrays).
    itop, ibottom: [B] traced ints (rtop / one-past-bottom rows).
    deck_itop, deck_tsurf: [B] traced deck surface index/temperature,
        or None.
    cia_w / cia_tab: as in transit_spectrum_ensemble.
    maxdepth: static early-stop optical depth.

    Returns
    -------
    flux [B, nwave] (quadrature-weighted, same units as
    Model._run_emission's spectrum).
    """
    from .. import tuning
    if max_lanes is None:
        max_lanes = tuning.ENS_LANES
    if chain_block is None:
        chain_block = tuning.ENS_CHAIN_BLOCK
    ec_parts = list(ec_parts)
    if ec_parts:
        nwave = ec_parts[0].shape[2]
    elif ec_parts_lbw:
        nwave = ec_parts_lbw[0].shape[2]
    elif r1_rows is not None:
        nwave = r1_rows.shape[3]
    elif ls_tab is not None:
        nwave = ls_tab.shape[2]
    else:
        nwave = cia_tab.shape[1]
    npad, _ = _wave_tile(nwave, max_lanes=max_lanes)
    # Wavenumber row, padded with ones (pad lanes are sliced away;
    # ones keep the in-kernel Planck finite there).  Built in f64 and
    # cast to the extinction dtype later: an early f32 truncation
    # would degrade the f64 (CPU-test) path:
    wn_row = np.ones((1, npad), np.float64)
    wn_row[0, :nwave] = np.asarray(wn)
    return _emission_flux_ensemble(
        ec_parts, radius, temp, wn_row,
        tuple(float(m) for m in np.asarray(mu)),
        tuple(float(w) for w in np.asarray(weights)),
        itop, ibottom, deck_itop, deck_tsurf, cia_w, cia_tab,
        ls_w, ls_tab, tuple(ec_parts_lbw), r1_cols, r1_rows,
        maxdepth=maxdepth, interpret=interpret,
        chain_block=chain_block, max_lanes=max_lanes,
    )


@functools.partial(
    jax.jit,
    static_argnames=('mu', 'weights', 'maxdepth', 'interpret',
                     'chain_block', 'max_lanes'),
)
def _emission_flux_ensemble(
        ec_parts, radius, temp, wn_row, mu, weights, itop, ibottom,
        deck_itop, deck_tsurf, cia_w, cia_tab, ls_w, ls_tab,
        ec_parts_lbw=(), r1_cols=None, r1_rows=None, *,
        maxdepth, interpret, chain_block, max_lanes,
    ):
    ec_parts = list(ec_parts)
    ec_parts_lbw = list(ec_parts_lbw)
    if ec_parts:
        nb, nlayers, nwave = ec_parts[0].shape
        dt = ec_parts[0].dtype
    elif ec_parts_lbw:
        nlayers, nb, nwave = ec_parts_lbw[0].shape
        dt = ec_parts_lbw[0].dtype
    elif r1_rows is not None:
        nb = r1_rows.shape[0]
        nlayers = r1_cols.shape[2]
        nwave = r1_rows.shape[3]
        dt = r1_rows.dtype
    else:
        nb, nlayers = radius.shape
        nwave = (ls_tab.shape[2] if ls_tab is not None
                 else cia_tab.shape[1])
        dt = jnp.float32
    npad, wtile = _wave_tile(nwave, max_lanes=max_lanes)
    cb = chain_block
    bpad = -(-nb // cb) * cb
    has_cia = cia_w is not None
    n_ls = 0 if ls_w is None else ls_w.shape[1]

    prep = jax.vmap(
        prep_emission_chain,
        in_axes=(0, 0, 0, 0,
                 0 if deck_itop is not None else None,
                 0 if deck_tsurf is not None else None,
                 None, None),
    )
    scal, cum, cum_next, t_col, tn_col = prep(
        radius, temp, itop, ibottom, deck_itop, deck_tsurf,
        dt, nlayers,
    )
    wn_row = jnp.asarray(wn_row, dt)

    if bpad != nb:
        pad_b = ((0, bpad - nb),)
        ec_parts = [
            jnp.pad(p, pad_b + ((0, 0), (0, 0)), mode='edge')
            for p in ec_parts
        ]
        scal = jnp.pad(scal, pad_b + ((0, 0),), mode='edge')
        cum = jnp.pad(cum, pad_b + ((0, 0), (0, 0)), mode='edge')
        cum_next = jnp.pad(
            cum_next, pad_b + ((0, 0), (0, 0)), mode='edge')
        t_col = jnp.pad(t_col, pad_b + ((0, 0), (0, 0)), mode='edge')
        tn_col = jnp.pad(tn_col, pad_b + ((0, 0), (0, 0)), mode='edge')
        if has_cia:
            cia_w = jnp.pad(
                cia_w, pad_b + ((0, 0), (0, 0)), mode='edge')
        if n_ls:
            ls_w = jnp.pad(
                ls_w, pad_b + ((0, 0), (0, 0), (0, 0)), mode='edge')
        ec_parts_lbw = [
            jnp.pad(p, ((0, 0),) + pad_b + ((0, 0),), mode='edge')
            for p in ec_parts_lbw
        ]
        if r1_cols is not None:
            r1_cols = jnp.pad(
                r1_cols, pad_b + ((0, 0),) * 3, mode='edge')
            r1_rows = jnp.pad(
                r1_rows, pad_b + ((0, 0),) * 3, mode='edge')

    n_r1 = 0 if r1_cols is None else r1_cols.shape[1]
    kernel = functools.partial(
        _emission_kernel, maxdepth=float(maxdepth), l8=nlayers,
        cb=cb, has_cia=has_cia, n_ls=n_ls, mu=mu, weights=weights,
        n_lbw=len(ec_parts_lbw), n_r1=n_r1,
    )
    grid = (npad // wtile, bpad // cb)
    chain3 = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM,
    )
    part_spec = pl.BlockSpec(
        (cb, nlayers, wtile), lambda i, j: (j, 0, i),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((cb, 8), lambda i, j: (j, 0),
                     memory_space=pltpu.SMEM),
        chain3((cb, nlayers, nlayers)),
        chain3((cb, nlayers, nlayers)),
        chain3((cb, nlayers, 1)),
        chain3((cb, nlayers, 1)),
        pl.BlockSpec((1, wtile), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
    ] + [part_spec] * len(ec_parts)
    lbw_spec = pl.BlockSpec(
        (nlayers, cb, wtile), lambda i, j: (0, j, i),
        memory_space=pltpu.VMEM,
    )
    in_specs += [lbw_spec] * len(ec_parts_lbw)
    r1_specs = []
    if n_r1:
        r1_specs = [
            pl.BlockSpec(
                (cb, n_r1, nlayers, 1), lambda i, j: (j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cb, n_r1, 1, wtile), lambda i, j: (j, 0, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ]
    in_specs += r1_specs
    operands = [
        scal, cum.astype(dt), cum_next.astype(dt), t_col, tn_col,
        wn_row, *ec_parts, *ec_parts_lbw,
    ]
    if n_r1:
        operands.append(r1_cols.astype(dt))
        operands.append(r1_rows.astype(dt))
    if has_cia:
        kdim = cia_tab.shape[0]
        in_specs.append(chain3((cb, nlayers, kdim)))
        in_specs.append(pl.BlockSpec(
            (kdim, wtile), lambda i, j: (0, i),
            memory_space=pltpu.VMEM,
        ))
        operands.append(cia_w.astype(dt))
        operands.append(jnp.asarray(cia_tab, dt))
    if n_ls:
        in_specs.append(pl.BlockSpec(
            (cb, n_ls, nlayers, 1), lambda i, j: (j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        in_specs.append(pl.BlockSpec(
            (n_ls, nlayers, wtile), lambda i, j: (0, 0, i),
            memory_space=pltpu.VMEM,
        ))
        operands.append(ls_w.astype(dt))
        operands.append(jnp.asarray(ls_tab, dt))

    kcia = cia_tab.shape[0] if has_cia else 0
    nmu = len(mu)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (cb, wtile), lambda i, j: (j, i), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bpad, npad), dt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bpad * nlayers * npad * (2 * nlayers + kcia)
            + (20 + 10 * nmu) * bpad * nlayers * npad,
            bytes_accessed=4 * (
                len(ec_parts) * bpad * nlayers * nwave
                + 2 * bpad * nlayers * nlayers + kcia * nwave
                + bpad * nwave
            ),
            transcendentals=(2 + 2 * nmu) * bpad * nlayers * npad,
        ),
    )(*operands)
    return out[:nb, :nwave]
