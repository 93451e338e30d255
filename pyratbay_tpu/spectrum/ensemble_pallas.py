"""Ensemble transit-RT pallas kernel: the whole-batch hot path.

Extends the per-chain fused kernel (rt_pallas.py) to a natively
batched grid (wave-tile OUTER, chain-block INNER), which buys two
things the vmapped kernel cannot:

* chain-invariant tables live as kernel operands indexed only by the
  wave tile, so they are fetched from HBM once per tile and reused
  across the whole ensemble -- the CIA temperature contraction happens
  in-kernel against its (tiny) table instead of as an XLA batched dot
  whose output costs a [B, nlayers, nwave] buffer plus a layout copy;
* the per-chain RT (chord matmul on the MXU + ideep/exp/trapezoid
  epilogue) runs per chain-block with zero intermediate HBM traffic.

HBM per batch = the un-summed extinction parts (read once each) + the
small per-chain weight arrays + the [B, nwave] spectrum write.

Semantics identical to rt_pallas.transit_spectrum_fused per chain
(pinned by tests/test_batched.py through the ensemble builder).
Reference: pyratbay/src_c/_trapezoid.c:238-276,
pyratbay/spectrum/radiative_transfer.py:23-73, opacity/cia.py:150-211.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rt_pallas import _wave_tile, chain_rt_epilogue, prep_chain

__all__ = ['transit_spectrum_ensemble']


def _ensemble_kernel(scal_ref, path2_ref, rad_ref, h_ref, hprev_ref,
                     *rest, maxdepth, l8, cb, n_parts, has_cia,
                     n_ls, n_lbw=0, n_r1=0):
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

    for c in range(cb):
        if part_refs:
            ec = part_refs[0][c]              # [l8, wt]
            for ref in part_refs[1:]:
                ec = ec + ref[c]
        else:
            ec = jnp.zeros(
                (l8, out_ref.shape[-1]), out_ref.dtype,
            )
        for ref in lbw_refs:
            # Layer-major [l, B, w] contributions: the batched-dot
            # producers' NATURAL output layout (no XLA layout copy);
            # the chain slice lands on the block's middle dim:
            ec = ec + ref[:, c]
        for r in range(n_r1):
            # Rank-1 sources (Rayleigh, power-law hazes, gray
            # clouds): layer column x wave row, composed in VMEM --
            # their dense [B, l, W] buffers never exist in HBM:
            ec = ec + r1c_ref[c, r] * r1r_ref[c, r]
        if has_cia:
            # In-kernel CIA: [l8, K] x [K, wt] against the shared,
            # per-wave-tile-resident table:
            ec = ec + jnp.dot(
                ciaw_ref[c], ciat_ref[...],
                preferred_element_type=ec.dtype,
            )
        if n_ls:
            # In-kernel line-sample temperature/abundance contraction:
            # the [K, l8, wt] table slab is chain-invariant (fetched
            # once per wave tile), each chain contributes per-layer
            # weight columns -- the [B, l, W] contribution buffer and
            # its batch-minor layout copy never exist in HBM:
            for k in range(n_ls):
                ec = ec + lsw_ref[c, k] * lst_ref[k]
        depth = jnp.dot(
            path2_ref[c], ec, preferred_element_type=ec.dtype,
        )
        scal = tuple(scal_ref[c, i] for i in range(7))
        out_ref[c:c + 1, :] = chain_rt_epilogue(
            depth, rad_ref[c], h_ref[c], hprev_ref[c], scal,
            maxdepth=maxdepth, l8=l8,
        )


def transit_spectrum_ensemble(
        ec_parts, path, radius, rstar, itop, ibottom,
        deck_itop=None, deck_rsurf=None, cia_w=None, cia_tab=None,
        ls_w=None, ls_tab=None, ec_parts_lbw=(),
        r1_cols=None, r1_rows=None, *,
        maxdepth=np.inf, interpret=False, chain_block=None,
        max_lanes=None,
    ):
    """Resolve tuning defaults OUTSIDE the jit (so they are part of
    the cache key), then dispatch to the jitted kernel wrapper."""
    from .. import tuning
    if max_lanes is None:
        max_lanes = tuning.ENS_LANES
    if chain_block is None:
        chain_block = tuning.ENS_CHAIN_BLOCK
    return _transit_spectrum_ensemble(
        ec_parts, path, radius, rstar, itop, ibottom,
        deck_itop, deck_rsurf, cia_w, cia_tab, ls_w, ls_tab,
        tuple(ec_parts_lbw), r1_cols, r1_rows,
        maxdepth=maxdepth, interpret=interpret,
        chain_block=chain_block, max_lanes=max_lanes,
    )


@functools.partial(
    jax.jit,
    static_argnames=('maxdepth', 'interpret', 'chain_block',
                     'max_lanes'),
)
def _transit_spectrum_ensemble(
        ec_parts, path, radius, rstar, itop, ibottom,
        deck_itop=None, deck_rsurf=None, cia_w=None, cia_tab=None,
        ls_w=None, ls_tab=None, ec_parts_lbw=(),
        r1_cols=None, r1_rows=None, *,
        maxdepth=np.inf, interpret=False, chain_block=None,
        max_lanes=None,
    ):
    """Batched transit spectra in one fused kernel.

    Parameters
    ----------
    ec_parts: list of [B, nlayers, nwave] extinction contributions
        (summed in-kernel).
    path: [B, nlayers, nlayers-1] chord matrices.
    radius: [B, nlayers] (normalized like rstar).
    rstar: scalar.
    itop, ibottom: [B] traced ints.
    deck_itop, deck_rsurf: [B] traced deck surfaces, or None.
    cia_w: [B, nlayers, K] CIA weights (all tables concatenated along
        K), or None.  cia_tab: [K, nwave] concatenated tables.
    ls_w: [B, K2, nlayers, 1] line-sample layer weights (two-hot
        temperature lerp x density x isotope ratio, all (species,
        temp) rows of all tables concatenated along K2), or None.
        ls_tab: [K2, nlayers, nwave] concatenated cross-section
        slabs; the contraction happens in-kernel against the
        chain-invariant per-wave-tile slab.
    maxdepth: static early-stop optical depth.
    chain_block: chains per grid step (static; B is padded up to a
        multiple).

    Returns
    -------
    spectrum [B, nwave].
    """
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
        # All extinction comes from in-kernel contractions:
        nb, nlayers = path.shape[:2]
        nwave = (ls_tab.shape[2] if ls_tab is not None
                 else cia_tab.shape[1])
        dt = jnp.float32
    # Defaults from the round-4 flagship sweep (512 chains, 51x3209):
    # (256 lanes, 32-chain blocks) beat (512,16)/(1664,8) by 5-8%:
    npad, wtile = _wave_tile(nwave, max_lanes=max_lanes)
    cb = chain_block
    bpad = -(-nb // cb) * cb
    has_cia = cia_w is not None
    n_ls = 0 if ls_w is None else ls_w.shape[1]

    path = path.astype(dt)
    path2 = jnp.pad(path, ((0, 0), (0, 0), (1, 0))) \
        + jnp.pad(path, ((0, 0), (0, 0), (0, 1)))   # [B, l, l]

    prep = jax.vmap(
        prep_chain,
        in_axes=(0, None, 0, 0,
                 0 if deck_itop is not None else None,
                 0 if deck_rsurf is not None else None,
                 None, None),
    )
    scal, rad_col, h_col, hprev_col = prep(
        radius, rstar, itop, ibottom, deck_itop, deck_rsurf,
        dt, nlayers,
    )

    if bpad != nb:
        pad_b = ((0, bpad - nb),)
        ec_parts = [
            jnp.pad(p, pad_b + ((0, 0), (0, 0)), mode='edge')
            for p in ec_parts
        ]
        path2 = jnp.pad(path2, pad_b + ((0, 0), (0, 0)), mode='edge')
        scal = jnp.pad(scal, pad_b + ((0, 0),), mode='edge')
        rad_col = jnp.pad(
            rad_col, pad_b + ((0, 0), (0, 0)), mode='edge')
        h_col = jnp.pad(h_col, pad_b + ((0, 0), (0, 0)), mode='edge')
        hprev_col = jnp.pad(
            hprev_col, pad_b + ((0, 0), (0, 0)), mode='edge')
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
        _ensemble_kernel, maxdepth=float(maxdepth), l8=nlayers,
        cb=cb, n_parts=len(ec_parts), has_cia=has_cia, n_ls=n_ls,
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
        chain3((cb, nlayers, 1)),
        chain3((cb, nlayers, 1)),
        chain3((cb, nlayers, 1)),
    ] + [part_spec] * len(ec_parts)
    lbw_spec = pl.BlockSpec(
        (nlayers, cb, wtile), lambda i, j: (0, j, i),
        memory_space=pltpu.VMEM,
    )
    in_specs += [lbw_spec] * len(ec_parts_lbw)
    operands = [scal, path2, rad_col, h_col, hprev_col, *ec_parts,
                *ec_parts_lbw]
    if n_r1:
        in_specs.append(pl.BlockSpec(
            (cb, n_r1, nlayers, 1), lambda i, j: (j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        in_specs.append(pl.BlockSpec(
            (cb, n_r1, 1, wtile), lambda i, j: (j, 0, 0, i),
            memory_space=pltpu.VMEM,
        ))
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
            flops=2 * bpad * nlayers * npad * (nlayers + kcia + n_ls)
            + 30 * bpad * nlayers * npad,
            bytes_accessed=4 * (
                len(ec_parts) * bpad * nlayers * nwave
                + bpad * nlayers * nlayers
                + (kcia + n_ls * nlayers) * nwave
                + bpad * nlayers * n_ls
                + bpad * nwave
            ),
            transcendentals=bpad * nlayers * npad,
        ),
    )(*operands)
    return out[:nb, :nwave]
