"""Fused transit-RT pallas kernel: chord matmul -> optical depth ->
ideep -> exp -> deck splice -> masked trapezoid, in ONE pass.

The retrieval forward is HBM-bandwidth-bound (round-4 profiling:
~540 GB/s achieved vs the v5e's ~819 GB/s peak), and the unfused XLA
lowering of the transit RT materializes four [nlayers, nwave] HBM
buffers per chain (depth, exp(-depth)*r, the deck-splice select, and a
layout copy) plus an [nlayers, nwave] exceeded mask.  This kernel keeps
the whole per-(chain, wave-tile) column block in VMEM: it reads the
extinction tile once, runs the [L, L] x [L, wtile] chord contraction on
the MXU, and writes only the [wtile] spectrum -- the RT's HBM traffic
drops to one read of ec plus one tiny write.

Numerics match spectrum/rt.py::transit_depth + transmission_spectrum
exactly (modulo f32 reassociation): same maxdepth/ideep early-stop
semantics, same cloud-deck surface splice, same trapezoid.  The pair
sum integral = sum_i 0.5*h_i*(integ_i + integ_{i+1}) over
itop <= i < ideep is evaluated gather-free as
sum_j integ_j * 0.5*(h_j*m_j + h_{j-1}*m_{j-1}) with the masks m built
from row iotas, so the kernel needs no cross-sublane shifts.

Reference semantics: pyratbay/src_c/_trapezoid.c:238-276 (optdepth) and
pyratbay/spectrum/radiative_transfer.py:23-73 (transmission).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['transit_spectrum_fused']


def _round_up(value, mult):
    return -(-value // mult) * mult


def _wave_tile(nwave, max_lanes=4096):
    """(grid-covered width, tile width): tile a 128-multiple.

    The ec operand is NOT padded in HBM (a pre-kernel pad cannot fuse
    into the opaque pallas call and costs a full extra copy of the
    forward's biggest buffer); instead the last tile simply overruns
    the array.  Out-of-bounds lanes read unspecified data, which is
    safe here because every output column depends only on its own ec
    column, and overrun output columns are sliced away.
    """
    n128 = _round_up(nwave, 128) // 128
    best = 1
    for d in range(1, min(n128, max_lanes // 128) + 1):
        if n128 % d == 0:
            best = d
    return n128 * 128, best * 128


def chain_rt_epilogue(depth, rad_col, h_col, hprev_col, scal, *,
                      maxdepth, l8):
    """Everything after the chord contraction, for one chain:
    depth [l8, wt] -> spectrum row [1, wt].  `scal` is the 7-vector
    built by _prep_scalars; shared by the per-chain and ensemble
    kernels."""
    (itop, ibottom, deck_itop, apply_deck, w_surf, inv_rstar2,
     r_itop2) = scal
    dt = depth.dtype
    rows = jax.lax.broadcasted_iota(
        jnp.int32, depth.shape, 0,
    ).astype(dt)
    in_range = (rows >= itop) & (rows < ibottom)
    exceeded = in_range & (depth > maxdepth)
    first = jnp.min(
        jnp.where(exceeded, rows, float(l8)), axis=0, keepdims=True,
    )                                         # [1, wt]
    ideep = jnp.where(first < float(l8), first, ibottom - 1.0)

    integ = jnp.exp(-depth) * rad_col         # [l8, wt] * [l8, 1]

    # Cloud-deck surface splice: replace row deck_itop with the
    # interpolation between rows deck_itop-1 and deck_itop:
    sel_j = rows == (deck_itop - 1.0)
    sel_j1 = rows == deck_itop
    integ_j = jnp.sum(
        jnp.where(sel_j, integ, 0.0), axis=0, keepdims=True,
    )
    integ_j1 = jnp.sum(
        jnp.where(sel_j1, integ, 0.0), axis=0, keepdims=True,
    )
    integ_surf = integ_j * (1.0 - w_surf) + integ_j1 * w_surf
    integ = jnp.where(
        sel_j1 & (apply_deck > 0.5), integ_surf, integ,
    )

    # Masked trapezoid as per-row coefficients (no sublane shifts):
    m = in_range & (rows < ideep)
    mp = (rows >= itop + 1.0) & (rows <= ideep)
    coef = 0.5 * (
        h_col * m.astype(dt) + hprev_col * mp.astype(dt)
    )
    integral = jnp.sum(integ * coef, axis=0, keepdims=True)  # [1, wt]
    return (r_itop2 + 2.0 * integral) * inv_rstar2


def _transit_kernel(scal_ref, path2_ref, rad_ref, h_ref, hprev_ref,
                    *ec_and_out, maxdepth, l8):
    # Extinction arrives as N un-summed contributions; summing here
    # (instead of an XLA add fusion) pins each producer's output
    # layout to the kernel's row-major operand layout, killing the
    # batch-minor layout copies XLA otherwise inserts between the
    # batched-dot opacity producers and this kernel:
    *ec_refs, out_ref = ec_and_out
    ec = ec_refs[0][...]                      # [l8, wt]
    for ref in ec_refs[1:]:
        ec = ec + ref[...]
    path2 = path2_ref[...]                    # [l8, l8]
    depth = jnp.dot(path2, ec, preferred_element_type=ec.dtype)
    scal = tuple(scal_ref[0, i] for i in range(7))
    out_ref[...] = chain_rt_epilogue(
        depth, rad_ref[...], h_ref[...], hprev_ref[...], scal,
        maxdepth=maxdepth, l8=l8,
    )


def prep_chain(radius, rstar, itop, ibottom, deck_itop, deck_rsurf,
               dt, nlayers):
    """Per-chain kernel operands: the scalar 8-vector plus the
    radius/h/h_prev columns (deck fixups applied).  Shared by the
    per-chain and ensemble kernels; vmappable."""
    radius = radius.astype(dt)
    rad_col = radius[:, None]
    h = radius[1:] - radius[:-1]              # [nlayers-1], negative

    itop = jnp.asarray(itop, dt)
    ibottom = jnp.asarray(ibottom, dt)
    if deck_rsurf is not None:
        j = deck_itop - 1
        r_j = jnp.take(radius, jnp.clip(j, 0, nlayers - 1))
        r_j1 = jnp.take(radius, jnp.clip(j + 1, 0, nlayers - 1))
        w_surf = ((r_j - deck_rsurf) / (r_j - r_j1)).astype(dt)
        apply_deck = (jnp.asarray(deck_itop, dt) > itop).astype(dt)
        h = jnp.where(
            jnp.arange(nlayers - 1) == j,
            jnp.where(
                apply_deck > 0.5, jnp.asarray(deck_rsurf, dt) - r_j,
                h[jnp.clip(j, 0, nlayers - 2)],
            ),
            h,
        )
        deck_row = jnp.asarray(deck_itop, dt)
    else:
        w_surf = jnp.asarray(0.0, dt)
        apply_deck = jnp.asarray(0.0, dt)
        deck_row = jnp.asarray(-1.0, dt)

    h_col = jnp.pad(h, (0, 1))[:, None]       # h_j at row j
    hprev_col = jnp.pad(h, (1, 0))[:, None]   # h_{j-1} at row j

    r_itop2 = jnp.take(radius, jnp.clip(itop.astype(jnp.int32), 0,
                                        nlayers - 1)) ** 2
    inv_rstar2 = 1.0 / jnp.asarray(rstar, dt) ** 2
    scal = jnp.stack([
        itop, ibottom, deck_row, apply_deck,
        w_surf, inv_rstar2, r_itop2, jnp.asarray(0.0, dt),
    ])
    return scal, rad_col, h_col, hprev_col


@functools.partial(
    jax.jit,
    static_argnames=('maxdepth', 'interpret'),
)
def transit_spectrum_fused(
        ec, path, radius, rstar, itop, ibottom,
        deck_itop=None, deck_rsurf=None, *,
        maxdepth=np.inf, interpret=False,
    ):
    """Transit (Rp/Rs)^2 spectrum from extinction in one fused kernel.

    Parameters
    ----------
    ec: [nlayers, nwave] extinction coefficient (cm-1); any radius
        normalization must match `path` (the rr*rscale convention of
        Model._run_transit is fine: the depth product is unit-free).
    path: [nlayers, nlayers-1] chord matrix (transit_path_matrix,
        un-padded; the pair-sum fold happens here).
    radius: [nlayers] (same normalization as rstar).
    rstar: scalar stellar radius.
    itop: top integration row (traced int).
    ibottom: one-past-bottom row (traced int; deck_itop+1 with a deck).
    deck_itop / deck_rsurf: opaque-deck surface (traced), or None.
    maxdepth: static early-stop optical depth.

    Returns
    -------
    spectrum [nwave] f32.
    """
    ec_parts = list(ec) if isinstance(ec, (tuple, list)) else [ec]
    nlayers, nwave = ec_parts[0].shape
    npad, wtile = _wave_tile(nwave)

    dt = ec_parts[0].dtype
    path = path.astype(dt)
    path2 = jnp.pad(path, ((0, 0), (1, 0))) \
        + jnp.pad(path, ((0, 0), (0, 1)))
    scal, rad_col, h_col, hprev_col = prep_chain(
        radius, rstar, itop, ibottom, deck_itop, deck_rsurf,
        dt, nlayers,
    )
    # (1, 8) so the vmap batching rule yields a lowering-legal
    # (1, 1, 8) SMEM block:
    scal = scal[None, :]

    kernel = functools.partial(
        _transit_kernel, maxdepth=float(maxdepth), l8=nlayers,
    )
    grid = (npad // wtile,)
    full = lambda i: (0, 0)
    ec_spec = pl.BlockSpec(
        (nlayers, wtile), lambda i: (0, i), memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (nlayers, nlayers), full, memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((nlayers, 1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((nlayers, 1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((nlayers, 1), full, memory_space=pltpu.VMEM),
        ] + [ec_spec] * len(ec_parts),
        out_specs=pl.BlockSpec(
            (1, wtile), lambda i: (0, i), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((1, npad), dt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nlayers * nlayers * npad
            + (30 + len(ec_parts)) * nlayers * npad,
            bytes_accessed=4 * (len(ec_parts) * nlayers * nwave
                                + nlayers * nlayers + nwave),
            transcendentals=nlayers * npad,
        ),
    )(scal, path2, rad_col, h_col, hprev_col, *ec_parts)
    return out[0, :nwave]
