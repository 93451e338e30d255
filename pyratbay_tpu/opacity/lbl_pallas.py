"""Pallas TPU kernel for the DirectLBL wing pass.

The wing pass dominates the (point, line) pair count of the direct
line-by-line sampler (opacity/lbl_tpu.py): every pair within the
25 cm-1 cutoff but outside the ~14-Doppler-width core evaluates the
3-term large-|z| asymptotic series of Re[w(z)] -- ~18 VPU flops plus
one divide.  The XLA lowering of that chain is correct but leaves
throughput on the table: the divide lowers to a full-precision
Newton-Raphson sequence and the [tile, lines] broadcast intermediates
round-trip through HBM-sized fusions.

This kernel keeps the whole pair block in VMEM and replaces the divide
with the TPU's approximate-reciprocal instruction plus one
Newton-Raphson step (relative error ~1e-7, far below the float32 wing
tolerance; the asymptotic series itself is only good to ~2e-7):

    u = 1/(x^2 + y^2)   ->   r = recip_approx(d); u = r*(2 - d*r)

Measured on v5e (50k-line probe, 8 cells, interleaved A/B): runtime
parity with the XLA lowering (3.18 vs 3.20 ms median -- XLA's fusion
is already near-optimal on this chain), but ~50x faster to compile
(4.6 s vs 259 s), which dominates rebuild-heavy workflows (new
wavelength range, new engine config) on a remote-compile tunnel.

Layout (per grid step (cell b, wing tile i, line chunk j)):

    wn   [tile]  f32      output wavenumber tile       (lanes)
    line [lchunk] f32 x5  per-line factors             (lanes)
    pair [tile, lchunk]   dwn/x2/u/s chain             (sublanes x lanes)
    out  [tile]  f32      += sum over lanes (lines)

The (hi, lo) float-pair trick for dnu = nu - nu0 is the same as the
XLA path (lbl_tpu.py docstring): both arrays ship as f32 splits so the
difference keeps ~1e-7 cm-1 precision without float64.

Multi-species engines are handled natively: each kernel receives a
static per-line species one-hot and splits the accumulation per
species (an MXU contraction in the wing pass; see wing_sigma /
core_sigma).  Parity with the XLA path is pinned by
tests/test_lbl_pallas.py for both layouts.

Reference workload: pyratbay's extinction-coefficient sampler
(src_c/_extcoeff.c:87-345); this kernel is the TPU replacement for its
inner profile loop.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.special import wofz_real

__all__ = ['wing_sigma', 'wing_sigma_grouped', 'core_sigma']


def _series(u, a):
    """The shared 5-term asymptotic S(u, a) (lbl_tpu._wing_series;
    imported lazily to avoid a circular import)."""
    from .lbl_tpu import _wing_series
    return _wing_series(u, a)


def _round_up(value, mult):
    return -(-value // mult) * mult


def _wing_kernel(wnh_ref, wnl_ref, lwh_ref, lwl_ref, c1_ref, y2_ref,
                 iad_ref, *rest, margin, cutoff, approx_recip,
                 multispec):
    """One (cell, tile, line-chunk) grid step: accumulate the masked
    asymptotic-series contributions of `lchunk` lines onto `tile`
    output points (per species when `multispec`)."""
    if multispec:
        oh_ref, out_ref = rest
    else:
        (out_ref,) = rest
    j = pl.program_id(2)

    wh = wnh_ref[0, 0, :][:, None]     # [tile, 1]
    wl = wnl_ref[0, 0, :][:, None]
    lh = lwh_ref[0, 0, :][None, :]     # [1, lchunk]
    ll = lwl_ref[0, 0, :][None, :]
    c1 = c1_ref[0, 0, 0, :][None, :]
    y2 = y2_ref[0, 0, 0, :][None, :]
    iad = iad_ref[0, 0, 0, :][None, :]

    # Float-pair difference: full relative precision in f32.
    dwn = (wh - lh) + (wl - ll)        # [tile, lchunk]
    x2 = (dwn * iad) ** 2
    d = x2 + y2
    if approx_recip:
        r = pl.reciprocal(d, approx=True)
        u = r * (2.0 - d * r)          # one Newton step: ~1e-7 rel
    else:
        u = 1.0 / d
    a = x2 * u
    s = _series(u, a)
    adwn = jnp.abs(dwn)
    mask = (adwn > margin) & (adwn <= cutoff)
    contrib = jnp.where(mask, c1 * u * s, 0.0)
    if multispec:
        # Species split via per-species masked lane-reduces into a
        # [nsp, tile] output block.  (A dot_general against the
        # one-hot followed by reshape(-1) only works in the
        # interpreter: Mosaic cannot merge the sublane axis into
        # lanes, so the flattened-output formulation never compiled
        # on hardware -- round-4 finding.)
        oh = oh_ref[0]                      # [nsp, lchunk]
        nsp = oh.shape[0]
        parts = [
            jnp.sum(contrib * oh[si][None, :], axis=1)
            for si in range(nsp)
        ]

        @pl.when(j == 0)
        def _():
            for si in range(nsp):
                out_ref[0, 0, si, :] = parts[si]

        @pl.when(j > 0)
        def _():
            for si in range(nsp):
                out_ref[0, 0, si, :] = out_ref[0, 0, si, :] + parts[si]
    else:
        part = jnp.sum(contrib, axis=1)   # -> [tile]

        @pl.when(j == 0)
        def _():
            out_ref[0, 0, 0, :] = part

        @pl.when(j > 0)
        def _():
            out_ref[0, 0, 0, :] = out_ref[0, 0, 0, :] + part


@functools.partial(
    jax.jit,
    static_argnames=('margin', 'cutoff', 'lchunk', 'interpret',
                     'approx_recip'),
)
def wing_sigma(wn_hi, wn_lo, lwn_hi, lwn_lo, c1, y2, inv_ad,
               spec_onehot=None, *, margin, cutoff, lchunk=4096,
               interpret=False, approx_recip=True):
    """Batched wing-pass cross section, summed over lines.

    Parameters
    ----------
    wn_hi, wn_lo: [ntiles, tile] f32 -- output-grid tiles (hi/lo split).
    lwn_hi, lwn_lo: [ntiles, lmax] f32 -- per-tile line windows.
    c1, y2, inv_ad: [ncell, ntiles, lmax] f32 -- per-cell line factors
        (c1 = y * scale / sqrt(pi), y2 = y^2; see lbl_tpu._wing_tile).
    spec_onehot: [ntiles, nspec, lmax] static one-hot of each line's
        species (raw nspec; Mosaic pads the sublane dim internally),
        or None for single-species engines.
    margin, cutoff: static core/wing split and wing cutoff (cm-1).
    lchunk: lines per inner grid step (VMEM blocking).  The default
        covers typical windows in ONE chunk per tile: the j-loop's
        output read-modify-write and sub-1024 chunk dispatches cost
        ~40% of the kernel's throughput (measured on v5e).
    interpret: run in the pallas interpreter (CPU tests).
    approx_recip: approximate reciprocal + one Newton step instead of a
        full divide (TPU only; the interpreter path always divides).

    Returns
    -------
    sigma [ncell, ntiles, tile] (or [ncell, nspec_pad, ntiles, tile]
        with spec_onehot) -- normalized wing cross sections (caller
        multiplies by its per-cell kmax).
    """
    ncell, ntiles, lmax = c1.shape
    tile = wn_hi.shape[1]
    dtype = c1.dtype
    multispec = spec_onehot is not None
    nsp = spec_onehot.shape[1] if multispec else 1

    lchunk = min(lchunk, _round_up(lmax, 128))
    lpad = _round_up(lmax, lchunk)
    if lpad != lmax:
        # Padded lines sit 1e9 cm-1 away: the cutoff mask rejects them.
        pad_l = ((0, 0), (0, lpad - lmax))
        pad_c = ((0, 0), (0, 0), (0, lpad - lmax))
        lwn_hi = jnp.pad(lwn_hi, pad_l, constant_values=1e9)
        lwn_lo = jnp.pad(lwn_lo, pad_l)
        c1 = jnp.pad(c1, pad_c)
        y2 = jnp.pad(y2, pad_c, constant_values=1.0)
        inv_ad = jnp.pad(inv_ad, pad_c)
        if multispec:
            spec_onehot = jnp.pad(
                spec_onehot, ((0, 0), (0, 0), (0, lpad - lmax)),
            )
    nlchunk = lpad // lchunk

    if interpret:
        approx_recip = False

    kernel = functools.partial(
        _wing_kernel,
        margin=float(margin),
        cutoff=float(cutoff),
        approx_recip=approx_recip,
        multispec=multispec,
    )
    # Mosaic block shapes: the last two dims must tile (8, 128) or
    # equal the array's -- give every operand a singleton sublane dim
    # so (1, width) blocks are exact:
    wn_hi = wn_hi.reshape(ntiles, 1, tile)
    wn_lo = wn_lo.reshape(ntiles, 1, tile)
    lwn_hi = lwn_hi.reshape(ntiles, 1, lpad)
    lwn_lo = lwn_lo.reshape(ntiles, 1, lpad)
    c1 = c1.reshape(ncell, ntiles, 1, lpad)
    y2 = y2.reshape(ncell, ntiles, 1, lpad)
    inv_ad = inv_ad.reshape(ncell, ntiles, 1, lpad)

    grid = (ncell, ntiles, nlchunk)
    line_spec = pl.BlockSpec(
        (1, 1, lchunk), lambda b, i, j: (i, 0, j),
        memory_space=pltpu.VMEM,
    )
    cell_spec = pl.BlockSpec(
        (1, 1, 1, lchunk), lambda b, i, j: (b, i, 0, j),
        memory_space=pltpu.VMEM,
    )
    wn_spec = pl.BlockSpec(
        (1, 1, tile), lambda b, i, j: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [wn_spec, wn_spec, line_spec, line_spec,
                cell_spec, cell_spec, cell_spec]
    operands = [wn_hi, wn_lo, lwn_hi, lwn_lo, c1, y2, inv_ad]
    if multispec:
        in_specs.append(pl.BlockSpec(
            (1, nsp, lchunk), lambda b, i, j: (i, 0, j),
            memory_space=pltpu.VMEM,
        ))
        operands.append(spec_onehot.astype(dtype))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, nsp, tile), lambda b, i, j: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (ncell, ntiles, nsp, tile), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(22 + 2 * nsp) * ncell * ntiles * lpad * tile,
            bytes_accessed=(
                4 * (2 * ntiles * tile + (2 + nsp) * ntiles * lpad
                     + 3 * ncell * ntiles * lpad
                     + nsp * ncell * ntiles * tile)
            ),
            transcendentals=0,
        ),
    )(*operands)
    if multispec:
        # [ncell, ntiles, nsp, tile] -> [ncell, nsp, ntiles, tile]:
        return jnp.moveaxis(out, 2, 1)
    return out.reshape(ncell, ntiles, tile)


def _wing_grouped_kernel(wnh_ref, wnl_ref, lwh_ref, lwl_ref, c1_ref,
                         y2_ref, iad_ref, *rest, margin, cutoff,
                         approx_recip, group, tile_pts, multispec):
    """One (cell, tile-group, line-chunk) grid step of the grouped
    wing pass.

    Statically unrolled loop over the group's sub-tiles: each
    iteration works on a [tile_pts, lchunk] pair block whose line
    factors are single [1, lchunk] rows (free lane-row broadcasts
    along sublanes).  An earlier [group*tile_pts, lchunk] whole-block
    formulation needed every factor replicated across sublanes
    (broadcast+reshape), which cost as much as the masked pairs it
    saved -- measured 9.3 vs 22 Gpair/s on v5e."""
    if multispec:
        oh_ref, out_ref = rest
    else:
        (out_ref,) = rest
    j = pl.program_id(2)

    for g in range(group):
        wh = wnh_ref[0, g]                             # [tile_pts, 1]
        wl = wnl_ref[0, g]
        lh = lwh_ref[0, g, :][None, :]                 # [1, lchunk]
        ll = lwl_ref[0, g, :][None, :]
        c1 = c1_ref[0, 0, g, :][None, :]
        y2 = y2_ref[0, 0, g, :][None, :]
        iad = iad_ref[0, 0, g, :][None, :]

        dwn = (wh - lh) + (wl - ll)                    # [tile_pts, lc]
        x2 = (dwn * iad) ** 2
        d = x2 + y2
        if approx_recip:
            r = pl.reciprocal(d, approx=True)
            u = r * (2.0 - d * r)      # one Newton step: ~1e-7 rel
        else:
            u = 1.0 / d
        a = x2 * u
        s = _series(u, a)
        adwn = jnp.abs(dwn)
        mask = (adwn > margin) & (adwn <= cutoff)
        contrib = jnp.where(mask, c1 * u * s, 0.0)

        if multispec:
            oh = oh_ref[0]             # [nsp*group, lchunk], spec-major
            nsp = oh.shape[0] // group
            for si in range(nsp):
                part = jnp.sum(
                    contrib * oh[si * group + g, :][None, :], axis=1,
                )

                @pl.when(j == 0)
                def _(si=si, part=part):
                    out_ref[0, 0, si, g, :] = part

                @pl.when(j > 0)
                def _(si=si, part=part):
                    out_ref[0, 0, si, g, :] = (
                        out_ref[0, 0, si, g, :] + part
                    )
        else:
            part = jnp.sum(contrib, axis=1)            # [tile_pts]

            @pl.when(j == 0)
            def _(part=part):
                out_ref[0, 0, 0, g, :] = part

            @pl.when(j > 0)
            def _(part=part):
                out_ref[0, 0, 0, g, :] = out_ref[0, 0, 0, g, :] + part


@functools.partial(
    jax.jit,
    static_argnames=('margin', 'cutoff', 'group', 'lchunk',
                     'interpret', 'approx_recip'),
)
def wing_sigma_grouped(wn_hi, wn_lo, lwn_hi, lwn_lo, c1, y2, inv_ad,
                       spec_onehot=None, *, margin, cutoff, group=8,
                       lchunk=4096, interpret=False, approx_recip=True):
    """Grouped wing-pass cross section: fine sub-tiles on SUBLANES.

    The lane-tiled wing kernel (wing_sigma) pays for its 128-point
    tiles: every point processes the whole tile's candidate window
    (tile span + 2*cutoff), so on coarse grids ~3/4 of the pairs are
    outside the physical cutoff and masked to zero.  This variant uses
    the core pass's layout instead -- sub-tiles of `tile_pts` points
    on sublanes, each with its OWN tight window (sub-tile span +
    2*cutoff) broadcast across its points -- cutting the masked
    fraction to ~2*cutoff / (tile_pts*dwn + 2*cutoff).

    Parameters
    ----------
    wn_hi, wn_lo: [ntiles, tile_pts] -- fine output tiles (hi/lo).
    lwn_hi, lwn_lo: [ntiles, lmax] -- per-sub-tile line windows.
    c1, y2, inv_ad: [ncell, ntiles, lmax] -- per-cell line factors.
    spec_onehot: [ntiles, nspec, lmax] or None.
    margin, cutoff: static core/wing split and wing cutoff (cm-1).
    group: sub-tiles per grid step (group * tile_pts = 128 keeps the
        pair block VPU-shaped).
    lchunk: lines per inner grid step (VMEM blocking).

    Returns
    -------
    sigma [ncell, ntiles, tile_pts] (or [ncell, nspec, ntiles,
        tile_pts] with spec_onehot).
    """
    ncell, ntiles, lmax = c1.shape
    tile_pts = wn_hi.shape[1]
    dtype = c1.dtype
    multispec = spec_onehot is not None
    nsp = spec_onehot.shape[1] if multispec else 1

    lchunk = min(lchunk, _round_up(lmax, 128))
    lpad = _round_up(lmax, lchunk)
    ntpad = _round_up(ntiles, group)
    pad_t = ntpad - ntiles
    pad_l = lpad - lmax
    if pad_l:
        # Padded lines sit 1e9 cm-1 away: the cutoff mask rejects them.
        lwn_hi = jnp.pad(
            lwn_hi, ((0, 0), (0, pad_l)), constant_values=1e9,
        )
        lwn_lo = jnp.pad(lwn_lo, ((0, 0), (0, pad_l)))
        pad_c = ((0, 0), (0, 0), (0, pad_l))
        c1 = jnp.pad(c1, pad_c)
        y2 = jnp.pad(y2, pad_c, constant_values=1.0)
        inv_ad = jnp.pad(inv_ad, pad_c)
        if multispec:
            spec_onehot = jnp.pad(
                spec_onehot, ((0, 0), (0, 0), (0, pad_l)),
            )
    if pad_t:
        # Padded tile rows replicate the last tile; the caller's
        # [:ntiles] slice drops their outputs.
        lwn_hi = jnp.pad(lwn_hi, ((0, pad_t), (0, 0)), mode='edge')
        lwn_lo = jnp.pad(lwn_lo, ((0, pad_t), (0, 0)), mode='edge')
        wn_hi = jnp.pad(wn_hi, ((0, pad_t), (0, 0)), mode='edge')
        wn_lo = jnp.pad(wn_lo, ((0, pad_t), (0, 0)), mode='edge')
        pad_c = ((0, 0), (0, pad_t), (0, 0))
        c1 = jnp.pad(c1, pad_c)
        y2 = jnp.pad(y2, pad_c, constant_values=1.0)
        inv_ad = jnp.pad(inv_ad, pad_c)
        if multispec:
            spec_onehot = jnp.pad(
                spec_onehot, ((0, pad_t), (0, 0), (0, 0)),
            )
    ngroup = ntpad // group
    npts = group * tile_pts
    nlchunk = lpad // lchunk

    if interpret:
        approx_recip = False

    # Output points ship as [tile_pts, 1] COLUMNS per sub-tile (the
    # kernel's pair blocks put points on sublanes; a lane slice at
    # tile_pts offsets would not lower):
    wn_hi = wn_hi.reshape(ngroup, group, tile_pts, 1)
    wn_lo = wn_lo.reshape(ngroup, group, tile_pts, 1)
    lwn_hi = lwn_hi.reshape(ngroup, group, lpad)
    lwn_lo = lwn_lo.reshape(ngroup, group, lpad)
    c1 = c1.reshape(ncell, ngroup, group, lpad)
    y2 = y2.reshape(ncell, ngroup, group, lpad)
    inv_ad = inv_ad.reshape(ncell, ngroup, group, lpad)

    kernel = functools.partial(
        _wing_grouped_kernel,
        margin=float(margin), cutoff=float(cutoff),
        approx_recip=approx_recip, group=group, tile_pts=tile_pts,
        multispec=multispec,
    )
    wn_spec = pl.BlockSpec(
        (1, group, tile_pts, 1), lambda b, g, j: (g, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    line_spec = pl.BlockSpec(
        (1, group, lchunk), lambda b, g, j: (g, 0, j),
        memory_space=pltpu.VMEM,
    )
    cell_spec = pl.BlockSpec(
        (1, 1, group, lchunk), lambda b, g, j: (b, g, 0, j),
        memory_space=pltpu.VMEM,
    )
    in_specs = [wn_spec, wn_spec, line_spec, line_spec,
                cell_spec, cell_spec, cell_spec]
    operands = [wn_hi, wn_lo, lwn_hi, lwn_lo, c1, y2, inv_ad]
    if multispec:
        oh = jnp.swapaxes(
            spec_onehot.astype(dtype).reshape(
                ngroup, group, nsp, lpad,
            ), 1, 2,
        ).reshape(ngroup, nsp * group, lpad)
        in_specs.append(pl.BlockSpec(
            (1, group * nsp, lchunk), lambda b, g, j: (g, 0, j),
            memory_space=pltpu.VMEM,
        ))
        operands.append(oh)
    out = pl.pallas_call(
        kernel,
        grid=(ncell, ngroup, nlchunk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, nsp, group, tile_pts),
            lambda b, g, j: (b, g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (ncell, ngroup, nsp, group, tile_pts), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(22 + 2 * nsp) * ncell * ngroup * npts * lpad,
            bytes_accessed=4 * (
                2 * ngroup * npts + (2 + nsp) * ngroup * group * lpad
                + 3 * ncell * ngroup * group * lpad
                + nsp * ncell * ngroup * npts
            ),
            transcendentals=0,
        ),
    )(*operands)
    if multispec:
        out = jnp.moveaxis(out, 2, 1).reshape(
            ncell, nsp, ntpad, tile_pts,
        )
        return out[:, :, :ntiles]
    return out.reshape(ncell, ntpad, tile_pts)[:, :ntiles]


def _core_kernel(wnh_ref, wnl_ref, lwh_ref, lwl_ref, scale_ref, y_ref,
                 iad_ref, *rest, margin, group, tile_core, multispec):
    """One (cell, tile-group) grid step of the core pass: full
    Faddeeva over a [group*tile_core, lpad] pair block."""
    if multispec:
        oh_ref, out_ref = rest
    else:
        (out_ref,) = rest
    npts = group * tile_core

    def rep(rows):                     # [group, lpad] -> [npts, lpad]
        lpad = rows.shape[-1]
        return jnp.broadcast_to(
            rows[:, None, :], (group, tile_core, lpad),
        ).reshape(npts, lpad)

    wh = wnh_ref[0, 0, :][:, None]     # [npts, 1]
    wl = wnl_ref[0, 0, :][:, None]
    lh = rep(lwh_ref[0])               # [npts, lpad]
    ll = rep(lwl_ref[0])
    scale = rep(scale_ref[0, 0])
    yy = rep(y_ref[0, 0])
    iad = rep(iad_ref[0, 0])

    dwn = (wh - lh) + (wl - ll)
    x = dwn * iad
    voigt = wofz_real(x, yy)
    contrib = jnp.where(jnp.abs(dwn) <= margin, voigt * scale, 0.0)
    if multispec:
        # Per-species masked lane-reduces into a [nsp, npts] output
        # block (flattened/interleaved formulations need sublane-to-
        # lane reshapes or sub-128 lane slices, neither of which
        # Mosaic compiles -- round-4 finding; the interpreter hid it).
        oh = oh_ref[0]                 # [nsp*group, lpad], species-major
        nsp = oh.shape[0] // group
        oh3 = oh.reshape(nsp, group, oh.shape[-1])
        for si in range(nsp):
            out_ref[0, 0, si, :] = jnp.sum(
                contrib * rep(oh3[si]), axis=1,
            )
    else:
        out_ref[0, 0, 0, :] = jnp.sum(contrib, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=('margin', 'group', 'interpret'),
)
def core_sigma(wn_hi, wn_lo, lwn_hi, lwn_lo, scale, y, inv_ad,
               spec_onehot=None, *, margin, group=16, interpret=False):
    """Batched core-pass cross section (full Faddeeva), summed over
    lines.

    The core pass uses fine output tiles (tile_core = 8 points) so its
    candidate line windows stay tight; stacking `group` consecutive
    fine tiles into one [group*tile_core, lines] pair block restores
    VPU-shaped work (the XLA path dispatches 8-row ops).

    Parameters
    ----------
    wn_hi, wn_lo: [ntiles, tile_core] -- fine output tiles (hi/lo).
    lwn_hi, lwn_lo: [ntiles, lmax] -- per-tile line windows.
    scale, y, inv_ad: [ncell, ntiles, lmax] -- per-cell line factors
        (scale = exp(logk - logkmax) * inv_ad / sqrt(pi)).
    spec_onehot: [ntiles, nspec, lmax] static per-line species
        one-hot, or None for single-species engines.
    margin: static core/wing split distance (cm-1).

    Returns
    -------
    sigma [ncell, ntiles, tile_core] (or with spec_onehot:
        [ncell, nspec, ntiles, tile_core]).
    """
    ncell, ntiles, lmax = scale.shape
    tile_core = wn_hi.shape[1]
    dtype = scale.dtype
    multispec = spec_onehot is not None
    nsp = spec_onehot.shape[1] if multispec else 1

    lpad = _round_up(lmax, 128)
    ntpad = _round_up(ntiles, group)
    pad_t = ntpad - ntiles
    pad_l = lpad - lmax
    if pad_l:
        # Padded lines sit far away: the margin mask rejects them.
        lwn_hi = jnp.pad(
            lwn_hi, ((0, 0), (0, pad_l)), constant_values=1e9,
        )
        lwn_lo = jnp.pad(lwn_lo, ((0, 0), (0, pad_l)))
        pad_c = ((0, 0), (0, 0), (0, pad_l))
        scale = jnp.pad(scale, pad_c)
        y = jnp.pad(y, pad_c, constant_values=1.0)
        inv_ad = jnp.pad(inv_ad, pad_c)
        if multispec:
            spec_onehot = jnp.pad(
                spec_onehot, ((0, 0), (0, 0), (0, pad_l)),
            )
    if pad_t:
        # Padded tile rows replicate the last tile; the caller's
        # [:ntiles] slice drops their outputs.
        lwn_hi = jnp.pad(lwn_hi, ((0, pad_t), (0, 0)), mode='edge')
        lwn_lo = jnp.pad(lwn_lo, ((0, pad_t), (0, 0)), mode='edge')
        wn_hi = jnp.pad(wn_hi, ((0, pad_t), (0, 0)), mode='edge')
        wn_lo = jnp.pad(wn_lo, ((0, pad_t), (0, 0)), mode='edge')
        pad_c = ((0, 0), (0, pad_t), (0, 0))
        scale = jnp.pad(scale, pad_c)
        y = jnp.pad(y, pad_c, constant_values=1.0)
        inv_ad = jnp.pad(inv_ad, pad_c)
        if multispec:
            spec_onehot = jnp.pad(
                spec_onehot, ((0, pad_t), (0, 0), (0, 0)),
            )
    ngroup = ntpad // group
    npts = group * tile_core

    wn_hi = wn_hi.reshape(ngroup, 1, npts)
    wn_lo = wn_lo.reshape(ngroup, 1, npts)
    lwn_hi = lwn_hi.reshape(ngroup, group, lpad)
    lwn_lo = lwn_lo.reshape(ngroup, group, lpad)
    scale = scale.reshape(ncell, ngroup, group, lpad)
    y = y.reshape(ncell, ngroup, group, lpad)
    inv_ad = inv_ad.reshape(ncell, ngroup, group, lpad)

    kernel = functools.partial(
        _core_kernel,
        margin=float(margin), group=group, tile_core=tile_core,
        multispec=multispec,
    )
    wn_spec = pl.BlockSpec(
        (1, 1, npts), lambda b, g: (g, 0, 0), memory_space=pltpu.VMEM,
    )
    line_spec = pl.BlockSpec(
        (1, group, lpad), lambda b, g: (g, 0, 0),
        memory_space=pltpu.VMEM,
    )
    cell_spec = pl.BlockSpec(
        (1, 1, group, lpad), lambda b, g: (b, g, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [wn_spec, wn_spec, line_spec, line_spec,
                cell_spec, cell_spec, cell_spec]
    operands = [wn_hi, wn_lo, lwn_hi, lwn_lo, scale, y, inv_ad]
    if multispec:
        # Species-major one-hot rows [ngroup, nsp*group, lpad] (the
        # kernel contracts all of them in one dot and selects the
        # per-row group block):
        oh = jnp.swapaxes(
            spec_onehot.astype(dtype).reshape(
                ngroup, group, nsp, lpad,
            ), 1, 2,
        ).reshape(ngroup, nsp * group, lpad)
        in_specs.append(pl.BlockSpec(
            (1, group * nsp, lpad), lambda b, g: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        operands.append(oh)
    out = pl.pallas_call(
        kernel,
        grid=(ncell, ngroup),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, nsp, npts), lambda b, g: (b, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (ncell, ngroup, nsp, npts), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(250 + 2 * nsp) * ncell * ngroup * npts * lpad,
            bytes_accessed=4 * (
                2 * ngroup * npts + (2 + nsp) * ngroup * group * lpad
                + 3 * ncell * ngroup * group * lpad
                + nsp * ncell * ngroup * npts
            ),
            transcendentals=2 * ncell * ngroup * npts * lpad,
        ),
    )(*operands)
    if multispec:
        # [ncell, ngroup, nsp, group*tile_core] ->
        # [ncell, nsp, ntiles, tile_core]:
        out = out.reshape(ncell, ngroup, nsp, group, tile_core)
        out = jnp.moveaxis(out, 2, 1).reshape(
            ncell, nsp, ntpad, tile_core,
        )
        return out[:, :, :ntiles]
    return out.reshape(ncell, ntpad, tile_core)[:, :ntiles]
