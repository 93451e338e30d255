"""Natively-batched ensemble forward: the retrieval/benchmark hot path.

`jax.vmap(build_forward(...))` is correct but leaves throughput on the
table: vmapping the per-chain table contractions turns them into
batched dots whose XLA layouts are batch-minor, forcing full-size
layout copies of every [nlayers, nwave] opacity contribution before
the (row-major) fused RT kernel -- round-4 profiling measured three
335 MB copies per 512-chain batch, ~25% of the forward's wall time.

This builder assembles the ensemble explicitly instead:

* the parameter mapping + atmospheric state (small arrays) reuse the
  per-chain `forward.state` under vmap;
* the line-sample temperature interpolation is one flat einsum whose
  output keeps the batched dot's NATURAL layer-major [l, B, w] layout
  -- the kernels consume it directly, so the layout copy the [B, l, w]
  form pays never exists (tuning.ENS_LS_LBW; an in-kernel contraction
  variant exists too but measured slower, tuning.ENS_INKERNEL_LS);
* CIA contracts in-kernel against its tiny chain-invariant table;
* rank-1 sources (Rayleigh, power-law hazes, gray clouds) ship as
  per-chain (layer column, wave row) operand pairs composed in VMEM
  -- no dense [B, l, w] buffers; genuinely 2-D sources (active
  alkali, H-) vmap as elementwise fusions (layout-flexible), and
  alkali lines whose cutoff windows miss the grid are pruned
  statically;
* transit RT runs through the batched fused pallas kernel
  (spectrum/ensemble_pallas.py); plane-parallel emission/eclipse
  through the fused emission kernel (spectrum/emission_pallas.py,
  in-kernel Planck + cumtrapz-matmul depth); band integration is one
  [B, W] x [W, nbands] matmul.

Falls back to plain vmap for configurations it does not cover
(two-stream fluxes, live-LBL opacities, high-res channels).
Reference workload: chain-parallel MCMC over pyrat.eval
(pyratbay/pyrat/pyrat_obj.py:225-385, 452-464).
"""
import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as pc
from ..atmosphere import geometry, vmr as vmr_models
from ..ops.planck import blackbody_wn
from ..spectrum import rt
from .forward import build_forward

__all__ = ['build_forward_batched', 'build_log_posterior_batched']


_BATCHED_RT = (
    pc.TRANSMISSION_RT + ['emission', 'eclipse', 'f_lambda']
)


def _supported(model, obs):
    # Transit + plane-parallel emission/eclipse run the ensemble hot
    # path (incl. the high-res channel: batched convolution + fixed
    # or RV-shifted resampling); two-stream fluxes (layer
    # recurrences) stay on vmap:
    if model.rt_path not in _BATCHED_RT:
        return False
    for mtype, _, _ in model.opacity_models:
        if mtype not in ('line_sample', 'cia', 'alkali', 'rayleigh',
                         'cloud', 'h_ion'):
            return False
    return True


def _two_hot(tlo, w_hi, ntemp):
    """[B, l] lerp indices/weights -> [B, ntemp, l] two-hot weights."""
    t_idx = jnp.arange(ntemp)[None, :, None]
    return (
        (t_idx == tlo[:, None, :]) * (1.0 - w_hi)[:, None, :]
        + (t_idx == tlo[:, None, :] + 1) * w_hi[:, None, :]
    )


def build_forward_batched(model, obs=None, ret=None):
    """Build forward_b(params [B, npars]) -> dict of batched outputs
    (spectrum [B, nwave], bandflux [B, nbands], good [B], temperature).

    Semantics match jax.vmap(build_forward(model, obs, ret)) -- pinned
    by tests/test_batched.py -- with the hot path restructured for
    layout-copy-free ensemble execution.
    """
    forward = build_forward(model, obs, ret)
    if not _supported(model, obs):
        def fallback(params_b):
            return jax.vmap(forward)(params_b)
        fallback.is_fallback = True
        return fallback

    state = forward.state
    nlayers = model.nlayers
    nwave = model.nwave

    tmin_bound = max([model.tmin[k] for k in model.tmin], default=-np.inf)
    tmax_bound = min([model.tmax[k] for k in model.tmax], default=np.inf)
    if ret is not None:
        tmin_bound = max(tmin_bound, ret.tlow)
        tmax_bound = min(tmax_bound, ret.thigh)
    qcap = ret.qcap if ret is not None else None
    rscale = model._radius_scale
    rstar_n = model.rstar / rscale
    maxdepth = model.maxdepth

    rt_path = model.rt_path
    is_transit = rt_path in pc.TRANSMISSION_RT
    is_eclipse = rt_path in pc.ECLIPSE_RT
    wn = np.asarray(model.wn)
    quad_mu = np.asarray(model.quadrature_mu)
    quad_w = np.asarray(model.quadrature_weights)
    starflux = (
        None if model.starflux is None else np.asarray(model.starflux)
    )
    retrieve_tstar = ret is not None and ret.itstar is not None
    sed_temps = getattr(model, 'sed_temps', None)
    sed_fluxes = getattr(model, 'sed_fluxes', None)

    # High-res channel (forward.py:96-110 semantics, batched): the
    # instrumental convolution becomes ONE grouped lax.conv over the
    # ensemble; without a retrieved RV the resampling at wn_hires is a
    # fixed two-point lerp (precomputed gather indices), with RV it is
    # a per-chain jnp.interp on the Doppler-shifted grid:
    has_hires = (
        obs is not None and getattr(obs, 'wn_hires', None) is not None
    )
    if has_hires:
        from ..spectrum.hires import instrumental_kernel
        sampling_res = model.grid.resolution
        if sampling_res is None:
            dwn = np.ediff1d(wn)
            sampling_res = float(np.median(wn[:-1] / dwn))
        hires_kernel = np.asarray(instrumental_kernel(
            obs.inst_resolution, sampling_res,
        ))
        wn_hires = np.asarray(obs.wn_hires)
        retrieve_rv = ret is not None and ret.irv is not None
        if not retrieve_rv:
            # Fixed-grid lerp indices (same math as jnp.interp on an
            # increasing wn grid, incl. edge clamping):
            hires_ilo = np.clip(
                np.searchsorted(wn, wn_hires, side='right') - 1,
                0, nwave - 2,
            )
            hires_whi = np.clip(
                (wn_hires - wn[hires_ilo])
                / (wn[hires_ilo + 1] - wn[hires_ilo]), 0., 1.,
            )

    # Fused-RT dispatch is fixed at BUILD time (pyratbay_tpu.tuning is
    # read once here; rebuild the forward after set_tuning):
    from .. import tuning
    ens_interpret = tuning.ENS_FORCE_INTERPRET
    use_pallas = ens_interpret or (
        jax.default_backend() == 'tpu' and tuning.RT_PALLAS)
    ens_lanes = tuning.ENS_LANES
    ens_cb = tuning.ENS_CHAIN_BLOCK
    ls_k_max = tuning.ENS_INKERNEL_LS
    ls_lbw = tuning.ENS_LS_LBW

    def forward_b(params_b):
        params_b = jnp.asarray(params_b)
        st = jax.vmap(state)(params_b)
        temp = st['temp']                  # [B, l]
        dens = st['dens']                  # [B, l, nmol]
        radius = st['radius']              # [B, l]
        rtop = st['rtop']                  # [B]
        pars_list = st['pars_list']
        fpatchy = st['fpatchy']
        nb = params_b.shape[0]

        # Contributions stay UN-summed: the ensemble RT kernel adds
        # them in VMEM, which pins every producer's layout to the
        # kernel's row-major operand (no XLA layout copies, no
        # add-fusion buffer).  Elementwise sources share one
        # accumulator (they fuse into a single producer); the
        # line-sample dot keeps its own buffer.  The XLA fallback
        # sums everything.
        parts = []
        parts_lbw = []
        r1_col_list = []
        r1_row_list = []
        cloud_parts = []
        cia_ws = []
        cia_tabs = []
        ls_ws = []
        ls_tabs = []
        elem = None
        deck_itop = deck_rsurf = deck_tsurf = None
        have_deck = False

        for (mtype, m, imol), pars in zip(
                model.opacity_models, pars_list):
            if m.name == 'deck':
                surf = jax.vmap(m.surface)(radius, temp, pars)
                deck_itop, deck_rsurf, deck_tsurf = surf
                have_deck = True
                continue

            if mtype == 'line_sample':
                tlo, w_hi = jax.vmap(m._t_weights)(temp)
                w_t = _two_hot(tlo, w_hi, m.ntemp)      # [B, t, l]
                ratios = (
                    jax.vmap(m._jit_ratios)(pars)
                    if pars is not None and m.npars
                    else jnp.broadcast_to(
                        jnp.asarray(m.iso_ratios), (nb, m.nspec))
                )                                       # [B, s]
                d_w = (
                    jnp.swapaxes(dens[:, :, jnp.asarray(imol)], 1, 2)
                    * ratios[:, :, None]
                )                                       # [B, s, l]
                w_stl = w_t[:, None] * d_w[:, :, None]  # [B, s, t, l]
                n_k = m.nspec * m.ntemp
                if use_pallas and n_k <= ls_k_max:
                    # In-kernel contraction (ensemble_pallas):
                    # the [B, l, W] contribution buffer and its
                    # batch-minor layout copy never materialize --
                    # the kernel contracts per-chain weight columns
                    # against the chain-invariant [K, l, wave-tile]
                    # table slab:
                    ls_ws.append(
                        w_stl.reshape(nb, n_k, nlayers)[..., None],
                    )
                    ls_tabs.append(np.asarray(m.cs_table).reshape(
                        n_k, nlayers, nwave))
                    continue
                if use_pallas and ls_lbw:
                    # One flat einsum emitting the batched dot's
                    # NATURAL [l, B, w] layout: the kernel's
                    # layer-major blocks consume it directly, so the
                    # full-size layout copy the 'blw' form pays never
                    # happens:
                    parts_lbw.append(jnp.einsum(
                        'bstl,stlw->lbw', w_stl,
                        jnp.asarray(m.cs_table),
                    ))
                    continue
                # One flat einsum over the ensemble (a gather-lerp
                # formulation was measured 2x slower: TPU row gathers
                # dominate).  The batched-dot output takes one layout
                # copy in front of the RT kernel:
                contrib = jnp.einsum(
                    'bstl,stlw->blw', w_stl,
                    jnp.asarray(m.cs_table),
                )
            elif mtype == 'cia':
                # The CIA weights go INTO the ensemble RT kernel (the
                # table is tiny and chain-invariant: the kernel
                # contracts it per wave tile); on the XLA fallback the
                # same weights become an einsum:
                tcl = jnp.clip(temp, m.tmin, m.tmax)
                temps = jnp.asarray(m.temps)
                tlo = jnp.clip(
                    jnp.searchsorted(temps, tcl, side='right') - 1,
                    0, m.ntemp - 2,
                )
                w_hi = (tcl - temps[tlo]) / (temps[tlo + 1] - temps[tlo])
                w_t = _two_hot(tlo, w_hi, m.ntemp)      # [B, t, l]
                dens_am = dens[:, :, jnp.asarray(imol)] / pc.amagat
                dprod = jnp.prod(dens_am, axis=2)       # [B, l]
                cia_ws.append(
                    jnp.swapaxes(w_t * dprod[:, None, :], 1, 2),
                )                                       # [B, l, t]
                cia_tabs.append(np.asarray(m.tab_cs_amagat))
                continue
            elif mtype == 'alkali':
                if not getattr(m, 'active_lines', True):
                    # Every line's cutoff window is off this grid:
                    # the contribution is exactly zero.
                    continue
                contrib = jax.vmap(m.extinction)(temp, dens[:, :, imol])
            elif mtype == 'rayleigh':
                if use_pallas:
                    col, row = jax.vmap(m.ec_rank1)(dens[:, :, imol])
                    r1_col_list.append(col)
                    r1_row_list.append(jnp.broadcast_to(
                        row, (nb, nwave)))
                    continue
                contrib = jax.vmap(m.extinction)(dens[:, :, imol])
            elif mtype == 'cloud':
                if (use_pallas and not model.is_patchy
                        and hasattr(m, 'ec_rank1')):
                    # Rank-1 clouds/hazes go to the kernel as
                    # (layer column, wave row) pairs -- no dense
                    # buffer, no per-layer transcendentals:
                    col, row = jax.vmap(m.ec_rank1)(temp, pars)
                    r1_col_list.append(col)
                    r1_row_list.append(jnp.broadcast_to(
                        row, (nb, nwave)))
                    continue
                contrib = jax.vmap(m.extinction)(temp, pars)
            elif mtype == 'h_ion':
                contrib = jax.vmap(m.extinction)(
                    temp, dens[:, :, imol[0]], dens[:, :, imol[1]],
                )
            else:  # pragma: no cover -- _supported() gates this
                raise ValueError(f'Unsupported opacity type {mtype}')

            if mtype == 'cloud' and model.is_patchy:
                cloud_parts.append(contrib)
            elif mtype == 'line_sample':
                parts.append(contrib)
            else:
                elem = contrib if elem is None else elem + contrib
        if elem is not None:
            parts.append(elem)
        if cloud_parts and model.is_patchy:
            cloud_sum = cloud_parts[0]
            for extra_cloud in cloud_parts[1:]:
                cloud_sum = cloud_sum + extra_cloud
            cloud_parts = [cloud_sum]

        def run_emission_rt(fused_e, parts_e, parts_lbw_e,
                            cloud_parts_e, cia_ws_e,
                            cia_tabs_e, ls_ws_e, ls_tabs_e,
                            radius_e, temp_e, rtop_e,
                            ibottom_e, ditop, dtsurf, fpatchy_e, nb_e):
            """Plane-parallel emission over the ensemble: fused pallas
            kernel on TPU (in-kernel Planck + cumtrapz-matmul depth,
            spectrum/emission_pallas.py), per-chain vmap elsewhere."""
            if fused_e:
                from ..spectrum.emission_pallas import (
                    emission_flux_ensemble,
                )
                cia_w = cia_tab = None
                if cia_ws_e:
                    cia_w = jnp.concatenate(cia_ws_e, axis=2)
                    cia_tab = np.concatenate(cia_tabs_e, axis=0)
                ls_w = ls_tab = None
                if ls_ws_e:
                    ls_w = jnp.concatenate(ls_ws_e, axis=1)
                    ls_tab = np.concatenate(ls_tabs_e, axis=0)

                def run_one(ec_parts, ibot, dit, dts):
                    return emission_flux_ensemble(
                        ec_parts, radius_e, temp_e, wn, quad_mu,
                        quad_w, rtop_e, ibot, deck_itop=dit,
                        deck_tsurf=dts, cia_w=cia_w, cia_tab=cia_tab,
                        ls_w=ls_w, ls_tab=ls_tab,
                        ec_parts_lbw=parts_lbw_e,
                        r1_cols=r1_cols, r1_rows=r1_rows,
                        maxdepth=maxdepth, interpret=ens_interpret,
                        max_lanes=ens_lanes, chain_block=ens_cb,
                    )
            else:
                parts_e = parts_e + [
                    jnp.einsum('blt,tw->blw', cw, jnp.asarray(ct))
                    for cw, ct in zip(cia_ws_e, cia_tabs_e)
                ]
                wn_j = jnp.asarray(wn)
                mu_j = jnp.asarray(quad_mu)
                w_col = jnp.asarray(quad_w)[:, None]

                def espec_one(ec_parts, rad_i, temp_i, rtop_i,
                              ibot_i, surf):
                    dit, dts = surf
                    ec_i = ec_parts[0]
                    for part in ec_parts[1:]:
                        ec_i = ec_i + part
                    depth, ideep = rt.plane_parallel_depth(
                        ec_i, rad_i, maxdepth, rtop_i, ibot_i,
                    )
                    bbody = blackbody_wn(wn_j, temp_i[:, None])
                    if dts is not None:
                        bb_surf = blackbody_wn(wn_j, dts)
                        bbody = jnp.where(
                            (jnp.arange(nlayers) == dit)[:, None],
                            bb_surf[None, :], bbody,
                        )
                        ideep = jnp.clip(ideep, 0, dit)
                    inten = rt.plane_parallel_intensity(
                        depth, bbody, mu_j, ideep, rtop_i,
                    )
                    return jnp.sum(inten * w_col, axis=0)

                def run_one(ec_parts, ibot, dit, dts):
                    surf_args = (dit, dts)
                    surf_axes = (
                        (0, 0) if dit is not None else (None, None)
                    )
                    ib_ax = 0 if getattr(ibot, 'ndim', 0) else None
                    return jax.vmap(
                        espec_one,
                        in_axes=((0,) * len(ec_parts), 0, 0, 0,
                                 ib_ax, surf_axes),
                    )(tuple(ec_parts), radius_e, temp_e, rtop_e,
                      ibot, surf_args)

            spectrum_e = run_one(
                parts_e + cloud_parts_e, ibottom_e, ditop, dtsurf,
            )
            if model.is_patchy:
                cloudy = spectrum_e
                clear = run_one(
                    parts_e, jnp.full((nb_e,), nlayers), None, None,
                )
                fp = fpatchy_e if fpatchy_e is not None else 0.0
                spectrum_e = (
                    fp[:, None] * cloudy + (1 - fp[:, None]) * clear
                )
            return spectrum_e

        # ---- RT (batched):
        if have_deck:
            ibottom = deck_itop + 1
        else:
            ibottom = jnp.full((nb,), nlayers)

        r1_cols = r1_rows = None
        if r1_col_list:
            r1_cols = jnp.stack(r1_col_list, axis=1)[..., None]
            r1_rows = jnp.stack(r1_row_list, axis=1)[:, :, None, :]

        fused = use_pallas
        if not parts and not fused:
            parts = [jnp.zeros((nb, nlayers, nwave))]

        if not is_transit:
            spectrum = run_emission_rt(
                fused, parts, parts_lbw, cloud_parts, cia_ws,
                cia_tabs, ls_ws, ls_tabs, radius, temp, rtop, ibottom,
                deck_itop if have_deck else None,
                deck_tsurf if have_deck else None,
                fpatchy, nb,
            )
        elif fused:
            rr = radius / rscale
            path = jax.vmap(geometry.transit_path_matrix)(
                rr, rtop) * rscale
            rsurf_n = deck_rsurf / rscale if have_deck else None
            from ..spectrum.ensemble_pallas import (
                transit_spectrum_ensemble,
            )
            cia_w = cia_tab = None
            if cia_ws:
                cia_w = jnp.concatenate(cia_ws, axis=2)
                cia_tab = np.concatenate(cia_tabs, axis=0)
            ls_w = ls_tab = None
            if ls_ws:
                ls_w = jnp.concatenate(ls_ws, axis=1)
                ls_tab = np.concatenate(ls_tabs, axis=0)

            def run_ensemble(ec_parts, ibot, ditop, dsurf):
                return transit_spectrum_ensemble(
                    ec_parts, path, rr, rstar_n, rtop, ibot,
                    deck_itop=ditop, deck_rsurf=dsurf,
                    cia_w=cia_w, cia_tab=cia_tab,
                    ls_w=ls_w, ls_tab=ls_tab,
                    ec_parts_lbw=parts_lbw,
                    r1_cols=r1_cols, r1_rows=r1_rows,
                    maxdepth=maxdepth, interpret=ens_interpret,
                    max_lanes=ens_lanes, chain_block=ens_cb,
                )

            spectrum = run_ensemble(
                parts + cloud_parts, ibottom,
                deck_itop if have_deck else None,
                rsurf_n if have_deck else None,
            )
            if model.is_patchy:
                cloudy = spectrum
                clear = run_ensemble(
                    parts, jnp.full((nb,), nlayers), None, None,
                )
                fp = fpatchy if fpatchy is not None else 0.0
                spectrum = (
                    fp[:, None] * cloudy + (1 - fp[:, None]) * clear
                )
        else:
            # XLA fallback (CPU / PBT_RT_PALLAS=0): CIA back to an
            # ensemble einsum, then the unfused per-chain RT:
            rr = radius / rscale
            path = jax.vmap(geometry.transit_path_matrix)(
                rr, rtop) * rscale
            rsurf_n = deck_rsurf / rscale if have_deck else None
            for cw, ct in zip(cia_ws, cia_tabs):
                parts.append(jnp.einsum('blt,tw->blw', cw,
                                        jnp.asarray(ct)))

            def spec_one(ec_parts, path_i, rr_i, rtop_i, ibot_i, surf):
                ditop, dsurf = surf
                ec_i = ec_parts[0]
                for part in ec_parts[1:]:
                    ec_i = ec_i + part
                depth, ideep = rt.transit_depth(
                    ec_i, path_i, maxdepth, rtop_i, ibot_i,
                )
                return rt.transmission_spectrum(
                    depth, ideep, rr_i, rstar_n, rtop_i,
                    deck_rsurf=dsurf, deck_itop=ditop,
                )

            all_parts = tuple(parts + cloud_parts)
            surf_args = (
                (deck_itop, rsurf_n) if have_deck else (None, None)
            )
            surf_axes = (0, 0) if have_deck else (None, None)
            spectrum = jax.vmap(
                spec_one,
                in_axes=((0,) * len(all_parts), 0, 0, 0, 0, surf_axes),
            )(all_parts, path, rr, rtop, ibottom, surf_args)

            if model.is_patchy:
                cloudy = spectrum
                clear = jax.vmap(
                    spec_one,
                    in_axes=((0,) * len(parts), 0, 0, 0, None,
                             (None, None)),
                )(tuple(parts), path, rr, rtop, nlayers, (None, None))
                fp = fpatchy if fpatchy is not None else 0.0
                spectrum = (
                    fp[:, None] * cloudy + (1 - fp[:, None]) * clear
                )

        # ---- Emission post-scalings (forward.py:250-274 semantics):
        if not is_transit:
            fd = st['f_dilution']
            if fd is not None:
                fd = jnp.asarray(fd)
                spectrum = spectrum * (
                    fd[:, None] if fd.ndim == 1 else fd
                )
            rp = jnp.asarray(st['rplanet'])
            rp_col = rp[:, None] if rp.ndim == 1 else rp
            if is_eclipse:
                if retrieve_tstar and sed_temps is not None:
                    from ..model import _interp_sed
                    sflux = jax.vmap(
                        lambda ts: _interp_sed(
                            sed_fluxes, sed_temps, ts),
                    )(st['tstar'])
                elif retrieve_tstar:
                    sflux = jax.vmap(
                        lambda ts: blackbody_wn(
                            jnp.asarray(wn), ts) * np.pi,
                    )(st['tstar'])
                else:
                    sflux = jnp.asarray(starflux)[None, :]
                spectrum = (
                    spectrum / sflux * (rp_col / model.rstar)**2
                )
            if rt_path == 'f_lambda':
                if model.distance is None:
                    raise ValueError(
                        'Undefined distance to the system, required '
                        'for f_lambda flux'
                    )
                spectrum = (
                    10.0 * spectrum
                    * (rp_col / model.distance
                       * jnp.asarray(wn)[None, :] * pc.um)**2
                )

        # ---- Rejection + band integration:
        good = (
            (jnp.min(temp, axis=1) >= tmin_bound)
            & (jnp.max(temp, axis=1) <= tmax_bound)
            & (jnp.min(temp, axis=1) > 0)
        )
        if qcap is not None and model.ibulk is not None:
            good = good & ~jax.vmap(
                lambda v: vmr_models.qcapcheck(
                    v, qcap, np.asarray(model.ibulk)),
            )(st['vmr'])
        spectrum = jnp.where(good[:, None], spectrum, 0.0)

        out = {
            'spectrum': spectrum,
            'temperature': temp,
            'good': good,
        }
        if obs is not None and obs.nbands:
            bandflux = jax.vmap(obs.band_integrate)(spectrum)
            out['bandflux'] = jnp.where(
                good[:, None], bandflux, jnp.inf,
            )
        if has_hires:
            krev = jnp.asarray(
                np.ascontiguousarray(hires_kernel[::-1]),
            ).astype(spectrum.dtype)
            kw = hires_kernel.shape[0]
            pad_lo = kw - 1 - (kw - 1) // 2
            conv = jax.lax.conv_general_dilated(
                spectrum[:, None, :], krev[None, None, :],
                window_strides=(1,),
                padding=[(pad_lo, (kw - 1) // 2)],
                dimension_numbers=('NCH', 'OIH', 'NCH'),
            )[:, 0, :]
            if retrieve_rv:
                vel = params_b[:, ret.irv] * pc.km
                factor = jnp.sqrt(
                    (1.0 - vel / pc.c) / (1.0 + vel / pc.c))
                wn_j = jnp.asarray(wn)
                wh = jnp.asarray(wn_hires)
                flux_hires = jax.vmap(
                    lambda f, c_row: jnp.interp(wh, wn_j * f, c_row),
                )(factor, conv)
            else:
                flux_hires = (
                    conv[:, hires_ilo] * (1.0 - hires_whi)
                    + conv[:, hires_ilo + 1] * hires_whi
                )
            out['bandflux_hires'] = jnp.where(
                good[:, None], flux_hires, jnp.inf,
            )
        return out

    forward_b.is_fallback = False
    return forward_b


def build_log_posterior_batched(model, obs, ret):
    """Batched params [B, n] -> log-posterior [B] on the ensemble hot
    path (same math as vmap(build_log_posterior(...)))."""
    from .forward import build_log_posterior

    forward_b = build_forward_batched(model, obs, ret)
    has_lowres = obs.data is not None and obs.nbands > 0
    has_hires_data = getattr(obs, 'data_hires', None) is not None
    if forward_b.is_fallback or not (has_lowres or has_hires_data):
        # The fallback also owns the no-data case: build_log_posterior
        # raises the descriptive data/obsfile ValueError instead of an
        # opaque asarray(None) failure here.
        log_post = build_log_posterior(model, obs, ret)
        return jax.vmap(log_post)

    if has_lowres:
        data = jnp.asarray(obs.data)
        uncert = jnp.asarray(obs.uncert)
    if has_hires_data:
        data_hires = jnp.asarray(obs.data_hires)
        uncert_hires = jnp.asarray(obs.uncert_hires)
    pmin = jnp.asarray(ret.pmin)
    pmax = jnp.asarray(ret.pmax)
    prior = jnp.asarray(ret.prior)
    priorlow = jnp.asarray(ret.priorlow)
    priorup = jnp.asarray(ret.priorup)
    has_prior = jnp.asarray(ret.priorlow > 0)

    def log_post_b(params_b):
        params_b = jnp.asarray(params_b)
        result = forward_b(params_b)
        log_like = 0.0
        if has_lowres:
            bandflux = result['bandflux']
            data_adj = data[None, :]
            uncert_adj = uncert[None, :]
            log_norm = 0.0
            if ret.ioffset:
                data_adj = jax.vmap(obs.offset_data)(
                    params_b[:, jnp.asarray(ret.ioffset)],
                )
            if ret.ierror:
                uncert_adj = jax.vmap(obs.scale_uncert)(
                    params_b[:, jnp.asarray(ret.ierror)],
                )
                log_norm = -jnp.sum(
                    jnp.log(uncert_adj / uncert[None, :]), axis=1,
                )
            resid = (bandflux - data_adj) / uncert_adj
            log_like = -0.5 * jnp.sum(resid**2, axis=1) + log_norm
        if has_hires_data:
            resid_h = (
                result['bandflux_hires'] - data_hires[None, :]
            ) / uncert_hires[None, :]
            log_like = log_like - 0.5 * jnp.sum(resid_h**2, axis=1)
        in_bounds = jnp.all(
            (params_b >= pmin[None]) & (params_b <= pmax[None]), axis=1,
        )
        sigma = jnp.where(params_b > prior[None], priorup[None],
                          priorlow[None])
        log_prior = -0.5 * jnp.sum(jnp.where(
            has_prior[None],
            ((params_b - prior[None]) / jnp.where(
                sigma > 0, sigma, 1.0))**2,
            0.0,
        ), axis=1)
        logp = log_like + log_prior
        bad = ~in_bounds | ~result['good'] | ~jnp.isfinite(log_like)
        return jnp.where(bad, -jnp.inf, logp)

    return log_post_b
