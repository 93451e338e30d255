"""Kernel-tuning knobs, read from the environment ONCE at import.

These gate STATIC kernel configuration -- pallas grid shapes and the
fused-vs-XLA RT dispatch -- that is baked into jit caches at trace
time.  Reading os.environ lazily inside jitted code made post-compile
changes silently no-ops for already-compiled shapes (the env is not
part of the jit cache key); import-time reads make the contract
explicit: set the variable BEFORE importing pyratbay_tpu, or call
``set_tuning`` before building any forward/jitted program.

Knobs
-----
PBT_RT_PALLAS  ('1'): use the fused pallas RT kernels on TPU
    (0 = XLA fallback everywhere; kernels are also skipped off-TPU).
PBT_ENS_LANES  (256): wave-tile lane width of the ensemble RT kernel.
PBT_ENS_CB     (32):  chains per ensemble-kernel grid step.
"""
import os

RT_PALLAS = os.environ.get('PBT_RT_PALLAS', '1') != '0'
ENS_LANES = int(os.environ.get('PBT_ENS_LANES', 256))
ENS_CHAIN_BLOCK = int(os.environ.get('PBT_ENS_CB', 32))
# Max nspec*ntemp for the in-kernel line-sample contraction (0 =
# disabled, the default: a measured v5e ablation on the flagship has
# the ensemble einsum + layout copy at 111k spectra/s vs 97k for the
# in-kernel VPU contraction -- the MXU einsum beats the copy saving;
# the fused path OOMs scoped VMEM at chain_block 32 and pays ~800
# extra grid steps at chain_block 8.  Kept selectable for small-wave
# configs and future Mosaic improvements; bench.py re-measures the
# ablation every run):
ENS_INKERNEL_LS = int(os.environ.get('PBT_ENS_LS_K', 0))
# Emit line-sample einsum contributions in their NATURAL batched-dot
# layout [l, B, w] and let the transit ensemble kernel consume them
# with layer-major blocks (no XLA layout copy), instead of the
# [B, l, w] layout that costs a full-size copy:
ENS_LS_LBW = os.environ.get('PBT_ENS_LS_LBW', '1') != '0'
# Force the fused ensemble path through the pallas INTERPRETER on any
# backend (tests: lets the CPU suite cover the batched builder's
# kernel-operand assembly -- lbw parts, rank-1 pairs, in-kernel
# CIA/LS -- not just the kernels in isolation):
ENS_FORCE_INTERPRET = os.environ.get('PBT_ENS_INTERPRET', '0') == '1'


def set_tuning(rt_pallas=None, ens_lanes=None, ens_chain_block=None,
               ens_inkernel_ls=None, ens_ls_lbw=None,
               ens_force_interpret=None):
    """Override the knobs programmatically (before building forwards).

    Already-jitted programs are NOT retraced: rebuild any forward or
    model evaluator after changing these.
    """
    global RT_PALLAS, ENS_LANES, ENS_CHAIN_BLOCK, ENS_INKERNEL_LS, \
        ENS_LS_LBW, ENS_FORCE_INTERPRET
    if rt_pallas is not None:
        RT_PALLAS = bool(rt_pallas)
    if ens_lanes is not None:
        ENS_LANES = int(ens_lanes)
    if ens_chain_block is not None:
        ENS_CHAIN_BLOCK = int(ens_chain_block)
    if ens_inkernel_ls is not None:
        ENS_INKERNEL_LS = int(ens_inkernel_ls)
    if ens_ls_lbw is not None:
        ENS_LS_LBW = bool(ens_ls_lbw)
    if ens_force_interpret is not None:
        ENS_FORCE_INTERPRET = bool(ens_force_interpret)
