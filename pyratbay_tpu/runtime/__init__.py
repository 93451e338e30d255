"""Native host runtime (C++): multithreaded line-list parsing and TLI
range extraction, loaded through ctypes.

Auto-builds `libpbt_runtime.so` with the local toolchain on first use;
callers fall back to the pure-numpy paths when no compiler is present.
"""
import ctypes
import os
import subprocess

import numpy as np

__all__ = [
    'load_runtime', 'parse_hitran_records', 'tli_extract_range',
    'lbl_group', 'lbl_scatter',
]

_HERE = os.path.dirname(os.path.realpath(__file__))
_LIB_PATH = os.path.join(_HERE, 'libpbt_runtime.so')
_lib = None
_load_failed = False


def load_runtime():
    """Load (building if needed) the native runtime; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.isfile(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_HERE, 'pbt_runtime.cpp'))):
            subprocess.run(
                ['make', '-C', _HERE], capture_output=True, check=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.parse_hitran_par.restype = ctypes.c_int
        lib.parse_hitran_par.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.tli_extract_range.restype = ctypes.c_int64
        lib.lbl_group.restype = ctypes.c_int64
        lib.lbl_scatter.restype = None
        _lib = lib
    except (subprocess.CalledProcessError, OSError):
        _load_failed = True
    return _lib


def _dptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def parse_hitran_records(raw, recsize, nthreads=None):
    """Parse HITRAN .par bytes natively.

    Returns (wn, a21, g2, elow, iso) arrays, or None when the native
    library is unavailable (caller uses the numpy path).
    """
    lib = load_runtime()
    if lib is None:
        return None
    nrec = len(raw) // recsize
    if nthreads is None:
        nthreads = min(os.cpu_count() or 1, 8)
    wn = np.empty(nrec)
    a21 = np.empty(nrec)
    g2 = np.empty(nrec)
    elow = np.empty(nrec)
    iso = np.empty(nrec, np.int32)
    status = lib.parse_hitran_par(
        raw, nrec, recsize,
        _dptr(wn), _dptr(a21), _dptr(g2), _dptr(elow),
        iso.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nthreads,
    )
    if status != 0:
        return None
    return wn, a21, g2, elow, iso


def tli_extract_range(wn, iso, elow, gf, seg_counts, wn_low, wn_high):
    """Per-isotope ranged extraction from sorted TLI arrays (native).

    Returns filtered (wn, iso, elow, gf) or None if unavailable.
    """
    lib = load_runtime()
    if lib is None:
        return None
    wn = np.ascontiguousarray(wn)
    iso = np.ascontiguousarray(iso, np.int16)
    elow = np.ascontiguousarray(elow)
    gf = np.ascontiguousarray(gf)
    seg_counts = np.ascontiguousarray(seg_counts, np.int32)
    n = len(wn)
    out_wn = np.empty(n)
    out_iso = np.empty(n, np.int16)
    out_elow = np.empty(n)
    out_gf = np.empty(n)
    kept = lib.tli_extract_range(
        _dptr(wn),
        iso.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        _dptr(elow), _dptr(gf),
        seg_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(seg_counts),
        ctypes.c_double(wn_low), ctypes.c_double(wn_high),
        _dptr(out_wn),
        out_iso.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        _dptr(out_elow), _dptr(out_gf),
    )
    return (
        out_wn[:kept], out_iso[:kept], out_elow[:kept], out_gf[:kept],
    )


def lbl_group(awavn, aiso, anchor_cand, ownstep):
    """Greedy LBL co-adding segmentation (native).

    Returns (group_id int32 [n], ngroups), or None if unavailable.
    """
    lib = load_runtime()
    if lib is None:
        return None
    awavn = np.ascontiguousarray(awavn, np.float64)
    aiso = np.ascontiguousarray(aiso, np.int32)
    anchor_cand = np.ascontiguousarray(anchor_cand, np.float64)
    n = len(awavn)
    group_id = np.empty(n, np.int32)
    ngroups = lib.lbl_group(
        _dptr(awavn),
        aiso.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _dptr(anchor_cand),
        ctypes.c_int64(n), ctypes.c_double(ownstep),
        group_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return group_id, int(ngroups)


def lbl_scatter(strong, g_spec, minj, maxj, pindex, offset, ofactor,
                k_group, profile, ktmp):
    """Strided profile gather-add into ktmp [nspec, dnwn] (native).

    Returns True on success, None if unavailable.
    """
    lib = load_runtime()
    if lib is None:
        return None
    strong = np.ascontiguousarray(strong, np.uint8)
    g_spec = np.ascontiguousarray(g_spec, np.int32)
    minj = np.ascontiguousarray(minj, np.int64)
    maxj = np.ascontiguousarray(maxj, np.int64)
    pindex = np.ascontiguousarray(pindex, np.int64)
    offset = np.ascontiguousarray(offset, np.int64)
    k_group = np.ascontiguousarray(k_group, np.float64)
    profile = np.ascontiguousarray(profile, np.float64)
    assert ktmp.flags.c_contiguous and ktmp.dtype == np.float64
    lib.lbl_scatter(
        ctypes.c_int64(len(k_group)),
        strong.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        g_spec.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        minj.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        maxj.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pindex.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        offset.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(ofactor),
        _dptr(k_group), _dptr(profile), _dptr(ktmp),
        ctypes.c_int64(ktmp.shape[1]),
    )
    return True
