"""ctypes loader for the C++ native runtime (libsedef_native.so).

The native library accelerates sequential host-side hot loops that do not
map to the TPU (winnowing scan, stage-1 search, chaining DP, wavefront
traceback).  Every entry point has a pure NumPy/Python fallback; ``has``
reports availability.  Build with:  python -m sedef_tpu.native.build
"""

from __future__ import annotations

import ctypes
import os
import pathlib

import numpy as np

# SEDEF_NATIVE_SO overrides the library path (used by the ASan test to load
# the sanitizer build in a subprocess)
_SO = pathlib.Path(os.environ.get(
    "SEDEF_NATIVE_SO", pathlib.Path(__file__).parent / "libsedef_native.so"))
_lib = None
if _SO.exists():
    try:
        _lib = ctypes.CDLL(str(_SO))
    except OSError:  # pragma: no cover
        _lib = None

_u8 = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_i32 = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_i64 = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")

if _lib is not None:
    _lib.sedef_winnow.restype = ctypes.c_int64
    _lib.sedef_winnow.argtypes = [_i64, ctypes.c_int64, ctypes.c_int, _i64]

    _lib.sedef_kmer_keys.restype = ctypes.c_int64
    _lib.sedef_kmer_keys.argtypes = [_u8, _u8, ctypes.c_int64,
                                     ctypes.c_int, _i64]

    _lib.sedef_search.restype = ctypes.c_int64
    _lib.sedef_search.argtypes = (
        [_i64, _i32, ctypes.c_int64, _i64, _i32, ctypes.c_int64, _u8, _u8,
         ctypes.c_int64] * 2
        + [ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
           ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
           ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
           _i32, ctypes.c_int64, _i64])

    _lib.sedef_backtrack.restype = ctypes.c_int64
    _lib.sedef_backtrack.argtypes = [
        _u8, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, _u8, _i32,
        ctypes.c_int64]

    _lib.sedef_align.restype = ctypes.c_int64
    _lib.sedef_align.argtypes = [
        _u8, ctypes.c_int32, _u8, ctypes.c_int32, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, _u8, _i32,
        ctypes.c_int64]

    _lib.sedef_chain.restype = ctypes.c_int64
    _lib.sedef_chain.argtypes = [
        _i32, _i32, _i32, _i32, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        _i32, _i64, ctypes.c_int64]

    if hasattr(_lib, "sedef_prof_get"):
        _lib.sedef_prof_get.restype = None
        _lib.sedef_prof_get.argtypes = [_i64]
        _lib.sedef_prof_reset.restype = None
        _lib.sedef_prof_reset.argtypes = []


def has(name: str) -> bool:
    return _lib is not None and hasattr(_lib, "sedef_" + name)


PROF_FIELDS = ("collect", "cluster", "roll", "replay", "extend", "filter",
               "roll_steps", "intervals", "survivors")


def prof_get() -> dict[str, int]:
    """Accumulated per-phase nanoseconds (+counts) of the native search."""
    out = np.zeros(len(PROF_FIELDS), dtype=np.int64)
    if has("prof_get"):
        _lib.sedef_prof_get(out)
    return dict(zip(PROF_FIELDS, out.tolist()))


def prof_reset() -> None:
    if has("prof_reset"):
        _lib.sedef_prof_reset()


def kmer_keys(code: np.ndarray, cls: np.ndarray, k: int) -> np.ndarray:
    n = code.shape[0] - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    _lib.sedef_kmer_keys(np.ascontiguousarray(code),
                         np.ascontiguousarray(cls), code.shape[0], k, out)
    return out


def winnow(code: np.ndarray, cls: np.ndarray, k: int, w: int):
    if has("kmer_keys"):
        keys = kmer_keys(code, cls, k)
    else:  # pragma: no cover
        from ..ops.winnow import kmer_keys_np
        keys = kmer_keys_np(code, cls, k)
    n = keys.shape[0]
    if n <= w:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
    keys = np.ascontiguousarray(keys)
    out = np.empty(n, dtype=np.int64)
    cnt = _lib.sedef_winnow(keys, n, w, out)
    cps = out[:cnt]
    first = int(np.searchsorted(cps, w, side="right")) - 1
    locs = cps[first:].astype(np.int32)
    return keys[locs], locs


def search(q_index, r_index, same_genome: bool, cfg) -> np.ndarray:
    """Full initial_search via the native core; returns (n, 5) int32 array
    of (qs, qe, rs, re, jaccard).  Indexes are MinimizerIndex objects."""
    from ..ops.stat_model import tau

    def args_for(ix):
        return [np.ascontiguousarray(ix.keys),
                np.ascontiguousarray(ix.locs),
                len(ix.keys),
                np.ascontiguousarray(ix.skeys),
                np.ascontiguousarray(ix.slocs),
                int(ix.threshold),
                np.ascontiguousarray(ix.seq.cls),
                np.ascontiguousarray(ix.seq.code),
                len(ix.seq)]

    cap = 1 << 16
    counters = np.zeros(5, dtype=np.int64)
    while True:
        out = np.empty(cap, dtype=np.int32)
        n = _lib.sedef_search(
            *args_for(q_index), *args_for(r_index),
            cfg.search.kmer_size,
            tau(cfg.search.max_edit_error, cfg.search.kmer_size, cfg),
            cfg.search.min_read_size, cfg.search.max_sd_size,
            cfg.search.max_error, cfg.search.max_edit_error,
            cfg.search.gap_frequency, cfg.search.min_uppercase,
            int(same_genome), int(cfg.internal.do_uppercase),
            int(cfg.internal.do_qgram),
            int(cfg.internal.do_uppercase_seeds),
            out, cap, counters)
        if n >= 0:
            from ..ops import filter as filt
            for key, idx in zip(
                    ("total", "jaccard", "interval", "lowercase", "qgram"),
                    range(5)):
                filt.COUNTERS.add(key, int(counters[idx]))
            return out[:n * 5].reshape(n, 5)
        cap = int(-n) * 5 + 16


def align(q: np.ndarray, t: np.ndarray, match: int, mis: int, gapo: int,
          gape: int) -> list[tuple[str, int]]:
    """Full scalar wavefront DP + traceback (small host-side problems)."""
    qlen, tlen = len(q), len(t)
    cap = qlen + tlen + 2
    ops = np.empty(cap, dtype=np.uint8)
    lens = np.empty(cap, dtype=np.int32)
    n = _lib.sedef_align(
        np.ascontiguousarray(q, np.uint8), qlen,
        np.ascontiguousarray(t, np.uint8), tlen,
        match, mis, gapo, gape, ops, lens, cap)
    assert n >= 0
    return [(chr(ops[i]), int(lens[i])) for i in range(n)]


def backtrack(p: np.ndarray, qlen: int, tlen: int) -> list[tuple[str, int]]:
    p = np.ascontiguousarray(p)
    cap = qlen + tlen + 2
    ops = np.empty(cap, dtype=np.uint8)
    lens = np.empty(cap, dtype=np.int32)
    n = _lib.sedef_backtrack(p, p.shape[1], qlen, tlen, ops, lens, cap)
    assert n >= 0
    return [(chr(ops[i]), int(lens[i])) for i in range(n)]


def chain(aq, ar, al, ahu, max_chain_gap: int, match_chain_score: int):
    """Returns (path int32 array, boundaries list[(end, has_u)])."""
    n = len(aq)
    path = np.empty(max(n, 1), dtype=np.int32)
    bcap = 2 * (n + 2)
    bounds = np.empty(bcap, dtype=np.int64)
    nb = _lib.sedef_chain(
        np.ascontiguousarray(aq, np.int32),
        np.ascontiguousarray(ar, np.int32),
        np.ascontiguousarray(al, np.int32),
        np.ascontiguousarray(ahu, np.int32), n,
        max_chain_gap, match_chain_score, path, bounds, bcap)
    assert nb >= 0
    boundaries = [(int(bounds[2 * i]), int(bounds[2 * i + 1]))
                  for i in range(nb)]
    npath = boundaries[-1][0] if boundaries else 0
    return path[:npath], boundaries
