"""ctypes loader for the optional C++ native runtime (libsedef_native.so).

The native library accelerates sequential host-side hot loops that do not map
to the TPU (winnowing scan, chaining DP, wavefront traceback).  Every entry
point has a pure NumPy/Python fallback; ``has(name)`` reports availability.

Build with:  python -m sedef_tpu.native.build
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

_SO = pathlib.Path(__file__).parent / "libsedef_native.so"
_lib = None
if _SO.exists():
    try:
        _lib = ctypes.CDLL(str(_SO))
    except OSError:  # pragma: no cover
        _lib = None

_i8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")

if _lib is not None:
    _lib.sedef_winnow.restype = ctypes.c_int64
    _lib.sedef_winnow.argtypes = [
        _i64p, ctypes.c_int64, ctypes.c_int, _i64p]
    _lib.sedef_chain.restype = ctypes.c_int64
    _lib.sedef_chain.argtypes = [
        _i32p, _i32p, _i32p, _i32p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _i32p, _i32p]


def has(name: str) -> bool:
    return _lib is not None and hasattr(_lib, "sedef_" + name)


def winnow(code: np.ndarray, cls: np.ndarray, k: int, w: int):
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


def chain(q, r, l, score, max_chain_gap):
    """Sparse chaining DP; returns (prev, dp_score) arrays."""
    n = q.shape[0]
    prev = np.empty(n, dtype=np.int32)
    dp = np.empty(n, dtype=np.int32)
    _lib.sedef_chain(
        np.ascontiguousarray(q, np.int32), np.ascontiguousarray(r, np.int32),
        np.ascontiguousarray(l, np.int32),
        np.ascontiguousarray(score, np.int32), n,
        max_chain_gap, 0, 0, prev, dp)
    return prev, dp
