"""Jaccard <-> edit-error statistical model.

Re-implements the reference's MashMap-style model (``src/util.cc:52-113``):

* ``tau(d, k)``: expected winnowed-Jaccard given per-base edit error ``d`` and
  gap error modeled as ``min(1, ERROR_RATIO * d)`` (util.cc:52-60).
* ``solve_inverse_jaccard(j, k)``: Newton solve of ``tau(d) = j`` for ``d``
  (util.cc:62-83).
* ``relaxed_jaccard_estimate(s, k)``: the minimum number of shared sketch
  elements (out of an ``s``-element MinHash sketch) that keeps the estimated
  edit distance within MAX_EDIT_ERROR at a 75 % binomial confidence
  (util.cc:85-113).  The reference memoizes per ``s``; we expose both a
  memoized scalar entry point and a precomputed table for device use.

The reference uses boost::math's binomial quantile with its default
"round outwards" discrete-quantile policy; for an upper-tail quantile that is
the smallest integer k with ``P(X <= k) >= 1 - Q2`` — which is exactly
``scipy.stats.binom.ppf``.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
from scipy.stats import binom

from ..config import DEFAULT, Config

_CI = 0.75
_Q2 = (1.0 - _CI) / 2.0


def tau(edit_error: float, kmer_size: int, cfg: Config = DEFAULT) -> float:
    """Expected Jaccard for edit error ``d`` (``util.cc:52-60``)."""
    gap_error = min(1.0, cfg.search.error_ratio * edit_error)
    a = (1 - gap_error) / (1 + gap_error)
    b = 1.0 / (2.0 * math.exp(kmer_size * edit_error) - 1.0)
    return a * b


def solve_inverse_jaccard(j: float, kmer_size: int,
                          cfg: Config = DEFAULT) -> float:
    """Invert ``tau``: edit error whose expected Jaccard is ``j``.

    Newton-Raphson from d=0.10 bracketed to [0, 1] (``util.cc:62-83``).
    NOTE: the reference declares the first parameter as ``int``
    (``util.cc:62``), so callers passing a fractional Jaccard get it
    truncated to 0 or 1; use :func:`solve_inverse_jaccard_int` to reproduce
    that exact behaviour.
    """
    if j <= 0:
        return 1.0
    if j >= 1:
        return 0.0
    ratio = cfg.search.error_ratio

    def f(d: float) -> float:
        e = math.exp(d * kmer_size)
        return ((1 - d * ratio) / (1 + d * ratio)) * (1.0 / (2 * e - 1)) - j

    def fprime(d: float) -> float:
        e = math.exp(d * kmer_size)
        return (2 * (-kmer_size * e + ratio - 2 * ratio * e
                     + e * kmer_size * (d * ratio) ** 2)
                / ((2 * e - 1) * (1 + d * ratio)) ** 2)

    d = 0.10
    lo, hi = 0.0, 1.0
    for _ in range(200):
        fd = f(d)
        if fd > 0:
            lo = d
        else:
            hi = d
        fp = fprime(d)
        step = fd / fp if fp != 0 else 0.0
        nd = d - step
        if not (lo < nd < hi):
            nd = 0.5 * (lo + hi)
        if abs(nd - d) < 1e-15:
            d = nd
            break
        d = nd
    return d


def _solve_inverse_jaccard_int(j: int, kmer_size: int, cfg: Config) -> float:
    """Literal port of ``solve_inverse_jaccard`` with its ``int j`` parameter
    (util.cc:62-66): only j==0 (-> 1.0) and j==1 (-> 0.0) are reachable from
    ``relaxed_jaccard_estimate``."""
    if j == 0:
        return 1.0
    if j == 1:
        return 0.0
    return solve_inverse_jaccard(float(j), kmer_size, cfg)


@lru_cache(maxsize=None)
def _relaxed_jaccard_estimate(s: int, kmer_size: int,
                              max_edit_error: float, error_ratio: float) -> int:
    """Literal port of util.cc:85-113.

    Because the reference's ``solve_inverse_jaccard`` truncates its Jaccard
    argument to int, the descending confidence loop terminates on the first
    iteration whenever ``0 < result < s`` (d -> 1, tau -> 0, binomial
    quantile -> 0, low_d -> 1, and 0 < MAX_EDIT_ERROR fires), giving the
    closed form ``ceil(s * tau(MAX_EDIT_ERROR, k)) + 1``.  We keep the loop
    to remain faithful for the s <= 1 edge cases and non-default configs.
    """
    if s <= 0:
        return 0
    cfg = Config().finalize()
    cfg.search.max_edit_error = max_edit_error
    cfg.search.max_error = max_edit_error * (1 + error_ratio)

    result = math.ceil(s * tau(max_edit_error, kmer_size, cfg))
    while result >= 0:
        d = _solve_inverse_jaccard_int(int(result / s), kmer_size, cfg)
        t = tau(d, kmer_size, cfg)
        x = 0.0 if t <= 0 else float(binom.ppf(1.0 - _Q2, s, t))
        low_d = _solve_inverse_jaccard_int(int(x / s), kmer_size, cfg)
        if 100 * (1 - low_d) < max_edit_error:
            result += 1
            break
        result -= 1
    return max(int(result), 0)


def relaxed_jaccard_estimate(s: int, kmer_size: int,
                             cfg: Config = DEFAULT) -> int:
    """Minimum sketch intersection for an ``s``-element window sketch."""
    return _relaxed_jaccard_estimate(
        s, kmer_size, cfg.search.max_edit_error, cfg.search.error_ratio)


def relaxed_jaccard_table(max_s: int, kmer_size: int,
                          cfg: Config = DEFAULT) -> np.ndarray:
    """Precomputed limit table for s in [0, max_s] (device-friendly)."""
    return np.array(
        [relaxed_jaccard_estimate(s, kmer_size, cfg) if s > 0 else 0
         for s in range(max_s + 1)],
        dtype=np.int32,
    )
