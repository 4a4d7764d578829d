"""Batched ideal sketch-Jaccard vs brute force and vs the exact
incremental structure (ideal may only differ through the reference's
boundary-add quirk, documented in jaccard_batch.py)."""

import numpy as np

from sedef_tpu.ops.jaccard_batch import (INF, sketch_intersection,
                                         windows_to_arrays)
from sedef_tpu.ops.sliding import SlidingJaccard


def brute_ideal(q: set[int], r: set[int]) -> int:
    s = len(q)
    union = sorted(q | r)
    window = set(union[:s])
    return len(window & q & r)


def test_matches_bruteforce():
    rng = np.random.default_rng(0)
    B = 40
    qs, rs = [], []
    expect = []
    for _ in range(B):
        q = set(rng.integers(0, 500, rng.integers(5, 60)).tolist())
        r = set(rng.integers(0, 500, rng.integers(5, 120)).tolist())
        qs.append(np.array(sorted(q), dtype=np.int64))
        rs.append(np.array(sorted(r), dtype=np.int64))
        expect.append(brute_ideal(q, r))
    qa, qsz = windows_to_arrays(qs, 80)
    ra, _ = windows_to_arrays(rs, 160)
    got = np.asarray(sketch_intersection(qa, ra, qsz))
    assert got.tolist() == expect


def test_close_to_exact_incremental():
    """The incremental structure (built query-first then refs) equals the
    ideal except for boundary-add drift; verify the drift is tiny and
    one-sided (ideal >= incremental)."""
    rng = np.random.default_rng(1)
    diffs = []
    for _ in range(50):
        q = sorted(set(rng.integers(0, 1000, 44).tolist()))
        r = sorted(set(rng.integers(0, 1000, 50).tolist()))
        sm = SlidingJaccard(12)
        for k in q:
            sm.add_to_query(k)
        for k in rng.permutation(r).tolist():
            sm.add_to_reference(int(k))
        ideal = brute_ideal(set(q), set(r))
        assert ideal >= sm.intersection
        diffs.append(ideal - sm.intersection)
    assert np.mean(diffs) <= 1.0
