"""Wavefront aligner vs the real ksw2 extz2_sse kernel (fixtures) and the
Pallas kernel vs the NumPy reference."""

import numpy as np
import pytest

from sedef_tpu.ops.wavefront import (WavefrontAligner, _padded_rows,
                                     backtrack_np, wavefront_np,
                                     wavefront_pallas_batch)


def _load_pairs(path):
    lines = path.read_text().splitlines()
    out = []
    i = 0
    while i < len(lines):
        tag, qlen, tlen, score = lines[i].split()
        assert tag == "PAIR"
        q = np.array([int(c) for c in lines[i + 1]], dtype=np.int8)
        t = np.array([int(c) for c in lines[i + 2]], dtype=np.int8)
        out.append((q, t, int(score), lines[i + 3]))
        i += 4
    return out


def _cigar_str(cigar):
    return "".join(f"{ln}{op}" for op, ln in cigar)


def _cigar_score(cigar, q, t, match=5, mis=-4, gapo=40, gape=1):
    """Score a CIGAR under the ksw2 model (wildcard code 4 scores 0)."""
    s = 0
    qi = ti = 0
    for op, ln in cigar:
        if op == "M":
            for _ in range(ln):
                a, b = q[qi], t[ti]
                s += 0 if (a >= 4 or b >= 4) else (match if a == b else mis)
                qi += 1
                ti += 1
        else:
            s -= gapo + gape * ln
            if op == "D":
                qi += ln
            else:
                ti += ln
    assert qi == len(q) and ti == len(t), "CIGAR must consume both sequences"
    return s


@pytest.mark.parametrize("name", ["ksw2_pairs_1", "ksw2_pairs_2"])
def test_numpy_matches_ksw2(fixtures_dir, name):
    pairs = _load_pairs(fixtures_dir / f"{name}.txt")
    assert pairs
    for q, t, score, cigar_ref in pairs:
        p, sc = wavefront_np(q, t)
        cig = backtrack_np(p, len(q), len(t))
        assert sc == score, f"score {sc} != ksw2 {score}"
        assert _cigar_str(cig) == cigar_ref


def test_pallas_interpret_matches_numpy():
    rng = np.random.default_rng(0)
    pairs = []
    for _ in range(4):
        ql, tl = rng.integers(20, 120, 2)
        q = rng.integers(0, 4, ql).astype(np.int8)
        t = q[:tl].copy() if tl <= ql else np.concatenate(
            [q, rng.integers(0, 4, tl - ql)]).astype(np.int8)
        mut = rng.random(tl) < 0.1
        t[mut] = rng.integers(0, 4, mut.sum())
        pairs.append((q, t))

    al = WavefrontAligner(interpret=True)
    # align one pair at a time: every call shares the same (B=1, 128, 128)
    # compiled shape, so the (slow, remote) interpret compile happens once
    # per test session
    got = [al.align_batch([p])[0] for p in pairs]
    for (q, t), cig in zip(pairs, got):
        p, sc = wavefront_np(q, t)
        expect = backtrack_np(p, len(q), len(t))
        assert cig == expect
        assert _cigar_score(cig, q, t) == sc


def test_pallas_direction_rows_match_numpy():
    rng = np.random.default_rng(3)
    ql, tl = 100, 90
    q = rng.integers(0, 4, ql).astype(np.int8)
    t = rng.integers(0, 4, tl).astype(np.int8)
    S_q = S_t = 128
    qcodes = np.full((8, _padded_rows(S_q, S_t)), 4, dtype=np.int32)
    qcodes[3, :ql] = q  # park the real problem in sublane 3
    tpad = np.full((8, S_t), 4, dtype=np.int8)
    tpad[3, :tl] = t
    p_dev = np.asarray(wavefront_pallas_batch(
        qcodes, tpad, S_q, S_t, interpret=True))[0, :, 3, :]
    p_ref, _ = wavefront_np(q, t)
    # compare only the valid triangle lanes of the real problem
    for r in range(ql + tl - 1):
        st0, en0 = max(0, r - ql + 1), min(r, tl - 1)
        np.testing.assert_array_equal(
            p_dev[r, st0:en0 + 1], p_ref[r, st0:en0 + 1],
            err_msg=f"row {r}")


def test_chunked_strings():
    # exercise align_strings chunking with a tiny max_ksw_seq_len
    from sedef_tpu.config import Config
    cfg = Config().finalize()
    cfg.align.max_ksw_seq_len = 64
    al = WavefrontAligner(cfg=cfg, use_tpu=False)
    rng = np.random.default_rng(1)
    s = "".join(rng.choice(list("ACGT"), 150))
    cig = al.align_strings(s, s)
    # self-alignment in two chunks -> all M, consuming 150 each
    assert sum(ln for op, ln in cig if op != "I") == 150
    assert sum(ln for op, ln in cig if op != "D") == 150
    assert all(op == "M" for op, ln in cig)


def test_device_traceback_interpret():
    """Fused fill + on-device traceback (interpret mode) produces CIGARs
    identical to the NumPy reference DP, for both the plain (G=1) and the
    lane-packed (G>1) layouts, at the default and the wide (SUB>8)
    sublane packings."""
    from sedef_tpu.ops.wavefront import (WILDCARD, cigar_from_packed_ops,
                                         wavefront_cigar_device)
    rng = np.random.default_rng(11)
    for S_q, S_t, G, B, SUB in [(128, 128, 8, 64, 8), (128, 128, 1, 8, 8),
                                (256, 128, 8, 64, 8), (128, 128, 1, 16, 16),
                                (128, 128, 2, 64, 32)]:
        qs = np.full((B, S_q), WILDCARD, np.int8)
        tp = np.full((B, S_t), WILDCARD, np.int8)
        ql = np.ones(B, np.int32)
        tl = np.ones(B, np.int32)
        probs = []
        # exercise every lane stride class with distinct lengths
        for i in range(min(B, 2 * SUB * G)):
            qlen = int(rng.integers(S_q // 2, S_q + 1))
            tlen = int(rng.integers(S_t // 2, S_t + 1))
            q = rng.integers(0, 4, qlen).astype(np.int8)
            t = np.array(list(q[:min(qlen, tlen)])
                         + [0] * max(0, tlen - qlen), np.int8)[:tlen]
            m = rng.random(tlen) < 0.12
            t[m] = rng.integers(0, 4, int(m.sum()))
            qs[i, :qlen] = q
            tp[i, :tlen] = t
            ql[i] = qlen
            tl[i] = tlen
            probs.append((q, t))
        ops = np.asarray(wavefront_cigar_device(
            qs, tp, ql, tl, S_q, S_t, interpret=True, G=G, SUB=SUB))
        for i, (q, t) in enumerate(probs):
            got = cigar_from_packed_ops(ops[i], len(q), len(t))
            p_ref, _ = wavefront_np(q, t)
            assert got == backtrack_np(p_ref, len(q), len(t)), (S_q, S_t,
                                                                G, SUB, i)


def test_tiled_matches_numpy_interpret():
    """Tiled checkpoint/recompute fill+traceback (wavefront_cigar_tiled)
    vs the NumPy oracle, interpret mode (covers the giant 60 Kbp chunk
    routing at miniature scale: TILE < n_diag forces multiple tiles)."""
    import jax.numpy as jnp

    from sedef_tpu.ops.wavefront import (backtrack_np, cigar_from_ops,
                                         wavefront_cigar_tiled, wavefront_np)
    rng = np.random.default_rng(5)
    S, B = 256, 8
    qs = np.full((B, S), 4, np.int8)
    ts = np.full((B, S), 4, np.int8)
    qls = np.zeros(B, np.int32)
    tls = np.zeros(B, np.int32)
    pairs = []
    for b in range(B):
        ql = int(rng.integers(150, S + 1))
        tl = int(rng.integers(150, S + 1))
        L = max(ql, tl)
        q = rng.integers(0, 4, L).astype(np.int8)
        t = q.copy()
        m = rng.random(L) < 0.12
        t[m] = (t[m] + rng.integers(1, 4, int(m.sum()))) % 4
        q, t = q[:ql], t[:tl]
        pairs.append((q, t))
        qs[b, :ql] = q
        ts[b, :tl] = t
        qls[b] = ql
        tls[b] = tl
    ops = np.asarray(wavefront_cigar_tiled(
        jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(qls),
        jnp.asarray(tls), S, S, TILE=128, interpret=True))
    for b, (q, t) in enumerate(pairs):
        got = cigar_from_ops(ops[b], len(q), len(t), skip=255)
        p, _ = wavefront_np(q, t)
        assert got == backtrack_np(p, len(q), len(t)), b


def test_pipelined_matches_numpy_interpret():
    """Streamed (pipelined) fill+traceback vs the NumPy oracle: problems
    staggered by S_q rows share lanes; CIGARs must match the per-problem
    DP exactly."""
    import jax.numpy as jnp

    from sedef_tpu.ops.wavefront import (backtrack_np,
                                         cigar_from_packed_ops,
                                         wavefront_cigar_pipelined,
                                         wavefront_np)
    rng = np.random.default_rng(8)
    S, K, SUB = 128, 2, 8
    B = SUB * K
    qs = np.full((B, S), 4, np.int8)
    ts = np.full((B, S), 4, np.int8)
    qls = np.zeros(B, np.int32)
    tls = np.zeros(B, np.int32)
    pairs = []
    for b in range(B):
        ql = int(rng.integers(70, S + 1))
        tl = int(rng.integers(70, S + 1))
        L = max(ql, tl)
        q = rng.integers(0, 4, L).astype(np.int8)
        t = q.copy()
        m = rng.random(L) < 0.15
        t[m] = (t[m] + rng.integers(1, 4, int(m.sum()))) % 4
        q, t = q[:ql], t[:tl]
        pairs.append((q, t))
        qs[b, :ql] = q
        ts[b, :tl] = t
        qls[b] = ql
        tls[b] = tl
    ops = np.asarray(wavefront_cigar_pipelined(
        jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(qls),
        jnp.asarray(tls), S, S, K, SUB=SUB, interpret=True))
    for b, (q, t) in enumerate(pairs):
        got = cigar_from_packed_ops(ops[b], len(q), len(t))
        p, _ = wavefront_np(q, t)
        assert got == backtrack_np(p, len(q), len(t)), b


def test_pipelined_asymmetric_matches_numpy_interpret():
    """S_t > S_q: multiple growth fronts per stream (n_i > 1) exercise
    the per-front target-switch lanes (lane == srm + i*S_q)."""
    import jax.numpy as jnp

    from sedef_tpu.ops.wavefront import (backtrack_np,
                                         cigar_from_packed_ops,
                                         wavefront_cigar_pipelined,
                                         wavefront_np)
    rng = np.random.default_rng(21)
    S_q, S_t, K, SUB = 128, 256, 2, 8
    B = SUB * K
    qs = np.full((B, S_q), 4, np.int8)
    ts = np.full((B, S_t), 4, np.int8)
    qls = np.zeros(B, np.int32)
    tls = np.zeros(B, np.int32)
    pairs = []
    for b in range(B):
        ql = int(rng.integers(70, S_q + 1))
        tl = int(rng.integers(150, S_t + 1))
        t = rng.integers(0, 4, tl).astype(np.int8)
        q = t[:ql].copy()
        m = rng.random(ql) < 0.12
        q[m] = (q[m] + rng.integers(1, 4, int(m.sum()))) % 4
        pairs.append((q, t))
        qs[b, :ql] = q
        ts[b, :tl] = t
        qls[b] = ql
        tls[b] = tl
    ops = np.asarray(wavefront_cigar_pipelined(
        jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(qls),
        jnp.asarray(tls), S_q, S_t, K, SUB=SUB, interpret=True))
    for b, (q, t) in enumerate(pairs):
        got = cigar_from_packed_ops(ops[b], len(q), len(t))
        p, _ = wavefront_np(q, t)
        assert got == backtrack_np(p, len(q), len(t)), b


def test_tiled_pipelined_matches_numpy_interpret():
    """Streamed-tiled giant path (K-problem streams through the
    checkpoint/recompute machinery, multi-walker parity-plane traceback)
    vs the NumPy oracle AND the plain tiled path, interpret mode."""
    import jax.numpy as jnp

    from sedef_tpu.ops.wavefront import (backtrack_np, cigar_from_ops,
                                         wavefront_cigar_tiled,
                                         wavefront_cigar_tiled_pipelined,
                                         wavefront_np)
    rng = np.random.default_rng(13)
    S, K, SUB = 256, 4, 8
    n_streams = SUB
    B = n_streams * K
    qs = np.full((B, S), 4, np.int8)
    ts = np.full((B, S), 4, np.int8)
    qls = np.ones(B, np.int32)
    tls = np.ones(B, np.int32)
    pairs = []
    for b in range(B):
        ql = int(rng.integers(150, S + 1))
        tl = int(rng.integers(150, S + 1))
        L = max(ql, tl)
        q = rng.integers(0, 4, L).astype(np.int8)
        t = q.copy()
        m = rng.random(L) < 0.15
        t[m] = (t[m] + rng.integers(1, 4, int(m.sum()))) % 4
        q, t = q[:ql], t[:tl]
        pairs.append((q, t))
        qs[b, :ql] = q
        ts[b, :tl] = t
        qls[b] = ql
        tls[b] = tl
    ops = np.asarray(wavefront_cigar_tiled_pipelined(
        jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(qls),
        jnp.asarray(tls), S, S, K, SUB=SUB, TILE=512, interpret=True))
    ops_plain = np.asarray(wavefront_cigar_tiled(
        jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(qls),
        jnp.asarray(tls), S, S, TILE=512, interpret=True))
    for b, (q, t) in enumerate(pairs):
        got = cigar_from_ops(ops[b], len(q), len(t), skip=255)
        p, _ = wavefront_np(q, t)
        want = backtrack_np(p, len(q), len(t))
        assert got == want, b
        assert got == cigar_from_ops(ops_plain[b], len(q), len(t),
                                     skip=255), b


def test_align_giant_streamed_interpret():
    """_align_giant's streamed branch (len > SUB problems, S_t <= S_q)
    routes through wavefront_cigar_tiled_pipelined and must reproduce the
    NumPy oracle CIGARs (miniature class, interpret mode)."""
    from sedef_tpu.ops.wavefront import (WavefrontAligner, backtrack_np,
                                         wavefront_np)
    rng = np.random.default_rng(21)
    al = WavefrontAligner(interpret=True)
    S = 256
    pairs = []
    for _ in range(20):
        ql = int(rng.integers(180, S + 1))
        tl = int(rng.integers(180, S + 1))
        L = max(ql, tl)
        q = rng.integers(0, 4, L).astype(np.int8)
        t = q.copy()
        m = rng.random(L) < 0.1
        t[m] = (t[m] + rng.integers(1, 4, int(m.sum()))) % 4
        pairs.append((q[:ql], t[:tl]))
    results = [None] * len(pairs)
    al._align_giant(pairs, list(range(len(pairs))), S, S, results)
    for b, (q, t) in enumerate(pairs):
        p, _ = wavefront_np(q, t)
        assert results[b] == backtrack_np(p, len(q), len(t)), b
