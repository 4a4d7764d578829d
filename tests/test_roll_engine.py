"""Device roll engine vs the scalar SlidingJaccard oracle.

Each planned interval's op stream (query adds, initial ref-window adds,
then the 1 bp roll) is replayed both by the batched device kernel and by
the Python SlidingJaccard class; best-jaccard value and step must match
exactly — including the path-dependent boundary quirks.
"""

import numpy as np
import pytest

from sedef_tpu.config import DEFAULT
from sedef_tpu.ops import dna
from sedef_tpu.ops.index import MinimizerIndex
from sedef_tpu.ops.roll_engine import RollEngine
from sedef_tpu.ops.sliding import SlidingJaccard
from sedef_tpu.ops.stat_model import relaxed_jaccard_estimate


def scalar_roll(qh, rh, qws, qwe, t_start, t_end, init_len, cfg):
    """The roll of search_in_reference_interval (models/seeder.py:254-292)
    on the query window [qws, qwe), returning (best_j, best_steps)."""
    w = SlidingJaccard(qh.kmer_size, cfg)
    for i in range(qws, qwe):
        w.add_to_query(int(qh.keys[i]))
    rlen = len(rh.seq)
    nr = len(rh.keys)
    rs = t_start
    re = min(t_start + init_len, rlen)
    rws = rh.find_minimizers(rs)
    rwe = rws
    while rwe < nr and rh.locs[rwe] < re:
        w.add_to_reference(int(rh.keys[rwe]))
        rwe += 1
    best = (w.jaccard(), 0)
    steps = 0
    while rs < t_end and re < rlen:
        if rws < nr and rh.locs[rws] < rs + 1:
            w.remove_from_reference(int(rh.keys[rws]))
            rws += 1
        if rwe < nr and rh.locs[rwe] == re:
            w.add_to_reference(int(rh.keys[rwe]))
            rwe += 1
        steps += 1
        if w.jaccard() > best[0]:
            best = (w.jaccard(), steps)
        rs += 1
        re += 1
        if re == rlen:
            break
    return best


def mutate(seq, rate, rng):
    out = []
    for ch in seq:
        r = rng.random()
        if r < rate * 0.7:
            out.append(rng.choice(list("ACGT")))
        elif r < rate * 0.85:
            pass  # deletion
        elif r < rate:
            out.append(ch)
            out.append(rng.choice(list("ACGT")))
        else:
            out.append(ch)
    return "".join(out)


def make_plan(qh, rh, init_len, max_windows=40):
    """Speculative plan intervals (empty tree) for the first windows,
    mirroring models/seeder.py search()."""
    rows = []
    nq = len(qh.keys)
    rlen = len(rh.seq)
    nr = len(rh.keys)
    stride = int(init_len * DEFAULT.search.max_error) // 2
    next_at = 0
    nwin = 0
    for qi in range(nq):
        loc = int(qh.locs[qi])
        if loc < next_at:
            continue
        if qh.status_of(int(qh.keys[qi])) != 0:
            continue
        next_at = loc + stride
        nwin += 1
        if nwin > max_windows:
            break
        if loc + init_len > len(qh.seq):
            continue
        qwe = qi
        wkeys = set()
        cands = set()
        while qwe < nq and qh.locs[qwe] - loc <= init_len:
            key = int(qh.keys[qwe])
            wkeys.add(key)
            qwe += 1
            if qh.status_of(key) != 0:
                continue
            sz = rh.posting_size(key)
            if sz == 0 or sz >= rh.threshold:
                continue
            for pos in rh.posting(key):
                cands.add(int(pos))
        if not wkeys:
            continue
        limit = relaxed_jaccard_estimate(len(wkeys), qh.kmer_size, DEFAULT)
        cands = sorted(cands)
        T = []
        for i in range(0, len(cands) - limit + 1):
            j = i + limit - 1
            if cands[j] - cands[i] <= init_len:
                x = max(0, cands[j] - init_len + 1)
                y = cands[i] + 1
                if T and x < T[-1][1]:
                    T[-1][1] = max(T[-1][1], y)
                else:
                    T.append([x, y])
        for t0, t1 in T:
            rws0 = rh.find_minimizers(t0)
            re0 = min(t0 + init_len, rlen)
            rwe0 = rws0
            while rwe0 < nr and rh.locs[rwe0] < re0:
                rwe0 += 1
            n_steps = max(0, min(t1 - t0, rlen - re0)) if re0 < rlen else 0
            rows.append((qi, qwe, t0, t1, rws0, rwe0 - rws0, n_steps, re0))
    return rows


@pytest.mark.parametrize("seed,rate", [(0, 0.05), (1, 0.12), (2, 0.25)])
def test_roll_engine_matches_scalar(seed, rate):
    rng = np.random.default_rng(seed)
    base = "".join(rng.choice(list("ACGT"), 1500))
    q = "".join(rng.choice(list("ACGT"), 400)) + base + \
        "".join(rng.choice(list("ACGT"), 400))
    r = "".join(rng.choice(list("ACGT"), 600)) + mutate(base, rate, rng) + \
        "".join(rng.choice(list("ACGT"), 600))
    cfg = DEFAULT
    k, w = cfg.search.kmer_size, cfg.search.window_size
    qh = MinimizerIndex(dna.PackedSeq("q", q), k, w)
    rh = MinimizerIndex(dna.PackedSeq("r", r), k, w)
    init_len = cfg.search.min_read_size

    rows = make_plan(qh, rh, init_len)
    assert rows, "no intervals planned - test setup broken"

    lut = np.array([relaxed_jaccard_estimate(s, k, cfg)
                    for s in range(161)], np.int32)
    eng = RollEngine(k, lut, batch=16)
    import jax.numpy as jnp
    qk = jnp.asarray(qh.keys.astype(np.int32))
    rk = jnp.asarray(rh.keys.astype(np.int32))
    rl = jnp.asarray(rh.locs.astype(np.int32))
    cols = list(zip(*rows))
    bj, bs, ok = eng.run(qk, rk, rl, len(rh.keys), len(rh.seq),
                         cols[0], cols[1], cols[2], cols[4], cols[5],
                         cols[6], cols[7])
    n_checked = 0
    for i, (qws, qwe, t0, t1, rws0, icnt, nst, re0) in enumerate(rows):
        ebj, ebs = scalar_roll(qh, rh, qws, qwe, t0, t1, init_len, cfg)
        assert ok[i], f"interval {i} overflowed unexpectedly"
        assert (bj[i], bs[i]) == (ebj, ebs), \
            f"interval {i}: device ({bj[i]},{bs[i]}) != scalar ({ebj},{ebs})"
        n_checked += 1
    assert n_checked >= 1


def test_roll_engine_masked_and_n():
    """Soft-masked + N-run sequences: exercises the HAS_N skip (ref keys
    never added) and lowercase statuses through the packed store."""
    rng = np.random.default_rng(9)
    chars = list("ACGTacgt")
    base = "".join(rng.choice(chars, 1800))
    ins = "".join(rng.choice(list("N"), 30))
    q = "".join(rng.choice(chars, 300)) + base + ins + base[:400]
    r = ("".join(rng.choice(chars, 500)) + mutate(base, 0.1, rng)
         + ins + mutate(base[:400], 0.1, rng))
    cfg = DEFAULT
    k, w = cfg.search.kmer_size, cfg.search.window_size
    qh = MinimizerIndex(dna.PackedSeq("q", q), k, w)
    rh = MinimizerIndex(dna.PackedSeq("r", r), k, w)
    init_len = cfg.search.min_read_size
    rows = make_plan(qh, rh, init_len, max_windows=60)
    if not rows:
        pytest.skip("no intervals on this seed")
    lut = np.array([relaxed_jaccard_estimate(s, k, cfg)
                    for s in range(161)], np.int32)
    eng = RollEngine(k, lut, batch=8)
    import jax.numpy as jnp
    qk = jnp.asarray(qh.keys.astype(np.int32))
    rk = jnp.asarray(rh.keys.astype(np.int32))
    rl = jnp.asarray(rh.locs.astype(np.int32))
    cols = list(zip(*rows))
    bj, bs, ok = eng.run(qk, rk, rl, len(rh.keys), len(rh.seq),
                         cols[0], cols[1], cols[2], cols[4], cols[5],
                         cols[6], cols[7])
    for i, (qws, qwe, t0, t1, rws0, icnt, nst, re0) in enumerate(rows):
        ebj, ebs = scalar_roll(qh, rh, qws, qwe, t0, t1, init_len, cfg)
        assert ok[i]
        assert (bj[i], bs[i]) == (ebj, ebs), i


@pytest.mark.parametrize("trial", range(4))
def test_device_planned_search_byte_identical(trial, monkeypatch):
    """Production path: initial_search with the device plan+roll engine
    must emit byte-identical hits to the plain native engine, including
    same-genome runs where hit-tree pruning forces host fallbacks."""
    from sedef_tpu.models import seeder
    from sedef_tpu.models.seeder import initial_search
    from sedef_tpu.native import lib as native
    if not native.has("search_plan"):
        pytest.skip("native library not built")
    rng = np.random.default_rng(100 + trial)

    def rand_seq(n, chars="ACGT"):
        return "".join(rng.choice(list(chars), n))

    fam = rand_seq(900)
    parts_q, parts_r = [], []
    for _ in range(8):
        parts_q.append(rand_seq(400, "acgt"))
        parts_q.append(mutate(fam, 0.03 * (trial % 3), rng))
        parts_r.append(rand_seq(300, "acgt"))
        parts_r.append(mutate(fam, 0.05 + 0.03 * (trial % 3), rng))
    q = "".join(parts_q)
    r = q if trial % 2 == 0 else "".join(parts_r)
    same = trial % 2 == 0
    qh = MinimizerIndex(dna.PackedSeq("q", q), 12, 16)
    rh = MinimizerIndex(dna.PackedSeq("r", r), 12, 16)
    base = [h.to_bed() for h in
            initial_search(qh, rh, same, DEFAULT, use_device=False)]
    monkeypatch.setattr(seeder, "ROLL_DEVICE_MIN", 1)
    dev = [h.to_bed() for h in
           initial_search(qh, rh, same, DEFAULT, use_device=True)]
    assert base == dev
    assert len(base) > 0
