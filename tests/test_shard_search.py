"""Query-range sharded stage-1 search: byte-identity with the sequential
native engine, including the speculative-fixpoint rerun path.

The interface soundness claim (native.cc search_core): the search loop's
only cross-iteration state is (stride position, dedup-tree rectangles),
so chaining ranges with each other's outgoing state IS the sequential
run.  These tests exercise both the chained-exact path and the
speculative driver across sparse and dense-repeat workloads, forward /
reverse-complement, and same-genome self-search.
"""

import numpy as np
import pytest

from sedef_tpu.config import DEFAULT
from sedef_tpu.models import seeder
from sedef_tpu.models.seeder import initial_search, sharded_pair_search
from sedef_tpu.native import lib as native
from sedef_tpu.ops import dna
from sedef_tpu.ops.index import MinimizerIndex

if not native.has("search_range"):  # pragma: no cover
    pytest.skip("native library not built", allow_module_level=True)


def mutate(s, rate, rng):
    out = []
    for ch in s:
        r = rng.random()
        if r < rate * 0.7:
            out.append("ACGT"[rng.integers(4)])
        elif r < rate * 0.85:
            continue
        elif r < rate:
            out.append(ch)
            out.append("ACGT"[rng.integers(4)])
        else:
            out.append(ch)
    return "".join(out)


def _rc(s):
    from sedef_tpu.ops.dna import revcomp
    return revcomp(s)


def sparse_pair(rng, rc=False):
    fam = "".join(rng.choice(list("ACGT"), 1200))
    lo = lambda n: "".join(rng.choice(list("acgt"), n))
    cp = (lambda s: _rc(s)) if rc else (lambda s: s)
    q = lo(4000) + mutate(fam, 0.05, rng) + lo(6000) \
        + mutate(fam, 0.10, rng) + lo(4000)
    r = lo(5000) + cp(mutate(fam, 0.08, rng)) + lo(7000)
    return q, r


def dense_pair(rng, rc=False):
    fam = "".join(rng.choice(list("ACGT"), 800))
    cp = (lambda s: _rc(s)) if rc else (lambda s: s)
    parts_q, parts_r = [], []
    for _ in range(12):
        parts_q.append("".join(rng.choice(list("acgt"), 250)))
        parts_q.append(mutate(fam, 0.06, rng))
        parts_r.append("".join(rng.choice(list("acgt"), 200)))
        parts_r.append(cp(mutate(fam, 0.10, rng)))
    return "".join(parts_q), "".join(parts_r)


@pytest.mark.parametrize("make,same,rc,n_shards", [
    (sparse_pair, False, False, 4),
    (sparse_pair, False, True, 4),
    (dense_pair, False, False, 6),
    (dense_pair, False, True, 3),
])
def test_sharded_matches_sequential(make, same, rc, n_shards):
    rng = np.random.default_rng(hash((same, rc, n_shards)) % 10000)
    q, r = make(rng, rc=rc)
    qh = MinimizerIndex(dna.PackedSeq("q", q), 12, 16)
    rh = MinimizerIndex(dna.PackedSeq("r", r, is_rc=rc), 12, 16)
    base = [h.to_bed() for h in initial_search(qh, rh, same, DEFAULT,
                                               use_device=False)]
    got = [h.to_bed() for h in
           sharded_pair_search(qh, rh, same, DEFAULT, n_shards=n_shards)]
    assert got == base
    assert len(base) > 0


def test_sharded_same_genome_self():
    rng = np.random.default_rng(77)
    q, _ = dense_pair(rng)
    qh = MinimizerIndex(dna.PackedSeq("q", q), 12, 16)
    base = [h.to_bed() for h in initial_search(qh, qh, True, DEFAULT,
                                               use_device=False)]
    got = [h.to_bed() for h in
           sharded_pair_search(qh, qh, True, DEFAULT, n_shards=5)]
    assert got == base
    assert len(base) > 0


def test_chained_interface_is_exact():
    """Chaining shards with TRUE incoming state (no speculation) equals
    the sequential run — the core soundness claim, without the driver."""
    rng = np.random.default_rng(5)
    q, r = dense_pair(rng)
    qh = MinimizerIndex(dna.PackedSeq("q", q), 12, 16)
    rh = MinimizerIndex(dna.PackedSeq("r", r), 12, 16)
    rows = native.search(qh, rh, False, DEFAULT)
    bounds = seeder.shard_bounds(qh, 7)
    nxt, tree = 0, np.empty((0, 4), np.int32)
    chained = []
    for c in range(len(bounds) - 1):
        hits, nxt, tree, _ = native.search_range(
            qh, rh, False, DEFAULT, bounds[c], bounds[c + 1], nxt, tree)
        chained.extend(map(tuple, hits))
    assert chained == list(map(tuple, rows))
    assert len(chained) > 0


def test_sharded_with_executor():
    from concurrent.futures import ThreadPoolExecutor
    rng = np.random.default_rng(13)
    q, r = dense_pair(rng)
    qh = MinimizerIndex(dna.PackedSeq("q", q), 12, 16)
    rh = MinimizerIndex(dna.PackedSeq("r", r), 12, 16)
    base = [h.to_bed() for h in initial_search(qh, rh, False, DEFAULT,
                                               use_device=False)]
    times: list = []
    with ThreadPoolExecutor(max_workers=4) as ex:
        got = [h.to_bed() for h in
               sharded_pair_search(qh, rh, False, DEFAULT, n_shards=8,
                                   submit=ex.submit, unit_times=times)]
    assert got == base
    assert len(times) >= 2 and all(t >= 0 for t in times)


def test_counters_match_sequential():
    from sedef_tpu.ops import filter as filt
    rng = np.random.default_rng(21)
    q, r = dense_pair(rng)
    qh = MinimizerIndex(dna.PackedSeq("q", q), 12, 16)
    rh = MinimizerIndex(dna.PackedSeq("r", r), 12, 16)
    filt.COUNTERS.reset()
    initial_search(qh, rh, False, DEFAULT, use_device=False)
    seq_counts = {k: filt.COUNTERS[k] for k in filt.COUNTERS}
    filt.COUNTERS.reset()
    sharded_pair_search(qh, rh, False, DEFAULT, n_shards=6)
    shard_counts = {k: filt.COUNTERS[k] for k in filt.COUNTERS}
    assert shard_counts == seq_counts


def test_search_stage_sharded_byte_identical(tmp_path):
    """The sharded stage driver (pipeline._search_stage_sharded) streams
    byte-identical output in deterministic job order, with unit
    accounting for the multi-chip balance metric."""
    from sedef_tpu.io.fasta import FastaReference, generate_translation
    from sedef_tpu.models import pipeline as pl
    from sedef_tpu.models.genome_sim import simulate_genome, write_fasta

    chroms, _ = simulate_genome(1_200_000, 6, seed=9, n_chroms=3,
                                repeat_families=4, repeat_copies=12,
                                repeat_div=(0.05, 0.30))
    fa = str(tmp_path / "g.fa")
    write_fasta(fa, chroms)
    fr = FastaReference(fa)
    bins = generate_translation(fr)
    base = pl.search_stage(fr, bins, DEFAULT, use_device=False)
    report: list = []
    sunk: list = []
    n = pl.search_stage(fr, bins, DEFAULT, use_device=False, jobs=2,
                        shard_bp=100_000, unit_report=report,
                        sink=lambda job: sunk.extend(job))
    assert sunk == base
    assert n == len(base)
    assert len(report) > len(bins) * (len(bins) + 1)  # finer than jobs
    ks = [u[0] for u in report]
    assert ks == sorted(ks)  # unit report in job order
