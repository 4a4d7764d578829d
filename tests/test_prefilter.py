"""Recompute-wide device prefilter (ops/prefilter.py).

Three properties:
* soundness — every interval the prefilter prunes is verified to fail the
  Jaccard gate by the scalar SlidingJaccard roll oracle (the bound proof
  of the module docstring, re-checked empirically);
* power — on a repeat-rich workload (the regime where JACCARD_FAILED
  dominates the reference funnel) a meaningful share of intervals is
  pruned without rolling;
* byte parity — initial_search through the prefilter path emits exactly
  the plain native engine's hits.
"""

import numpy as np
import pytest

import test_roll_engine as tre
from sedef_tpu.config import DEFAULT
from sedef_tpu.models import seeder
from sedef_tpu.models.seeder import initial_search
from sedef_tpu.native import lib as native
from sedef_tpu.ops import dna
from sedef_tpu.ops.index import MinimizerIndex


def repeat_rich_pair(rng, rate, n_fams=6, copies=5):
    """Two sequences sharing diverged repeat families — most windows
    cluster candidates but fail the Jaccard gate after the scan."""
    fams = ["".join(rng.choice(list("ACGT"), 800)) for _ in range(n_fams)]
    q_parts, r_parts = [], []
    for f in fams:
        q_parts.append(tre.mutate(f, rate * 0.4, rng))
        q_parts.append("".join(rng.choice(list("ACGT"), 200)))
    for f in fams:
        for _ in range(copies):
            r_parts.append(tre.mutate(f, rate, rng))
            r_parts.append("".join(rng.choice(list("ACGT"), 150)))
    return "".join(q_parts), "".join(r_parts)


@pytest.mark.parametrize("seed,rate", [(0, 0.12), (1, 0.18), (2, 0.22)])
def test_prefilter_sound_and_prunes(seed, rate):
    if not native.has("search_plan"):
        pytest.skip("native library not built")
    rng = np.random.default_rng(seed)
    q, r = repeat_rich_pair(rng, rate)
    cfg = DEFAULT
    k, w = cfg.search.kmer_size, cfg.search.window_size
    qh = MinimizerIndex(dna.PackedSeq("q", q), k, w)
    rh = MinimizerIndex(dna.PackedSeq("r", r), k, w)
    plan = native.search_plan(qh, rh, False, cfg)
    win, iv = plan
    assert len(iv), "no intervals planned - test setup broken"

    bj, bs, ok = seeder._device_prefilter_results(qh, rh, plan, cfg)
    pruned = np.nonzero(ok & (bj < 0))[0]

    # soundness: every pruned interval's roll must end jaccard < 0
    woff = np.repeat(np.arange(len(win)), win[:, 3])
    init_len = cfg.search.min_read_size
    for i in pruned:
        qws, qwe = int(win[woff[i], 1]), int(win[woff[i], 2])
        t0, t1 = int(iv[i, 0]), int(iv[i, 1])
        ebj, _ = tre.scalar_roll(qh, rh, qws, qwe, t0, t1, init_len, cfg)
        assert ebj < 0, (
            f"interval {i} pruned but scalar roll found jaccard {ebj} >= 0")

    # power: high-divergence repeat intervals must mostly be pruned
    assert len(pruned) > 0, "prefilter pruned nothing on a fail-heavy input"
    if rate >= 0.18:
        assert len(pruned) >= len(iv) // 4, (
            f"only {len(pruned)}/{len(iv)} pruned at rate {rate}")


def test_prefilter_sound_masked_and_n():
    """Soft-masked + N-run inputs: HAS_N ref keys never count as matches,
    lowercase statuses are part of the key."""
    if not native.has("search_plan"):
        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    chars = list("ACGTacgt")
    base = "".join(rng.choice(chars, 1600))
    q = ("".join(rng.choice(chars, 300)) + base + "N" * 40
         + tre.mutate(base, 0.2, rng))
    r = ("".join(rng.choice(chars, 400)) + tre.mutate(base, 0.22, rng)
         + "N" * 25 + tre.mutate(base, 0.12, rng))
    cfg = DEFAULT
    qh = MinimizerIndex(dna.PackedSeq("q", q), 12, 16)
    rh = MinimizerIndex(dna.PackedSeq("r", r), 12, 16)
    plan = native.search_plan(qh, rh, False, cfg)
    win, iv = plan
    if not len(iv):
        pytest.skip("no intervals on this seed")
    bj, bs, ok = seeder._device_prefilter_results(qh, rh, plan, cfg)
    woff = np.repeat(np.arange(len(win)), win[:, 3])
    for i in np.nonzero(ok & (bj < 0))[0]:
        qws, qwe = int(win[woff[i], 1]), int(win[woff[i], 2])
        ebj, _ = tre.scalar_roll(qh, rh, qws, qwe, int(iv[i, 0]),
                                 int(iv[i, 1]), cfg.search.min_read_size,
                                 cfg)
        assert ebj < 0, i


@pytest.mark.parametrize("trial", range(4))
def test_prefilter_search_byte_identical(trial, monkeypatch):
    """Production path: initial_search with the device prefilter must emit
    byte-identical hits to the plain native engine, including same-genome
    runs where hit-tree pruning forces plan desyncs."""
    if not native.has("search_plan"):
        pytest.skip("native library not built")
    rng = np.random.default_rng(300 + trial)

    def rand_seq(n, chars="ACGT"):
        return "".join(rng.choice(list(chars), n))

    fam = rand_seq(900)
    parts_q, parts_r = [], []
    for _ in range(8):
        parts_q.append(rand_seq(400, "acgt"))
        parts_q.append(tre.mutate(fam, 0.03 * (trial % 3), rng))
        parts_r.append(rand_seq(300, "acgt"))
        parts_r.append(tre.mutate(fam, 0.05 + 0.03 * (trial % 3), rng))
    q = "".join(parts_q)
    r = q if trial % 2 == 0 else "".join(parts_r)
    same = trial % 2 == 0
    qh = MinimizerIndex(dna.PackedSeq("q", q), 12, 16)
    rh = MinimizerIndex(dna.PackedSeq("r", r), 12, 16)
    base = [h.to_bed() for h in
            initial_search(qh, rh, same, DEFAULT, use_device=False)]
    monkeypatch.setattr(seeder, "PREFILTER_ON", True)
    monkeypatch.setattr(seeder, "PREFILTER_MIN_STEPS", 0)
    dev = [h.to_bed() for h in
           initial_search(qh, rh, same, DEFAULT, use_device=True)]
    assert base == dev
    assert len(base) > 0


def test_search_job_two_phase_byte_identical(monkeypatch, tmp_path):
    """search_job's two-phase loop (async prepare_device_search for every
    chromosome pair, then collect+search) must emit exactly the host
    engine's seed lines, across multiple chromosomes and both strands."""
    if not native.has("search_plan"):
        pytest.skip("native library not built")
    from sedef_tpu.io.fasta import FastaReference, generate_translation
    from sedef_tpu.models import pipeline as pl
    from sedef_tpu.models.genome_sim import simulate_genome, write_fasta

    chroms, _ = simulate_genome(1_200_000, 6, seed=5, n_chroms=3,
                                repeat_families=4, repeat_copies=12,
                                repeat_div=(0.05, 0.30))
    fa = str(tmp_path / "g.fa")
    write_fasta(fa, chroms)
    fr = FastaReference(fa)
    bins = generate_translation(fr)
    host = pl.search_stage(fr, bins, DEFAULT, use_device=False)
    monkeypatch.setattr(seeder, "PREFILTER_ON", True)
    monkeypatch.setattr(seeder, "PREFILTER_MIN_STEPS", 0)
    dev = pl.search_stage(fr, bins, DEFAULT, use_device=True, jobs=2)
    assert host == dev
    assert len(host) > 0


def test_prefilter_byte_identical_repeat_heavy(monkeypatch):
    """Fail-heavy repeat workload through the full production dispatch:
    the pruned intervals must not change the output."""
    if not native.has("search_plan"):
        pytest.skip("native library not built")
    rng = np.random.default_rng(42)
    q, r = repeat_rich_pair(rng, 0.22)
    qh = MinimizerIndex(dna.PackedSeq("q", q), 12, 16)
    rh = MinimizerIndex(dna.PackedSeq("r", r), 12, 16)
    base = [h.to_bed() for h in
            initial_search(qh, rh, False, DEFAULT, use_device=False)]
    monkeypatch.setattr(seeder, "PREFILTER_ON", True)
    monkeypatch.setattr(seeder, "PREFILTER_MIN_STEPS", 0)
    dev = [h.to_bed() for h in
           initial_search(qh, rh, False, DEFAULT, use_device=True)]
    assert base == dev
