#!/usr/bin/env python
"""Benchmark: batched anti-diagonal wavefront DP throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: effective GCUPS (LxL useful cells / second) of the alignment
direction-matrix fill, SEDEF scoring (5/-4/40/1), full band, traceback
matrix streamed to HBM — the equivalent of the reference's
ksw2_extz2_sse hot kernel (extern/ksw2_extz2_sse.cc).

Methodology: N kernel invocations are CHAINED inside one jit with a
data dependency and an in-graph checksum, so (a) the kernels cannot be
elided or returned as unfinished async handles, and (b) the host<->device
round trip (~30 ms on this tunneled setup) is amortized.  Naive
dispatch-loop timing inflates the number ~300x on this environment.

Baseline: 1.17 GCUPS = reference ksw2 extz2_sse measured single-core on
this machine (L=1024 global alignments with traceback, -O3 -msse4.1; see
tools/oracles/ksw_bench.cc).
"""

import json
import time

import numpy as np

KSW2_SINGLE_CORE_GCUPS = 1.17

# reference seed stage: ~8.8 s/Mbp-core (hg19 7h33m single core, preprint
# Table 1) => on the e2e workload below (20 Mbp, 4 chroms, 20 pair jobs)
# the reference single-core stage-1 time is ~176 s; pair-jobs/hour follows.
REF_PAIR_JOBS_PER_HOUR = 20 / (20 * 8.8 / 3600.0)


def e2e_metrics() -> dict:
    """End-to-end pipeline wall time + chr-pair-job throughput on a fixed
    20 Mbp 4-chromosome repeat-rich synthetic genome (machine-checked
    across rounds; BASELINE.json metric #2 stand-in)."""
    import tempfile

    from sedef_tpu.config import DEFAULT
    from sedef_tpu.io.fasta import FastaReference, generate_translation
    from sedef_tpu.models import pipeline as pl
    from sedef_tpu.models import reporter
    from sedef_tpu.models.genome_sim import simulate_genome, write_fasta
    from sedef_tpu.ops.wavefront import WavefrontAligner

    chroms, planted = simulate_genome(20_000_000, 20, seed=7, n_chroms=4,
                                      repeat_families=20, repeat_copies=40)
    tmp = tempfile.mkdtemp()
    fa = tmp + "/bench.fa"
    write_fasta(fa, chroms)
    fr = FastaReference(fa)
    bins = generate_translation(fr)
    n_jobs = len(bins) * (len(bins) + 1)  # i>=j x 2 strands

    t0 = time.perf_counter()
    seeds = pl.search_stage(fr, bins, DEFAULT, jobs=2)
    t_search = time.perf_counter() - t0
    buckets = pl.bucket_stage(seeds, fr, bins, 16, DEFAULT)
    flat = [line for b in buckets for line in b]
    aligned = pl.canonical_sort_uniq(
        pl.align_stage(flat, fr, DEFAULT, WavefrontAligner(), jobs=2))
    final = pl.canonical_sort_uniq(reporter.stats_rows(aligned, fr, DEFAULT))
    t_e2e = time.perf_counter() - t0
    from sedef_tpu.models.genome_sim import recall_of
    rec = recall_of(final, planted)
    pair_jobs_per_hour = n_jobs / (t_search / 3600.0)
    return {
        "e2e_20mbp_s": round(t_e2e, 1),
        "stage1_20mbp_s": round(t_search, 1),
        "pair_jobs_per_hour": round(pair_jobs_per_hour),
        "pair_jobs_vs_ref_core": round(
            pair_jobs_per_hour / REF_PAIR_JOBS_PER_HOUR, 1),
        "recall": f"{rec}/{len(planted)}",
    }


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sedef_tpu.ops.wavefront import (_pipe_geometry,
                                         wavefront_pipelined_batch,
                                         wavefront_scan_batch)

    on_tpu = jax.default_backend() not in ("cpu",)
    L = 1024
    rng = np.random.default_rng(0)
    reps = 2
    if on_tpu:
        # production fill: the pipelined (streamed) kernel — K problems
        # per stream staggered by S_q rows so the rotated rectangle's
        # out-of-triangle half is filled by the next problem's triangle
        SUB = 32
        K = 32
        n_streams = 64            # 1024 problems per invocation
        N = 4                     # chained invocations per round trip
        _, _, n_rows_tot, n_i = _pipe_geometry(L, L, K, SUB)
        qs = jax.device_put(
            rng.integers(0, 4, (n_streams, n_rows_tot)).astype(np.int8))
        ti = jax.device_put(
            rng.integers(0, 4, (n_streams, n_rows_tot, n_i))
            .astype(np.int8))

        @jax.jit
        def run_chain(qs, ti):
            def body(i, acc):
                q2 = qs.at[:, 0].set((acc % 4).astype(jnp.int8))
                p = wavefront_pipelined_batch(q2, ti, L, L, K, SUB=SUB)
                return acc + p.astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, N, body, jnp.int32(0))

        args = (qs, ti)
        cells_per_call = float(n_streams) * K * L * L
    else:
        B, N = 2, 2
        from sedef_tpu.ops.wavefront import _padded_rows
        n_rows = _padded_rows(L, L)
        q = jax.device_put(
            rng.integers(0, 4, (B, n_rows)).astype(np.int32))
        t = jax.device_put(rng.integers(0, 4, (B, L)).astype(np.int8))

        @jax.jit
        def run_chain(q, t):
            def body(i, acc):
                q2 = q.at[:, 0].set((acc % 4).astype(jnp.int32))
                p = wavefront_scan_batch(q2, t, L, L)
                return acc + p.astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, N, body, jnp.int32(0))

        args = (q, t)
        cells_per_call = float(B) * L * L

    int(run_chain(*args))  # warmup / compile

    t0 = time.perf_counter()
    acc = 0
    for _ in range(reps):
        acc += int(run_chain(*args))
    dt = time.perf_counter() - t0
    assert acc != 0

    cells = cells_per_call * N * reps
    gcups = cells / dt / 1e9
    extra = {}
    if on_tpu:
        try:
            extra = e2e_metrics()
        except Exception as e:  # pragma: no cover - keep the headline alive
            extra = {"e2e_error": str(e)[:120]}
    print(json.dumps({
        "metric": "wavefront_dp_gcups" + ("" if on_tpu else "_cpu_fallback"),
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / KSW2_SINGLE_CORE_GCUPS, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
