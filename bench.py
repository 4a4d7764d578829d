#!/usr/bin/env python
"""Benchmark: batched anti-diagonal wavefront DP throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: effective GCUPS (LxL useful cells / second) of the alignment
direction-matrix fill, SEDEF scoring (5/-4/40/1), full band, traceback
matrix streamed to HBM — the equivalent of the reference's
ksw2_extz2_sse hot kernel (extern/ksw2_extz2_sse.cc).

Baseline: 1.17 GCUPS = reference ksw2 extz2_sse measured single-core on
this machine (L=1024 global alignments with traceback, -O3 -msse4.1; see
tools/ksw_bench notes in repo history).
"""

import json
import time

import numpy as np

KSW2_SINGLE_CORE_GCUPS = 1.17


def main() -> None:
    import jax

    from sedef_tpu.ops.wavefront import (_padded_rows,
                                         wavefront_pallas_batch,
                                         wavefront_scan_batch)

    on_tpu = jax.default_backend() not in ("cpu",)
    L = 1024
    B = 32 if on_tpu else 2
    rng = np.random.default_rng(0)
    n_rows = _padded_rows(L, L)
    q = rng.integers(0, 4, (B, n_rows)).astype(np.int32)
    t = rng.integers(0, 4, (B, L)).astype(np.int8)
    qd = jax.device_put(q)
    td = jax.device_put(t)

    def run():
        if on_tpu:
            return wavefront_pallas_batch(qd, td, L, L)
        return wavefront_scan_batch(qd, td, L, L)

    # warmup / compile
    out = run()
    jax.block_until_ready(out)

    reps = 8 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    cells = float(B) * L * L * reps
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "wavefront_dp_gcups" + ("" if on_tpu else "_cpu_fallback"),
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / KSW2_SINGLE_CORE_GCUPS, 2),
    }))


if __name__ == "__main__":
    main()
