"""Multi-host execution: chromosome-pair jobs sharded across JAX processes.

The reference scales across machines only by hand-partitioning job lists
(GNU Parallel per host, filesystem barriers — SURVEY §2.2 C1).  Here each
host runs a JAX process (``jax.distributed``), takes a deterministic
interleaved slice of the (bin_i, bin_j, strand) job matrix for stage 1 and
of the complexity-balanced buckets for stage 2b, and stage boundaries are
DCN all-gathers of the BED line sets; stage 3 runs on process 0.

Degenerate single-process mode (process_count == 1) needs no
initialization and is what CI exercises; pod-slice runs call
:func:`init_distributed` first on every host.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..config import DEFAULT, Config
from ..io.fasta import FastaReference, generate_translation
from ..models import pipeline as pl
from ..models import reporter


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper; no-op when single-process env
    vars/arguments are absent."""
    if num_processes is None and coordinator_address is None:
        return  # single host
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def gather_lines(local_lines: list[str]) -> list[str]:
    """All-gather variable-length text lines across processes (DCN stage
    barrier).  Identity when single-process."""
    pid, pcount = process_info()
    if pcount == 1:
        return list(local_lines)
    from jax.experimental import multihost_utils

    blob = ("\n".join(local_lines)).encode()
    n = np.int64(len(blob))
    sizes = multihost_utils.process_allgather(n)
    maxlen = int(sizes.max())
    buf = np.zeros(maxlen, dtype=np.uint8)
    buf[:len(blob)] = np.frombuffer(blob, dtype=np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out: list[str] = []
    for i in range(pcount):
        raw = bytes(gathered[i][:int(sizes[i])])
        if raw:
            out.extend(raw.decode().split("\n"))
    return out


def _my_slice(items: list, pid: int, pcount: int) -> list:
    """Deterministic interleaved shard (round-robin keeps the reference's
    complexity balancing intact for buckets)."""
    return [x for i, x in enumerate(items) if i % pcount == pid]


def run_pipeline_distributed(fasta_path: str, out_dir: str,
                             cfg: Config = DEFAULT, nbuckets: int = 1000,
                             jobs: int = 1, aligner=None) -> dict[str, str]:
    """Pod-slice pipeline: every process executes this identically."""
    pid, pcount = process_info()
    os.makedirs(out_dir, exist_ok=True)
    fr = FastaReference(fasta_path)
    bins = generate_translation(fr)
    nbins = len(bins)

    # stage 1: shard the (i, j, strand) job matrix
    todo = [(i, j, rc)
            for j in range(nbins)
            for i in range(j, nbins)
            for rc in (False, True)]
    my_jobs = _my_slice(todo, pid, pcount)
    local_seeds: list[str] = []
    for (i, j, rc) in my_jobs:
        local_seeds.extend(pl.search_job(fr, bins[i], bins[j], rc, cfg))
    seed_lines = gather_lines(local_seeds)
    # deterministic global order regardless of process interleave
    seed_lines = sorted(seed_lines)

    # stage 2a runs identically everywhere (deterministic on sorted input)
    buckets = pl.bucket_stage(seed_lines, fr, bins, nbuckets, cfg)

    # stage 2b: shard buckets
    my_buckets = _my_slice(list(enumerate(buckets)), pid, pcount)
    local_aligned: list[str] = []
    for _, bucket in my_buckets:
        local_aligned.extend(pl.align_stage(bucket, fr, cfg, aligner))
    aligned = pl.canonical_sort_uniq(gather_lines(local_aligned))

    paths = {"seeds": os.path.join(out_dir, "seeds.bed"),
             "aligned": os.path.join(out_dir, "aligned.bed"),
             "final": os.path.join(out_dir, "final.bed")}
    if pid == 0:
        with open(paths["seeds"], "w") as f:
            f.write("\n".join(seed_lines) + ("\n" if seed_lines else ""))
        with open(paths["aligned"], "w") as f:
            f.write("\n".join(aligned) + ("\n" if aligned else ""))
        final_rows = pl.canonical_sort_uniq(
            reporter.stats_rows(aligned, fr, cfg))
        with open(paths["final"], "w") as f:
            f.write(reporter.HEADER + "\n")
            f.write("\n".join(final_rows) + ("\n" if final_rows else ""))
    return paths
