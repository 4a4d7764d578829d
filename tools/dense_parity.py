"""All-stage byte-diff at hg19 seed density (VERDICT r4 item 2, parity
half): a sampled super-bin pair of the dense rehearsal recipe — the
EXACT simulate_genome parameters of tools/hg19_dense_rehearsal.py at
100 Mbp / 2 chromosomes — run through the compiled reference pipeline
(tools/ref_diff.py harness) and run_pipeline; seeds.bed, aligned.bed
and final.bed must be byte-identical.  Result lands in
docs/HG19_DENSE_PARITY.json.

Usage: python tools/dense_parity.py [--mbp=100] [--jobs=2]
       python tools/dense_parity.py --fasta=/tmp/hg19dense/genome.fa \
           --chroms=chrS23,chrS24   # literal super-bin pair of the
                                    # 3 Gbp rehearsal genome
"""

import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs"


def main():
    mbp = 100
    jobs = 2
    for a in sys.argv[1:]:
        if a.startswith("--mbp="):
            mbp = int(a.split("=")[1])
        if a.startswith("--jobs="):
            jobs = int(a.split("=")[1])

    import jax
    jax.config.update("jax_platforms", "cpu")

    from hg19_dense_rehearsal import COPIES, FAMS_PER_50M
    from ref_diff import build_refbin, rows_of, run_reference

    from sedef_tpu.io.fasta import write_fai
    from sedef_tpu.models.genome_sim import simulate_genome, write_fasta
    from sedef_tpu.models.pipeline import run_pipeline

    src_fa = None
    pick = None
    for a in sys.argv[1:]:
        if a.startswith("--fasta="):
            src_fa = a.split("=", 1)[1]
        if a.startswith("--chroms="):
            pick = a.split("=", 1)[1].split(",")

    work = tempfile.mkdtemp(prefix="denseparity_")
    fa = f"{work}/genome.fa"
    t0 = time.time()
    if src_fa:
        # literal sampled super-bin pair: extract the named chromosomes
        # from an existing rehearsal genome
        from sedef_tpu.io.fasta import FastaReference
        src = FastaReference(src_fa)
        chroms = {n: src.get_sequence(n) for n in pick}
        spec_src = f"sample({','.join(pick)} of {src_fa})"
        mbp = sum(len(s) for s in chroms.values()) // 1_000_000
        fams = "literal"
    else:
        length = mbp * 1_000_000
        fams = round(FAMS_PER_50M * length / 50_000_000)
        chroms, _ = simulate_genome(
            length, length // 120_000, sd_min=1300, sd_max=20_000,
            max_divergence=0.12, rc_fraction=0.3, n_chroms=2,
            seed=1905, n_run_every=997_000,
            repeat_families=fams, repeat_copies=COPIES,
            repeat_len=(500, 2500), repeat_div=(0.08, 0.40))
        spec_src = f"sim({mbp}Mbp,2chr,dense:fams{fams}x{COPIES}," \
                   f"seed1905)"
    write_fasta(fa, chroms)
    write_fai(fa)
    print(f"genome {mbp} Mbp dense (fams={fams} x {COPIES}): "
          f"{time.time()-t0:.0f}s, work={work}", flush=True)

    build_refbin()
    nbuckets = 64
    t0 = time.time()
    run_reference(fa, f"{work}/ref", nbuckets, jobs=jobs)
    t_ref = time.time() - t0
    print(f"reference e2e: {t_ref:.0f}s", flush=True)

    t0 = time.time()
    ours = run_pipeline(fa, f"{work}/ours", nbuckets=nbuckets,
                        jobs=jobs, quiet=False)
    t_ours = time.time() - t0
    print(f"ours e2e: {t_ours:.0f}s", flush=True)

    report = {"spec": spec_src, "jobs": jobs,
              "ref_e2e_s": round(t_ref, 1),
              "ours_e2e_s": round(t_ours, 1)}
    ok = True
    for name, rp, op in (("seeds", f"{work}/ref/seeds.bed",
                          ours["seeds"]),
                         ("aligned", f"{work}/ref/aligned.bed",
                          ours["aligned"]),
                         ("final", f"{work}/ref/final.bed",
                          ours["final"])):
        r = rows_of(rp)
        o = rows_of(op)
        report[name] = {"identical": r == o, "rows": len(o)}
        print(f"{name}: {'IDENTICAL' if r == o else 'DIFF'} "
              f"({len(r)} ref / {len(o)} ours rows)", flush=True)
        if r != o:
            ok = False
            rs, os_ = set(r), set(o)
            for ln in sorted(rs - os_)[:3]:
                print("  REF :", ln[:160], flush=True)
            for ln in sorted(os_ - rs)[:3]:
                print("  OURS:", ln[:160], flush=True)
    report["identical_all"] = ok
    DOCS.mkdir(exist_ok=True)
    out_name = ("HG19_DENSE_PARITY_LITERAL.json" if src_fa
                else "HG19_DENSE_PARITY.json")
    with open(DOCS / out_name, "w") as f:
        json.dump(report, f, indent=1)
    print("RESULT:", "IDENTICAL" if ok else f"DIVERGED ({work})",
          flush=True)
    if ok:
        import shutil
        shutil.rmtree(work)


if __name__ == "__main__":
    main()
