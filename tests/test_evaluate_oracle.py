"""Golden-oracle validation of the WGAC evaluation (VERDICT r4 item 6).

``evaluate.diff`` is checked number-for-number against the REFERENCE
``stats diff`` path (stats_main.cc:397-509, get_differences) compiled
live from /root/reference (tools/oracles/diff_oracle.cc) — same
discipline as every pipeline stage's golden fixture.  The WGAC inputs
exercise the alt-contig name filter, duplicate-name dedup, coordinate
clamping past the chromosome end, and the isupper-counts-N quirk of the
>=100-uppercase filter.

``check_overlap`` has no compilable reference (check-overlap.py needs
bedtools, not installed): it is pinned by construction-based property
tests below instead.
"""

import pathlib
import re
import subprocess

import numpy as np
import pytest

from sedef_tpu.io.fasta import FastaReference, write_fai
from sedef_tpu.models.evaluate import check_overlap, diff

_ORACLE = "/tmp/sedef_diff_oracle"
_REF = "/root/reference"


@pytest.fixture(scope="session")
def diff_oracle():
    if not pathlib.Path(_REF).exists():  # pragma: no cover
        pytest.skip("reference sources not mounted")
    if not pathlib.Path(_ORACLE).exists():
        oracles = (pathlib.Path(__file__).resolve().parent.parent
                   / "tools" / "oracles")
        srcs = ["stats_main.cc", "align.cc", "hit.cc", "hash.cc",
                "fasta.cc", "globals.cc", "merge.cc"]
        cmd = (["g++", "-std=c++14", "-O2", "-msse4.1", "-include",
                "algorithm", f"-I{_REF}/src", f"-I{_REF}",
                f"-I{oracles}/fakeboost", str(oracles / "diff_oracle.cc")]
               + [f"{_REF}/src/{s}" for s in srcs]
               + [f"{_REF}/extern/format.cc",
                  f"{_REF}/extern/ksw2_extz2_sse.cc", "-o", _ORACLE])
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:  # pragma: no cover
            pytest.skip(f"oracle build failed: {r.stderr[-300:]}")
    return _ORACLE


def _rand_chrom(rng, n, n_runs=2):
    """Mixed-case DNA with uppercase islands and N runs."""
    seq = rng.choice(np.array(list("acgt")), n)
    for _ in range(6):  # uppercase islands
        s = int(rng.integers(0, n - 2000))
        ln = int(rng.integers(500, 2000))
        seq[s:s + ln] = [c.upper() for c in seq[s:s + ln]]
    for _ in range(n_runs):
        s = int(rng.integers(0, n - 500))
        seq[s:s + int(rng.integers(100, 400))] = "N"
    return "".join(seq)


def _bed_row(c1, s1, e1, c2, s2, e2, rc=False):
    """Minimal aligned.bed-format row the reference Hit::from_bed
    accepts (14 columns; hit.cc:66-96)."""
    strand2 = "-" if rc else "+"
    return "\t".join(map(str, [
        c1, s1, e1, c2, s2, e2, "hit", 0, "+", strand2,
        max(e1 - s1, e2 - s2), 0, "", ""]))


def _wgac_row(c1, s1, e1, c2, s2, e2, name, strand="+", frac=0.93):
    f = [""] * 29
    f[0], f[1], f[2] = c1, str(s1), str(e1)
    f[5] = strand
    f[6], f[7], f[8] = c2, str(s2), str(e2)
    f[16] = name
    f[26] = str(frac)
    return "\t".join(f)


def test_diff_matches_reference_oracle(diff_oracle, tmp_path):
    rng = np.random.default_rng(77)
    chroms = {"chr1": _rand_chrom(rng, 120_000),
              "chr2": _rand_chrom(rng, 90_000),
              # long name: must be dropped by the alt-contig filter
              "chr1_gl1": _rand_chrom(rng, 30_000, n_runs=0)}
    fa = str(tmp_path / "g.fa")
    with open(fa, "w") as f:
        for name, seq in chroms.items():
            f.write(f">{name}\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i:i + 70] + "\n")
    write_fai(fa)
    fr = FastaReference(fa)

    bed = []
    wgac = ["HEADER ROW (always skipped)"]
    for t in range(40):
        c1 = "chr1" if rng.random() < 0.6 else "chr2"
        c2 = "chr1" if rng.random() < 0.6 else "chr2"
        s1 = int(rng.integers(0, fr.length(c1) - 6000))
        s2 = int(rng.integers(0, fr.length(c2) - 6000))
        l1 = int(rng.integers(800, 6000))
        l2 = int(rng.integers(800, 6000))
        if t % 3 == 0:
            bed.append(_bed_row(c1, s1, s1 + l1, c2, s2, s2 + l2,
                                rc=bool(rng.random() < 0.3)))
        if t % 3 != 1:
            wgac.append(_wgac_row(c1, s1 + 200, s1 + 200 + l1, c2,
                                  s2 + 200, s2 + 200 + l2, f"align_{t}",
                                  strand="-" if rng.random() < 0.3
                                  else "+"))
    # clamping: a row running past the chromosome end
    bed.append(_bed_row("chr2", fr.length("chr2") - 3000,
                        fr.length("chr2") + 2500, "chr1", 1000, 4000))
    # duplicate WGAC names: second occurrence must be ignored
    wgac.append(_wgac_row("chr1", 5000, 9000, "chr2", 5000, 9000,
                          "align_2"))
    # alt-contig rows: dropped by the len>6 name filter
    wgac.append(_wgac_row("chr1_gl1", 100, 2000, "chr1", 100, 2000,
                          "alt_1"))
    bed_path = tmp_path / "final.bed"
    bed_path.write_text("#header\n" + "\n".join(bed) + "\n")
    wgac_path = tmp_path / "wgac.tab"
    wgac_path.write_text("\n".join(wgac) + "\n")

    r = subprocess.run([diff_oracle, fa, str(bed_path), str(wgac_path)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-400:]
    nums = [int(m.replace(",", "")) for m in
            re.findall(r"(\d[\d,]*)\s*$", r.stderr, re.M)]
    assert len(nums) >= 7, r.stderr[-600:]
    (ref_span, ref_only, ref_extra_up, ref_miss, ref_miss_up,
     ref_wspan, ref_inter) = nums[-7:]

    got = diff(fr, bed_path.read_text().splitlines(),
               wgac_path.read_text().splitlines())
    assert (got.sedef_span, got.sedef_only, got.sedef_extra_upper,
            got.wgac_only, got.miss_upper, got.wgac_span,
            got.intersect) == (ref_span, ref_only, ref_extra_up,
                               ref_miss, ref_miss_up, ref_wspan,
                               ref_inter)
    assert got.sedef_span > 0 and got.wgac_span > 0
    assert got.intersect > 0  # the t%3==0 & t%3==2 overlap classes


def test_check_overlap_classification_properties():
    """Construction-pinned behavior of the bedtools-semantics
    classifier: Full needs >=80% reciprocal coverage on BOTH mates via
    pairings overlapping both; Partial needs any coverage; coverage
    accumulates across multiple calls; a call overlapping only one mate
    contributes nothing."""
    wgac = ["h",
            _wgac_row("chr1", 1000, 2000, "chr1", 5000, 6000, "full"),
            _wgac_row("chr1", 10000, 12000, "chr1", 20000, 22000,
                      "partial"),
            _wgac_row("chr2", 0, 1000, "chr2", 3000, 4000, "missed"),
            _wgac_row("chr2", 50000, 51000, "chr2", 60000, 61000,
                      "one-sided")]
    final = [
        # covers "full" completely
        "\t".join(map(str, ["chr1", 900, 2100, "chr1", 4900, 6100,
                            0, 0, "+", "+"])),
        # two calls that TOGETHER cover 50% of "partial"'s mates
        "\t".join(map(str, ["chr1", 10000, 10500, "chr1", 20000, 20500,
                            0, 0, "+", "+"])),
        "\t".join(map(str, ["chr1", 10500, 11000, "chr1", 20500, 21000,
                            0, 0, "+", "+"])),
        # overlaps only ONE mate of "one-sided": must not count at all
        "\t".join(map(str, ["chr2", 50000, 51000, "chr2", 70000, 71000,
                            0, 0, "+", "+"])),
    ]
    res = check_overlap(final, wgac)
    assert (res.full, res.partial, res.missed) == (1, 1, 2)
    # partial covered 1000 of 2000 per mate -> 2000 missed bases; the
    # two missed SDs contribute their full spans
    assert res.missed_bases == 2000 + 2000 + 2000
    assert ("chr2", 0, 1000) in [k[0] for k in res.missed_list] or \
           any("chr2" in str(k) for k in res.missed_list)


def test_check_overlap_symmetric_mates():
    """A WGAC pair listed (A,B) must match a call listed (B,A): the
    classifier indexes both orientations."""
    wgac = ["h", _wgac_row("chr1", 1000, 2000, "chr2", 3000, 4000, "x")]
    final = ["\t".join(map(str, ["chr2", 2900, 4100, "chr1", 900, 2100,
                                 0, 0, "+", "+"]))]
    res = check_overlap(final, wgac)
    assert (res.full, res.partial, res.missed) == (1, 0, 0)
