"""WGAC diff / check-overlap evaluation harness."""

import numpy as np

from sedef_tpu.io.fasta import FastaReference
from sedef_tpu.models.evaluate import check_overlap, diff


def _wgac_row(c1, s1, e1, strand, c2, s2, e2, name, frac=0.95):
    f = [""] * 28
    f[0], f[1], f[2] = c1, str(s1), str(e1)
    f[5] = strand
    f[6], f[7], f[8] = c2, str(s2), str(e2)
    f[16] = name
    f[26] = str(frac)
    return "\t".join(f)


def test_diff_and_overlap(fixtures_dir):
    fr = FastaReference(str(fixtures_dir / "stats" / "toy.fa"))
    final = (fixtures_dir / "stats" / "final_golden.txt"
             ).read_text().splitlines()
    # WGAC truth approximating the two planted pairs of the toy genome
    wgac = ["header",
            _wgac_row("chr1", 5000, 8000, "+", "chr1", 18000, 21150, "sd1"),
            _wgac_row("chr1", 5000, 8000, "-", "chr1", 31150, 34150, "sd2"),
            _wgac_row("chr1", 40000, 42000, "+", "chr1", 44000, 46000,
                      "missing_sd")]
    res = diff(fr, final[1:], wgac)
    assert res.sedef_span > 0 and res.wgac_span > 0
    assert res.intersect > 0.8 * res.sedef_span
    # the fabricated missing_sd contributes wgac_only bases
    assert res.wgac_only >= 3500

    ov = check_overlap(final[1:], wgac)
    assert ov.full >= 1
    assert ov.missed == 1  # the fabricated pair
    assert ov.full + ov.partial + ov.missed == 3
