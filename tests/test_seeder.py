"""Stage-1 seed search vs the reference search engine compiled from
search.cc/sliding.cc/filter.cc (golden seed fixtures over a two-chromosome
genome with forward/rc duplications, N-runs, soft-masking, and a
same-genome pair)."""

import pytest

from sedef_tpu.io.fasta import FastaReference
from sedef_tpu.models.pipeline import search_job


@pytest.fixture(scope="module")
def multi_fr(fixtures_dir_module):
    return FastaReference(str(fixtures_dir_module / "search" / "multi.fa"))


@pytest.fixture(scope="module")
def fixtures_dir_module():
    import pathlib
    return pathlib.Path(__file__).parent / "fixtures"


@pytest.mark.parametrize("q,r,rc", [
    ("chr1", "chr1", False), ("chr1", "chr1", True),
    ("chr1", "chr2", False), ("chr1", "chr2", True),
    ("chr2", "chr2", False), ("chr2", "chr2", True),
])
def test_search_matches_reference(multi_fr, fixtures_dir_module, q, r, rc):
    tag = "rc" if rc else "fwd"
    golden = (fixtures_dir_module / "search"
              / f"seeds_{q}_{r}_{tag}.bed").read_text().splitlines()
    mine = search_job(multi_fr, [q], [r], rc)
    assert mine == golden


def test_search_toy_genome(fixtures_dir_module):
    """The stats-fixture genome (single chromosome, fwd+rc+N-run dups)."""
    fr = FastaReference(str(fixtures_dir_module / "stats" / "toy.fa"))
    fwd = search_job(fr, ["chr1"], ["chr1"], False)
    rc = search_job(fr, ["chr1"], ["chr1"], True)
    # golden values produced by the reference oracle (see repo history)
    assert len(fwd) == 1 and len(rc) == 1
    assert fwd[0].split("\t")[:6] == ["chr1", "0", "17337", "chr1", "12621",
                                      "28313"]


def test_report_fails_diagnostics():
    """report_fails emits rows with gate-failure comments (search.cc fail
    hits); normal mode returns only OK hits."""
    import numpy as np
    from sedef_tpu.models.seeder import initial_search
    from sedef_tpu.ops.dna import PackedSeq
    from sedef_tpu.ops.index import MinimizerIndex
    rng = np.random.default_rng(3)
    base = "".join(rng.choice(np.array(list("ACGT")), 2500))
    mut = list(base)
    for i in range(len(mut)):
        if rng.random() < 0.2:
            mut[i] = "ACGT"[rng.integers(4)]
    chrom = (base + "".join(rng.choice(np.array(list("ACGT")), 2000))
             + "".join(mut))
    qh = MinimizerIndex(PackedSeq("chrA", chrom), 12, 16)
    diag = initial_search(qh, qh, True, report_fails=True)
    assert any(h.comment.startswith("jaccard") for h in diag)
    normal = initial_search(qh, qh, True)
    assert all(h.comment == "OK" for h in normal)
    ok_diag = [h for h in diag if h.comment == "OK"]
    assert [h.to_bed() for h in ok_diag] != [] or normal == []
