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
