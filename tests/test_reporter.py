"""Stage-3 reporter vs the reference stats-generate binary (golden fixture
covering N-run splitting, forward and reverse-complement hits, and the
per-base statistics columns)."""

from sedef_tpu.io.fasta import FastaReference
from sedef_tpu.models import reporter


def test_stats_rows_match_reference(fixtures_dir):
    d = fixtures_dir / "stats"
    golden = (d / "final_golden.txt").read_text().splitlines()
    assert golden[0] == reporter.HEADER
    fr = FastaReference(str(d / "toy.fa"))
    lines = (d / "aligned.bed").read_text().splitlines()
    rows = reporter.stats_rows(lines, fr)
    assert rows == golden[1:]
