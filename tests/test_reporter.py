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


def test_stats_rows_gap_split_mode(fixtures_dir):
    """max_ok_gap enabled exercises the recursive gap_split path
    (stats_main.cc:87-157); golden from the reference binary."""
    from sedef_tpu.config import Config
    cfg = Config().finalize()
    cfg.stats.max_ok_gap = 5
    d = fixtures_dir / "stats"
    golden = (d / "final_golden_gap5.txt").read_text().splitlines()
    fr = FastaReference(str(d / "toy.fa"))
    rows = reporter.stats_rows((d / "aligned.bed").read_text().splitlines(),
                               fr, cfg)
    assert rows == golden[1:]
