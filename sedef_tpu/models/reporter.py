"""Stage-3 reporting: split alignments, per-base statistics, final BEDPE.

Equivalent of ``src/stats_main.cc``: reconstruct alignments from CIGARs,
split at assembly gaps (>=100 bp N-runs) and oversized alignment gaps,
compute per-base tallies (fracMatch, Jukes-Cantor, Kimura 2-parameter,
transitions/transversions, uppercase counts) with vectorized column scans,
apply quality gates, and emit the 34-column BEDPE rows of ``final.bed``.
"""

from __future__ import annotations

import math

import numpy as np

from ..config import DEFAULT, Config
from ..io.bed import Hit
from ..io.fasta import FastaReference
from ..ops.cigar import Alignment
from ..ops.dna import revcomp

_DASH = ord("-")
_N = ord("N")


def subhit(hin: Hit, start: int, end: int) -> Hit | None:
    """Alignment-column sub-slice with CIGAR rebuild and re-trim
    (stats_main.cc:33-85)."""
    if end >= len(hin.aln.alignment):
        end = len(hin.aln.alignment)
    if start >= end:
        return None
    h = Hit(hin.query, hin.query_start, hin.query_end, hin.ref,
            hin.ref_start, hin.ref_end, hin.jaccard, hin.name, hin.comment,
            hin.aln.copy())
    ga = np.frombuffer(h.aln.align_a.encode(), dtype=np.uint8)
    gb = np.frombuffer(h.aln.align_b.encode(), dtype=np.uint8)
    a_nongap = ga[:end] != _DASH
    b_nongap = gb[:end] != _DASH
    sa = int(a_nongap[:start].sum())
    la = int(a_nongap[start:end].sum())
    sb = int(b_nongap[:start].sum())
    lb = int(b_nongap[start:end].sum())

    h.aln.align_a = h.aln.align_a[start:end]
    h.aln.alignment = h.aln.alignment[start:end]
    h.aln.align_b = h.aln.align_b[start:end]
    h.aln.a = h.aln.a[sa:sa + la]
    h.aln.start_a = 0
    h.aln.end_a = la
    h.aln.b = h.aln.b[sb:sb + lb]
    h.aln.start_b = 0
    h.aln.end_b = lb
    h.aln.cigar_from_alignment()
    h.aln.trim_back()
    h.aln.trim_front()

    h.query_start += sa
    h.query_end = h.query_start + la
    assert not h.query.is_rc
    if h.ref.is_rc:
        h.ref_start = h.ref_end - (lb + sb)
        h.ref_end = h.ref_end - sb
    else:
        h.ref_start += sb
        h.ref_end = h.ref_start + lb
    return h


def gap_split(h: Hit, cfg: Config = DEFAULT) -> list[Hit]:
    """Recursive split at large alignment gaps (stats_main.cc:87-157);
    disabled by default (MAX_OK_GAP == -1)."""
    if cfg.stats.max_ok_gap <= -1:
        return [h]
    gaps = []
    start_a, start_b, start = h.aln.start_a, h.aln.start_b, 0
    for op, ln in h.aln.cigar:
        if ln and op != "M":
            if op != "D":
                ga = (start_a, start_b, 0, ln, start, ln)
            else:
                ga = (start_a, start_b, ln, 0, start, ln)
            gaps.append(ga)
        if op != "D":
            start_b += ln
        if op != "I":
            start_a += ln
        start += ln
    gaps.sort(key=lambda g: -g[5])

    denom = (h.aln.matches() + h.aln.gap_bases() + h.aln.mismatches())
    for (g_sa, g_sb, g_la, g_lb, g_start, g_len) in gaps:
        if (g_sa - h.aln.start_a < cfg.stats.min_split_size
                or g_sb - h.aln.start_b < cfg.stats.min_split_size):
            continue
        if (h.aln.end_a - (g_sa + g_la) < cfg.stats.min_split_size
                or h.aln.end_b - (g_sb + g_lb) < cfg.stats.min_split_size):
            continue
        g_score = 100.0 * g_len / denom if denom else 0.0
        if g_score >= cfg.stats.max_ok_gap:
            out = []
            left = subhit(h, 0, g_start)
            assert left is not None
            out.extend(gap_split(left, cfg))
            right = subhit(h, g_start + g_len, len(h.aln.alignment))
            assert right is not None
            out.extend(gap_split(right, cfg))
            return out
    return [h]


def _n_run_events(arr: np.ndarray, min_gap: int) -> list[tuple[int, int]]:
    """(end_index, run_len) for N-runs >= min_gap that END at a non-N
    column (open-ended trailing runs never fire, like the reference's
    per-column reset logic)."""
    is_n = arr == _N
    if not is_n.any():
        return []
    d = np.diff(is_n.astype(np.int8))
    starts = np.nonzero(d == 1)[0] + 1
    ends = np.nonzero(d == -1)[0] + 1
    if is_n[0]:
        starts = np.concatenate([[0], starts])
    if is_n[-1]:
        ends = np.concatenate([ends, [len(arr)]])  # trailing run: no event
        starts, ends = starts[:-1], ends[:-1]
    out = []
    for st, en in zip(starts.tolist(), ends.tolist()):
        if en - st >= min_gap:
            out.append((en, en - st))
    return out


def split_alignment(h: Hit, cfg: Config = DEFAULT) -> list[Hit]:
    """Split at >=100 bp N-runs in either mate (stats_main.cc:159-211).

    Vectorized: the reference's per-column scan fires a split exactly at
    the first non-N column after a long run, a-runs checked before b-runs
    within the same column."""
    hits: list[Hit] = []
    ga = np.frombuffer(h.aln.align_a.upper().encode(), dtype=np.uint8)
    gb = np.frombuffer(h.aln.align_b.upper().encode(), dtype=np.uint8)
    min_gap = cfg.stats.min_assembly_gap_size
    events = ([(i, 0, ln) for i, ln in _n_run_events(ga, min_gap)]
              + [(i, 1, ln) for i, ln in _n_run_events(gb, min_gap)])
    events.sort()  # by end index; a (tag 0) before b (tag 1) per column
    hit_begin = 0
    for (i, _, run_len) in events:
        hh = subhit(h, hit_begin, i - run_len)
        if hh is not None:
            hits.append(hh)
        hit_begin = i
    if not hit_begin:
        hits.append(h)
    else:
        hh = subhit(h, hit_begin, len(h.aln.alignment))
        if hh is not None:
            hits.append(hh)

    out: list[Hit] = []
    for hh in hits:
        out.extend(gap_split(hh, cfg))
    return out


def _fmt(x: float) -> str:
    """Vendored-fmtlib '{}' double formatting == printf %g (6 significant
    digits); x86 0.0/0.0 prints as -nan."""
    if math.isnan(x):
        return "-nan"
    return f"{x:g}"


def process(hs: Hit, cigar: str, fr: FastaReference,
            cfg: Config = DEFAULT) -> list[str]:
    """Per-hit stats + filters -> zero or more final.bed rows
    (stats_main.cc:213-336)."""
    qe = min(hs.query_end, fr.length(hs.query.name))
    re_ = min(hs.ref_end, fr.length(hs.ref.name))
    hs.query_end, hs.ref_end = qe, re_
    fa = fr.get_sequence(hs.query.name, hs.query_start, qe)
    fb = fr.get_sequence(hs.ref.name, hs.ref_start, re_)
    assert not hs.query.is_rc
    if hs.ref.is_rc:
        fb = revcomp(fb)
    assert cigar
    hs.aln = Alignment.from_cigar(fa, fb, cigar)

    rows = []
    for h in split_alignment(hs, cfg):
        if len(h.aln.alignment) < cfg.chain.refine.min_read:
            continue
        ga = np.frombuffer(h.aln.align_a.encode(), dtype=np.uint8)
        gb = np.frombuffer(h.aln.align_b.encode(), dtype=np.uint8)
        gau = np.where((ga >= 97) & (ga <= 122), ga - 32, ga)
        gbu = np.where((gb >= 97) & (gb <= 122), gb - 32, gb)
        align_length = len(ga)

        a_gap = gau == _DASH
        b_gap = gbu == _DASH
        both = ~a_gap & ~b_gap
        indel_a = int(a_gap.sum())
        indel_b = int(b_gap.sum())
        matchB = int((~a_gap & (gau == gbu)).sum())
        upper_a = (ga >= 65) & (ga <= 90)
        upper_b = (gb >= 65) & (gb <= 90)
        uppercaseA = int((~a_gap & (gau != _N) & upper_a).sum())
        uppercaseB = int((~b_gap & (gbu != _N) & upper_b).sum())
        alignB = int(both.sum())
        mism = both & (gau != gbu)
        mismatchB = int(mism.sum())
        a_pur = (gau == ord("A")) | (gau == ord("G"))
        b_pur = (gbu == ord("A")) | (gbu == ord("G"))
        b_pyr = (gbu == ord("C")) | (gbu == ord("T"))
        transitionsB = int((mism & np.where(a_pur, b_pur, b_pyr)).sum())
        transversionsB = int((mism & np.where(a_pur, ~b_pur, ~b_pyr)).sum())
        uppercaseMatches = int((both & (gau == gbu) & upper_a
                                & upper_b).sum())

        fracMatch = matchB / alignB if alignB else float("nan")
        fracMatchIndel = matchB / align_length
        jcp = mismatchB / alignB if alignB else float("nan")
        with np.errstate(all="ignore"):
            jcK = -0.75 * math.log(1.0 - 4.0 / 3 * jcp) \
                if 1.0 - 4.0 / 3 * jcp > 0 else float("inf")
            p = transitionsB / alignB if alignB else float("nan")
            qv = transversionsB / alignB if alignB else float("nan")
            try:
                w1 = 1.0 / (1 - 2.0 * p - qv)
                w2 = 1.0 / (1 - 2.0 * qv)
                k2K = 0.5 * math.log(w1) + 0.25 * math.log(w2) \
                    if w1 > 0 and w2 > 0 else float("nan")
            except ZeroDivisionError:
                k2K = float("inf")

        same_chr = (h.query.name == h.ref.name
                    and h.query.is_rc == h.ref.is_rc)
        overlap = 0 if not same_chr else max(
            0, min(h.query_end, h.ref_end)
            - max(h.query_start, h.ref_start))
        too_big_overlap = (
            (h.query_end - h.query_start - overlap)
            < cfg.stats.big_overlap_threshold
            or (h.ref_end - h.ref_start - overlap)
            < cfg.stats.big_overlap_threshold)
        too_big_overlap &= same_chr

        denom = h.aln.gaps() + h.aln.mismatches() + h.aln.matches()
        error_scaled = ((h.aln.gaps() + h.aln.mismatches()) / denom
                        if denom else 0.0)

        if (uppercaseA >= cfg.stats.min_uppercase
                and uppercaseB >= cfg.stats.min_uppercase
                and not too_big_overlap
                and error_scaled <= cfg.stats.max_scaled_error
                and uppercaseMatches >= cfg.stats.min_uppercase):
            h.name = "S"
            h.comment = ""
            bed = h.to_bed(False, False, fr.translation_index or None)
            rows.append(
                f"{bed}\t{indel_a}\t{indel_b}\t{alignB}\t{matchB}\t"
                f"{mismatchB}\t{transitionsB}\t{transversionsB}\t"
                f"{_fmt(fracMatch)}\t{_fmt(fracMatchIndel)}\t{_fmt(jcK)}\t"
                f"{_fmt(k2K)}\t{h.aln.gaps()}\t{uppercaseA}\t{uppercaseB}\t"
                f"{uppercaseMatches}\t{h.aln.matches()}\t"
                f"{h.aln.mismatches()}\t{h.aln.gaps()}\t"
                f"{h.aln.gap_bases()}\t{h.aln.cigar_string()}\t"
                f"{_fmt(1 - error_scaled)}")
    return rows


HEADER = ("#chr1\tstart1\tend1\tchr2\tstart2\tend2\tname\tscore\tstrand1\t"
          "strand2\tmax_len\taln_len\tcomment\t"
          "indel_a\tindel_b\talnB\tmatchB\tmismatchB\t"
          "transitionsB\ttransversions\tfracMatch\tfracMatchIndel\tjck\tk2K\t"
          "aln_gaps\tuppercaseA\tuppercaseB\tuppercaseMatches\t"
          "aln_matches\taln_mismatches\taln_gaps\taln_gap_bases\t"
          "cigar\tfilter_score")


def stats_rows(bed_lines: list[str], fr: FastaReference,
               cfg: Config = DEFAULT, jobs: int = 1) -> list[str]:
    """stats generate driver (stats_main.cc:338-393).

    ``jobs > 1`` fans the per-hit processing over a thread pool — the
    equivalent of the reference's ``#pragma omp parallel for``
    (stats_main.cc:386-391); the heavy per-base tallies are vectorized
    NumPy, which releases the GIL.  Output order is deterministic (chunks
    are concatenated in sorted-hit order, matching the serial path; the
    reference emits under ``omp critical`` in arbitrary order and relies
    on the final sort|uniq — ours needs it only for parity with that)."""
    hits: list[tuple[Hit, str]] = []
    for line in bed_lines:
        if not line.strip() or line.startswith("#"):
            continue
        h, cigar = Hit.from_bed(line)
        if (h.query.name, h.query_start, h.query_end) > \
           (h.ref.name, h.ref_start, h.ref_end):
            h.query.name, h.ref.name = h.ref.name, h.query.name
            h.query_start, h.ref_start = h.ref_start, h.query_start
            h.query_end, h.ref_end = h.ref_end, h.query_end
            cigar = cigar.translate(str.maketrans("ID", "DI"))
        hits.append((h, cigar))
    hits.sort(key=lambda hc: (hc[0].ref.is_rc, hc[0].query.name,
                              hc[0].ref.name, hc[0].query_start,
                              hc[0].ref_start))
    if jobs > 1 and len(hits) > 1:
        from concurrent.futures import ThreadPoolExecutor

        def one(hc):
            return process(hc[0], hc[1], fr, cfg)

        with ThreadPoolExecutor(max_workers=jobs) as ex:
            parts = list(ex.map(one, hits, chunksize=16))
        return [row for part in parts for row in part]
    rows: list[str] = []
    for h, cigar in hits:
        rows.extend(process(h, cigar, fr, cfg))
    return rows
