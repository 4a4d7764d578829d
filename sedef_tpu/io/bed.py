"""SD-candidate Hit record and BEDPE serialization.

Equivalent of the reference ``Hit`` (``src/hit.{h,cc}``): query/ref ranges
with strand flags, optional Alignment, BED round-trips, super-bin coordinate
translation, and the x5/15 Kbp extension rule.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field

from ..ops.cigar import Alignment


@dataclass
class SeqRef:
    """Lightweight stand-in for the reference's shared_ptr<Sequence>:
    a name + strand + (optionally known) length."""
    name: str
    is_rc: bool = False
    length: int = 0


@dataclass
class Hit:
    query: SeqRef
    query_start: int
    query_end: int
    ref: SeqRef
    ref_start: int
    ref_end: int
    jaccard: int = 0
    name: str = ""
    comment: str = ""
    aln: Alignment = field(default_factory=Alignment)

    def sort_key(self):
        return (self.query_start, self.query_end,
                self.ref_start, self.ref_end)

    # -- parsing (hit.cc:29-97) --------------------------------------------

    @classmethod
    def from_bed(cls, line: str) -> tuple["Hit", str]:
        """Parse a BED row; returns (hit, cigar_string) — cigar may be ''.

        Field layout matches ``Hit::from_bed`` (hit.cc:29-63): columns
        0-2 query, 3-5 ref, 6 name, 8/9 strands, 12 cigar, 13 jaccard,
        14 comment.
        """
        ss = line.rstrip("\n").split("\t")
        assert len(ss) >= 10, f"bad BED row: {line!r}"
        h = cls(SeqRef(ss[0], ss[8][0] != "+"), int(ss[1]), int(ss[2]),
                SeqRef(ss[3], ss[9][0] != "+"), int(ss[4]), int(ss[5]),
                name=ss[6])
        if len(ss) >= 15:
            h.comment = ss[14]
        if len(ss) >= 14:
            try:
                h.jaccard = int(ss[13])
            except ValueError:
                h.jaccard = 0
        cigar = ss[12] if len(ss) >= 13 else ""
        return h, cigar

    @classmethod
    def from_wgac(cls, line: str) -> "Hit":
        """Parse a WGAC table row (hit.cc:99-118)."""
        ss = line.rstrip("\n").split("\t")
        if len(ss) < 27:
            raise ValueError(f"WGAC row needs >= 27 columns, got {len(ss)}")
        h = cls(SeqRef(ss[0], False), int(ss[1]), int(ss[2]),
                SeqRef(ss[6], ss[5][0] != "+"), int(ss[7]), int(ss[8]),
                name=ss[16],
                comment=f"err={100 - 100 * float(ss[26]):.1f}")
        return h

    # -- serialization (hit.cc:134-196) ------------------------------------

    def to_bed(self, do_rc: bool = True, with_cigar: bool = True,
               translation_index: dict | None = None) -> str:
        assert not self.query.is_rc
        qn, qs, qe = self.query.name, self.query_start, self.query_end
        rn = self.ref.name
        if do_rc and self.ref.is_rc:
            rs = self.ref.length - self.ref_end + 1
            re_ = self.ref.length - self.ref_start + 1
        else:
            rs, re_ = self.ref_start, self.ref_end

        if translation_index:
            qn, qs, qe = _translate(translation_index, qn, qs, qe)
            rn, rs, re_ = _translate(translation_index, rn, rs, re_)

        span = self.aln.span()
        score = f"{self.aln.total_error():.1f}" if span else ""
        extras = f"m={self.aln.mismatch_error():.1f};" \
                 f"g={self.aln.gap_error():.1f}" if span else ""
        comment = extras + (";" + self.comment if self.comment else "")
        cig = self.aln.cigar_string() + "\t" if with_cigar else ""
        return (f"{qn}\t{qs}\t{qe}\t{rn}\t{rs}\t{re_}\t{self.name}\t{score}\t"
                f"{'-' if self.query.is_rc else '+'}\t"
                f"{'-' if self.ref.is_rc else '+'}\t"
                f"{max(self.query_end - self.query_start, self.ref_end - self.ref_start)}\t"
                f"{span}\t{cig}{comment}")

    # -- extension (hit.cc:200-207) ----------------------------------------

    def extend(self, factor: float, max_extend: int) -> None:
        w = max(self.query_end - self.query_start,
                self.ref_end - self.ref_start)
        w = min(max_extend, int(factor * w))
        self.query_start = max(0, self.query_start - w)
        self.query_end += w
        self.ref_start = max(0, self.ref_start - w)
        self.ref_end += w

    def update_from_alignment(self) -> None:
        """hit.cc:211-216"""
        self.query_start = self.aln.start_a
        self.query_end = self.aln.end_a
        self.ref_start = self.aln.start_b
        self.ref_end = self.aln.end_b


def _translate(tindex: dict, name: str, s: int, e: int):
    """Super-bin coords -> chromosome coords (hit.cc:122-171)."""
    arr = tindex.get(name)
    if arr is None:
        return name, s, e
    pos = bisect.bisect_right([a[0] for a in arr], s) - 1
    pos = max(pos, 0)
    off, real = arr[pos]
    return real, s - off, e - off


def canonical_swap(h: Hit) -> bool:
    """Order mates canonically (merge.cc:38-47, align_main.cc:83-88);
    returns True if swapped.  Swaps names/coords but NOT strand flags."""
    if (h.query.name, h.query_start, h.query_end) > \
       (h.ref.name, h.ref_start, h.ref_end):
        h.query.name, h.ref.name = h.ref.name, h.query.name
        h.query_start, h.ref_start = h.ref_start, h.query_start
        h.query_end, h.ref_end = h.ref_end, h.query_end
        return True
    return False
