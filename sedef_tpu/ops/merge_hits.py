"""Transitive union of nearby hits (equivalent of ``src/merge.cc``).

Canonicalize mate order, sort, then sweep with an active window keyed by
ref_end, unioning hits whose query gap <= merge_dist and whose ref ranges
are within merge_dist (merge.cc:35-109).

C++ copy semantics that matter and are reproduced here:
* ``windows`` stores a snapshot of the record at insertion time; the
  trailing ``rec.query_end = max(rec.query_end, prev.query_end)``
  (merge.cc:103) runs after that copy, so it only affects ``prev`` — the
  group-flush predicate sees a running-max query_end, the output does not.
* flush order is multimap key order: (ref_end at insertion, insertion seq).
"""

from __future__ import annotations

import bisect

from ..io.bed import Hit, canonical_swap


def merge_hits(hits: list[Hit], merge_dist: int) -> list[Hit]:
    results: list[Hit] = []
    for h in hits:
        canonical_swap(h)
    hits = sorted(hits, key=lambda h: (h.ref.is_rc, h.query.name, h.ref.name,
                                       h.query_start, h.ref_start))
    # The multimap is kept as a list SORTED by (key_ref_end, insertion
    # seq) at all times — bisect.insort for inserts, bisect_left for the
    # lower-bound scan — exactly the reference's std::multimap iteration
    # and flush order (merge.cc:59-105).  (An earlier version re-sorted
    # the whole window per record: O(n^2 log n), 142 s of the 100 Mbp
    # dense sample's bucket stage vs the reference's 0.7 s.)  Window
    # entries: (key_ref_end, seq, hit); the (key, seq) prefix is unique,
    # so tuple comparisons never reach the Hit.
    windows: list[tuple] = []
    seq = 0
    prev_key = None        # (query_name, ref_name, ref_is_rc)
    prev_query_end = 0

    first = True
    for rec in hits:
        assert not rec.query.is_rc
        if (rec.query.name == rec.ref.name
                and rec.query_start == rec.ref_start
                and rec.query_end == rec.ref_end
                and rec.query.is_rc == rec.ref.is_rc):
            continue
        key = (rec.query.name, rec.ref.name, rec.ref.is_rc)
        if first:
            windows.append((rec.ref_end, seq, rec))
            seq += 1
            first = False
            prev_query_end = rec.query_end
        elif (prev_query_end + merge_dist < rec.query_start
              or key != prev_key):
            results.extend(e[2] for e in windows)
            windows = [(rec.ref_end, seq, rec)]
            seq += 1
            prev_query_end = rec.query_end
        else:
            need_update = True
            while need_update:
                need_update = False
                # scan from the multimap lower bound; entries below it
                # are untouched by construction (their key ref_end <
                # rec.ref_start - merge_dist fails the merge predicate)
                lo = bisect.bisect_left(windows,
                                        (rec.ref_start - merge_dist,))
                tail = []
                for entry in windows[lo:]:
                    w = entry[2]
                    if (w.query_end + merge_dist < rec.query_start
                            or w.ref_end < rec.ref_start - merge_dist
                            or w.ref_start > rec.ref_end + merge_dist):
                        tail.append(entry)
                        continue
                    need_update = True
                    rec.query_end = max(rec.query_end, w.query_end)
                    rec.ref_end = max(rec.ref_end, w.ref_end)
                    rec.query_start = min(rec.query_start, w.query_start)
                    rec.ref_start = min(rec.ref_start, w.ref_start)
                if need_update:
                    windows[lo:] = tail
            bisect.insort(windows, (rec.ref_end, seq, rec))
            seq += 1
        prev_key = key
        # merge.cc:103-104: prev.query_end is a running max WITHIN a
        # window group (the stored window copies are unaffected); the
        # first-insert and flush branches assign prev = rec before the
        # max, so the max RESETS at every flush — without the reset the
        # flush predicate goes quiet in dense data and the window
        # balloons (O(n) scan tails; 28 s of the 100 Mbp dense bucket
        # stage).  Merge results are unaffected by flush timing: a
        # flushed entry has query_end + merge_dist < the flushing
        # record's query_start <= every later record's query_start, so
        # the merge predicate can never match it again.
        prev_query_end = max(rec.query_end, prev_query_end)
    results.extend(e[2] for e in windows)
    return results
