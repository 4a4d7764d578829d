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

from ..io.bed import Hit, canonical_swap


def merge_hits(hits: list[Hit], merge_dist: int) -> list[Hit]:
    results: list[Hit] = []
    for h in hits:
        canonical_swap(h)
    hits = sorted(hits, key=lambda h: (h.ref.is_rc, h.query.name, h.ref.name,
                                       h.query_start, h.ref_start))
    # window entries: [key_ref_end, seq, hit]
    windows: list[list] = []
    seq = 0
    prev_key = None        # (query_name, ref_name, ref_is_rc)
    prev_query_end = 0

    def flush():
        for _, _, h in sorted(windows, key=lambda x: (x[0], x[1])):
            results.append(h)

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
            windows.append([rec.ref_end, seq, rec])
            seq += 1
            first = False
        elif (prev_query_end + merge_dist < rec.query_start
              or key != prev_key):
            flush()
            windows = [[rec.ref_end, seq, rec]]
            seq += 1
        else:
            need_update = True
            while need_update:
                need_update = False
                keep = []
                for entry in sorted(windows, key=lambda x: (x[0], x[1])):
                    w = entry[2]
                    if entry[0] < rec.ref_start - merge_dist:
                        keep.append(entry)   # below lower_bound: untouched
                        continue
                    if (w.query_end + merge_dist < rec.query_start
                            or w.ref_end < rec.ref_start - merge_dist
                            or w.ref_start > rec.ref_end + merge_dist):
                        keep.append(entry)
                        continue
                    need_update = True
                    rec.query_end = max(rec.query_end, w.query_end)
                    rec.ref_end = max(rec.ref_end, w.ref_end)
                    rec.query_start = min(rec.query_start, w.query_start)
                    rec.ref_start = min(rec.ref_start, w.ref_start)
                windows = keep
            windows.append([rec.ref_end, seq, rec])
            seq += 1
        prev_key = key
        # merge.cc:103-104: prev.query_end becomes a running max (carried
        # even across group flushes, since prev is only reassigned after
        # the max); the stored window copies are unaffected.
        prev_query_end = max(rec.query_end, prev_query_end)
    flush()
    return results
