"""Exact incremental sliding-Jaccard sketch (host reference engine).

Port of the reference ``SlidingMap`` (``src/sliding.h:24-72``,
``src/sliding.cc:53-168``) with the C++ ordered-map iterator replaced by a
sorted key list plus an integer boundary index ``B`` (``B == len(keys)``
represents ``end()``).  The semantics being tracked:

* ``storage`` maps each hash in W(query) ∪ W(ref) to 2-bit membership flags
  (bit 1 = query, bit 2 = ref).
* ``B`` marks the ``query_size``-th smallest element of the union — the
  MinHash sketch window (inclusive boundary).
* ``intersection`` counts flags==3 elements at positions <= B, maintained
  incrementally under arbitrary insertion/removal on either side — including
  the reference's exact corner cases (e.g. a ref-bit added at the boundary
  element itself does NOT bump the intersection, strict ``<`` in
  sliding.cc:86).

This is the correctness oracle and the small-scale host engine; the batched
device formulation lives in ``jaccard_batch.py``.
"""

from __future__ import annotations

from bisect import bisect_left

from ..config import DEFAULT, Config
from .stat_model import relaxed_jaccard_estimate

_STATUS_SHIFT_CACHE: dict[int, int] = {}


class SlidingJaccard:
    __slots__ = ("keys", "flags", "B", "query_size", "intersection", "limit",
                 "kmer_size", "_cfg", "_n_status_shift")

    def __init__(self, kmer_size: int, cfg: Config = DEFAULT):
        self.keys: list[int] = []
        self.flags: dict[int, int] = {}
        self.B = 0  # == len(keys) -> end()
        self.query_size = 0
        self.intersection = 0
        self.limit = 0
        self.kmer_size = kmer_size
        self._cfg = cfg
        self._n_status_shift = 2 * kmer_size

    def copy(self) -> "SlidingJaccard":
        o = SlidingJaccard.__new__(SlidingJaccard)
        o.keys = list(self.keys)
        o.flags = dict(self.flags)
        o.B = self.B
        o.query_size = self.query_size
        o.intersection = self.intersection
        o.limit = self.limit
        o.kmer_size = self.kmer_size
        o._cfg = self._cfg
        o._n_status_shift = self._n_status_shift
        return o

    def jaccard(self) -> int:
        if self.intersection >= self.limit:
            return self.intersection
        return int(self.intersection - self.limit)

    # -- low-level add/remove (sliding.cc:69-122) ---------------------------

    def _add(self, h: int, bit: int, full: int = 3) -> bool:
        pos = bisect_left(self.keys, h)
        exists = pos < len(self.keys) and self.keys[pos] == h
        if exists:
            if self.flags[h] & bit:
                return False
            self.flags[h] |= bit
            inserted = False
        else:
            self.keys.insert(pos, h)
            self.flags[h] = bit
            inserted = True
            if pos <= self.B:
                self.B += 1  # keep B pointing at the same element / end()
        if self.query_size and h < self.keys[self.B]:
            self.intersection += self.flags[h] == full
            if inserted:
                self.intersection -= self.flags[self.keys[self.B]] == full
                self.B -= 1
        return True

    def _remove(self, h: int, bit: int, full: int = 3) -> bool:
        pos = bisect_left(self.keys, h)
        if pos >= len(self.keys) or self.keys[pos] != h:
            return False
        if not (self.flags[h] & bit):
            return False
        erase = self.flags[h] == bit
        if self.query_size and h <= self.keys[self.B]:
            self.intersection -= self.flags[h] == full
            if erase:
                self.B += 1
                if self.B < len(self.keys):
                    self.intersection += (
                        self.flags[self.keys[self.B]] == full)
        if erase:
            del self.flags[h]
            self.keys.pop(pos)
            if pos < self.B:
                self.B -= 1
        else:
            self.flags[h] &= ~bit
        return True

    # -- public API (sliding.cc:124-168) ------------------------------------

    def add_to_query(self, h: int) -> None:
        if not self._add(h, 1):
            return
        self.query_size += 1
        self.limit = relaxed_jaccard_estimate(
            self.query_size, self.kmer_size, self._cfg)
        if self.B >= len(self.keys):
            self.B = 0
        else:
            self.B += 1
        self.intersection += self.flags[self.keys[self.B]] == 3

    def remove_from_query(self, h: int) -> None:
        if not self._remove(h, 1):
            return
        self.query_size -= 1
        self.limit = relaxed_jaccard_estimate(
            self.query_size, self.kmer_size, self._cfg)
        if self.B < len(self.keys):
            self.intersection -= self.flags[self.keys[self.B]] == 3
        if self.B == 0:
            self.B = len(self.keys)
        else:
            self.B -= 1

    def _has_n(self, h: int) -> bool:
        return (h >> self._n_status_shift) == 2

    def add_to_reference(self, h: int) -> None:
        if not self._has_n(h):
            self._add(h, 2)

    def remove_from_reference(self, h: int) -> None:
        if not self._has_n(h):
            self._remove(h, 2)
