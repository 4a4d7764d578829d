"""Exact k-mer anchor generation (vectorized).

Equivalent of ``generate_anchors`` (``src/chain.cc:24-101``): hash-join of
query/ref k-mers (case-insensitive 2-bit codes, N-containing k-mers
excluded, posting lists capped at 1000), greedy maximal exact-match
extension along diagonals with the per-diagonal ``slide`` dedup.  The
reference's per-seed scan loop becomes: sort/searchsorted join -> per
diagonal, match-run decomposition -> one anchor per (diagonal, run) at the
first seed of the run.  Output order matches the reference's (q, then
posting order = r) emission.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .dna import encode

_N_CODE = 4  # sentinel for is-N in this module


@dataclass
class Anchor:
    q: int
    r: int
    l: int
    has_u: int


def _kmer_hashes(seq: str, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, valid) for all k-mer positions; valid = no N inside
    (chain.cc:28-39 semantics: hash over hash_dna codes, 'N'/'n' tracked
    via last_n)."""
    code, cls = encode(seq)
    n = len(seq) - k + 1
    if n <= 0:
        return np.empty(0, np.int64), np.empty(0, bool)
    h = np.zeros(n, dtype=np.int64)
    for j in range(k):
        h = (h << 2) | code[j:j + n].astype(np.int64)
    raw = np.frombuffer(seq.encode(), dtype=np.uint8)
    is_n = (raw == ord("N")) | (raw == ord("n"))
    pn = np.concatenate([[0], np.cumsum(is_n)])
    valid = (pn[k:] - pn[:-k]) == 0
    return h, valid


def generate_anchors(query: str, ref: str, same_chr: bool,
                     orig_query_start: int, orig_ref_start: int,
                     kmer_size: int, max_posting: int = 1000
                     ) -> list[Anchor]:
    qh, qv = _kmer_hashes(query, kmer_size)
    rh, rv = _kmer_hashes(ref, kmer_size)
    if qh.size == 0 or rh.size == 0:
        return []

    r_pos = np.nonzero(rv)[0].astype(np.int64)
    r_hash = rh[r_pos]
    order = np.argsort(r_hash, kind="stable")  # stable keeps r ascending
    r_hash_s = r_hash[order]
    r_pos_s = r_pos[order]

    q_pos = np.nonzero(qv)[0].astype(np.int64)
    q_hash = qh[q_pos]
    lo = np.searchsorted(r_hash_s, q_hash, side="left")
    hi = np.searchsorted(r_hash_s, q_hash, side="right")
    sizes = hi - lo
    ok = (sizes > 0) & (sizes < max_posting)  # chain.cc:61 (>= 1000 skipped)
    q_pos, lo, hi, sizes = q_pos[ok], lo[ok], hi[ok], sizes[ok]
    if q_pos.size == 0:
        return []

    # expand the join into (q, r) pair arrays, q-major then posting order
    pair_q = np.repeat(q_pos, sizes)
    idx = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi)]) \
        if q_pos.size else np.empty(0, np.int64)
    pair_r = r_pos_s[idx]

    if same_chr:
        keep = np.abs((orig_ref_start + pair_r)
                      - (orig_query_start + pair_q)) > kmer_size
        pair_q, pair_r = pair_q[keep], pair_r[keep]
    if pair_q.size == 0:
        return []

    # per-diagonal match-run decomposition
    qlen, rlen = len(query), len(ref)
    off = qlen
    diag = off + pair_r - pair_q
    qraw = np.frombuffer(query.encode(), dtype=np.uint8)
    rraw = np.frombuffer(ref.encode(), dtype=np.uint8)
    q_up = (qraw >= 65) & (qraw <= 90)
    r_up = (rraw >= 65) & (rraw <= 90)
    qU = np.where((qraw >= 97) & (qraw <= 122), qraw - 32, qraw)
    rU = np.where((rraw >= 97) & (rraw <= 122), rraw - 32, rraw)
    q_isn = qU == ord("N")
    r_isn = rU == ord("N")

    anchors: list[Anchor] = []
    uniq_diags = np.unique(diag)
    for d in uniq_diags:
        dd = int(d) - off  # r = q + dd
        q0 = max(0, -dd)
        q1 = min(qlen, rlen - dd)
        if q0 >= q1:
            continue
        qs = np.arange(q0, q1)
        rs = qs + dd
        m = (qU[qs] == rU[rs]) & ~q_isn[qs] & ~r_isn[rs]
        # run ends: for each q, first non-match index at or after it
        false_idx = np.nonzero(~m)[0]
        pq = pair_q[diag == d]
        pq = np.sort(pq)
        rel = pq - q0
        if len(false_idx):
            pos = np.searchsorted(false_idx, rel, side="left")
            run_end_rel = np.where(
                pos < len(false_idx),
                false_idx[np.clip(pos, 0, len(false_idx) - 1)], q1 - q0)
        else:
            run_end_rel = np.full(rel.shape, q1 - q0)
        # slide dedup: first seed of each run wins
        upsum = np.cumsum((q_up[qs] | r_up[rs]).astype(np.int64))
        upsum = np.concatenate([[0], upsum])
        out = []
        slide = -1
        for seed_rel, rend in zip(rel.tolist(), run_end_rel.tolist()):
            if seed_rel + q0 >= slide:
                ln = int(rend - seed_rel)
                assert ln >= kmer_size
                # reference declares ``bool has_u`` (chain.cc:74): it
                # saturates to any-uppercase, not a count
                has_u = int(upsum[rend] > upsum[seed_rel])
                out.append(Anchor(int(seed_rel + q0), int(seed_rel + q0 + dd),
                                  ln, has_u))
                slide = seed_rel + q0 + ln
        anchors.extend(out)

    # reference emission order: q ascending, then r ascending
    anchors.sort(key=lambda a: (a.q, a.r))
    return anchors
