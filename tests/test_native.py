"""Native C++ runtime vs the pure-Python implementations (skipped when the
library has not been built: python -m sedef_tpu.native.build)."""

import numpy as np
import pytest

from sedef_tpu.config import DEFAULT
from sedef_tpu.io.fasta import FastaReference
from sedef_tpu.models.seeder import initial_search
from sedef_tpu.native import lib
from sedef_tpu.ops.anchors import generate_anchors
from sedef_tpu.ops.chain import chain_anchors
from sedef_tpu.ops.dna import PackedSeq, encode
from sedef_tpu.ops.index import MinimizerIndex
from sedef_tpu.ops.wavefront import backtrack_np, wavefront_np
from sedef_tpu.ops.winnow import minimizers_np

pytestmark = pytest.mark.skipif(not lib.has("search"),
                                reason="native library not built")


def test_winnow_parity():
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGTacgtNn"), 8000))
    code, cls = encode(seq)
    for k, w in [(12, 16), (11, 8), (5, 4)]:
        k1, l1 = minimizers_np(code, cls, k, w)
        k2, l2 = lib.winnow(code, cls, k, w)
        np.testing.assert_array_equal(k1, k2)
        np.testing.assert_array_equal(l1, l2)


def test_search_parity(fixtures_dir):
    fr = FastaReference(str(fixtures_dir / "search" / "multi.fa"))
    for q, r, rc in [("chr1", "chr2", False), ("chr1", "chr2", True),
                     ("chr2", "chr2", False), ("chr1", "chr1", True)]:
        qh = MinimizerIndex(PackedSeq(q, fr.get_sequence(q)), 12, 16)
        rh = (qh if (q == r and not rc) else
              MinimizerIndex(PackedSeq(r, fr.get_sequence(r), is_rc=rc),
                             12, 16))
        same = (q == r) and not rc
        py = [(h.query_start, h.query_end, h.ref_start, h.ref_end, h.jaccard)
              for h in initial_search(qh, rh, same, DEFAULT,
                                      use_native=False)]
        nat = [tuple(int(x) for x in row)
               for row in lib.search(qh, rh, same, DEFAULT)]
        assert py == nat, (q, r, rc)


def test_chain_parity():
    rng = np.random.default_rng(3)
    q = "".join(rng.choice(list("ACGTacgt"), 4000))
    r = q[:2000] + "".join(rng.choice(list("ACGT"), 300)) + q[2000:]
    anchors = generate_anchors(q, r, False, 0, 0, 11)
    assert anchors
    p1, b1 = chain_anchors(anchors)
    p2, b2 = lib.chain([a.q for a in anchors], [a.r for a in anchors],
                       [a.l for a in anchors], [a.has_u for a in anchors],
                       DEFAULT.chain.max_chain_gap,
                       DEFAULT.chain.match_chain_score)
    assert list(p1) == list(p2)
    assert b1 == b2


def test_backtrack_parity():
    rng = np.random.default_rng(5)
    for ql, tl in [(200, 180), (64, 300), (1, 1)]:
        q = rng.integers(0, 4, ql).astype(np.int8)
        t = rng.integers(0, 4, tl).astype(np.int8)
        p, _ = wavefront_np(q, t)
        assert backtrack_np(p, ql, tl) == lib.backtrack(p, ql, tl)


def test_native_populate_matches_numpy():
    """sedef_populate == the numpy populate path (gapped strings,
    midline, match/mismatch tallies) on randomized cigars incl. N and
    case mixtures."""
    import numpy as np

    from sedef_tpu.native import lib as native
    from sedef_tpu.ops.cigar import Alignment

    if native is None or not native.has("populate"):
        import pytest
        pytest.skip("native populate not built")
    rng = np.random.default_rng(13)
    alpha = list("ACGTacgtNn")
    for trial in range(50):
        cigar = []
        na = nb = 0
        for _ in range(int(rng.integers(1, 12))):
            op = "MID"[int(rng.integers(0, 3))]
            ln = int(rng.integers(1, 40))
            cigar.append((op, ln))
            if op in "MD":
                na += ln
            if op in "MI":
                nb += ln
        if not any(op == "M" for op, _ in cigar):
            cigar.append(("M", 5))
            na += 5
            nb += 5
        a = "".join(rng.choice(alpha, na))
        b = "".join(rng.choice(alpha, nb))

        al_native = Alignment()
        al_native.a, al_native.b, al_native.cigar = a, b, list(cigar)
        al_native.populate()

        al_np = Alignment()
        al_np.a, al_np.b, al_np.cigar = a, b, list(cigar)
        import sedef_tpu.native.lib as nl
        real_has = nl.has
        try:
            nl.has = lambda name: (False if name == "populate"
                                   else real_has(name))
            al_np.populate()
        finally:
            nl.has = real_has

        assert al_native.align_a == al_np.align_a
        assert al_native.align_b == al_np.align_b
        assert al_native.alignment == al_np.alignment
        assert al_native._matches == al_np._matches
        assert al_native._mismatches == al_np._mismatches
        assert al_native._gaps == al_np._gaps
        assert al_native._gap_bases == al_np._gap_bases
