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
