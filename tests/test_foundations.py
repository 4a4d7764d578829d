"""Config defaults, statistical model, DNA encoding."""

import math

import numpy as np
import pytest

from sedef_tpu.config import DEFAULT, Config
from sedef_tpu.ops import dna
from sedef_tpu.ops.stat_model import (relaxed_jaccard_estimate,
                                      relaxed_jaccard_table, tau)


def test_config_defaults_match_reference():
    # globals.cc:16-39
    c = DEFAULT
    assert c.search.kmer_size == 12
    assert c.search.window_size == 16
    assert c.search.max_error == 0.30
    assert c.search.max_edit_error == 0.15
    assert c.search.gap_frequency == 0.005
    assert c.search.min_read_size == 700
    assert c.search.max_sd_size == 1 << 20
    assert c.align.match == 5 and c.align.mismatch == -4
    assert c.align.gap_open == -40 and c.align.gap_extend == -1
    assert c.align.max_ksw_seq_len == 60000
    assert c.extend.ratio == 5 and c.extend.max_extend == 15000
    assert c.extend.merge_dist == 250
    assert c.chain.max_chain_gap == 210
    assert c.chain.min_uppercase_match == 90
    assert c.chain.refine.min_read == 900
    assert c.chain.refine.side_align == 500
    assert c.chain.refine.max_gap == 10000
    assert c.stats.min_split_size == 1000
    assert c.stats.min_uppercase == 100
    assert c.stats.max_scaled_error == 0.5


def test_finalize_derives():
    c = Config()
    c.search.max_error = 0.40
    c.finalize()
    assert c.search.min_read_size == 600
    assert c.chain.max_chain_gap == 240


def test_tau_values():
    # tau(0.15, 12): ERROR_RATIO=1 -> gap=0.15, a=0.85/1.15, b=1/(2e^1.8-1)
    expect = (0.85 / 1.15) * 1.0 / (2 * math.exp(1.8) - 1)
    assert tau(0.15, 12) == pytest.approx(expect, rel=1e-12)
    assert tau(0.0, 12) == pytest.approx(1.0)
    # gap error saturates at 1 -> tau = 0
    assert tau(1.0, 12) == 0.0


def test_relaxed_jaccard_closed_form():
    # Literal reference semantics reduce to ceil(s*tau)+1 for s >= 2
    # (util.cc:85-113 with the int-truncating solve_inverse_jaccard).
    t = tau(0.15, 12)
    for s in [2, 10, 44, 100, 1000, 12345]:
        assert relaxed_jaccard_estimate(s, 12) == math.ceil(s * t) + 1
    assert relaxed_jaccard_estimate(1, 12) == 1
    assert relaxed_jaccard_estimate(0, 12) == 0


def test_relaxed_jaccard_table():
    tab = relaxed_jaccard_table(50, 12)
    assert tab.shape == (51,)
    for s in range(51):
        assert tab[s] == relaxed_jaccard_estimate(s, 12)


def test_dna_encoding():
    s = "ACGTacgtNnRr-"
    code, cls = dna.encode(s)
    assert list(code[:8]) == [0, 1, 2, 3, 0, 1, 2, 3]
    assert cls[0] == dna.CLS_UPPER and cls[4] == dna.CLS_LOWER
    assert cls[8] == dna.CLS_N and cls[9] == dna.CLS_N
    # IUPAC 'R' is uppercase-classed with code 0 (matches reference isupper)
    assert cls[10] == dna.CLS_UPPER and code[10] == 0
    assert cls[11] == dna.CLS_LOWER
    assert cls[12] == dna.CLS_LOWER  # punctuation -> "lowercase"
    al = dna.encode_align(s)
    assert list(al) == [0, 1, 2, 3, 0, 1, 2, 3, 4, 4, 4, 4, 4]


def test_revcomp():
    # note: reference rev_comp_lookup maps 'n' -> 'N' (common.h:72-87)
    assert dna.revcomp("ACGTn") == "NACGT"
    assert dna.revcomp("AcGt") == "aCgT"
    ps = dna.PackedSeq("x", "ACGTn", is_rc=True)
    assert ps.seq == "NACGT"


def test_packed_seq_roundtrip():
    s = "ACGTacgtNNNtga"
    ps = dna.PackedSeq("chr1", s)
    assert ps.seq == s
    assert ps.sub(2, 6) == "GTac"
    assert len(ps) == len(s)
