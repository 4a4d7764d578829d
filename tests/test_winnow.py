"""Winnowing: state-machine implementation vs the reference-binary fixtures
and vs a literal deque simulation of the reference's (quirky) eviction rule.
"""

from collections import deque

import numpy as np
import pytest

from sedef_tpu.ops import dna
from sedef_tpu.ops.winnow import kmer_keys_np, minimizers_np


def quirky_deque_minimizers(seq: str, k: int, w: int):
    """Direct simulation of hash.cc:53-100 including the back()-tested
    pop_front (hash.cc:87-89): the front survives past the window unless the
    entire deque is stale."""
    keys = kmer_keys_np(*dna.encode(seq), k)
    out = []
    win = deque()  # (key, loc)
    for p in range(len(keys)):
        key = int(keys[p])
        while win and win[-1][0] >= key:
            win.pop()
        while win and win[-1][1] < p - w:
            win.popleft()
        win.append((key, p))
        if p < w:
            continue
        if not out or out[-1] != win[0]:
            out.append(win[0])
    return out


@pytest.mark.parametrize("seed,k,w", [(0, 12, 16), (1, 12, 16), (2, 11, 8),
                                      (3, 5, 4), (4, 14, 32)])
def test_state_machine_matches_deque(seed, k, w):
    rng = np.random.default_rng(seed)
    chars = np.array(list("ACGTacgtNn"))
    probs = np.array([.14, .14, .14, .14, .09, .09, .09, .09, .04, .04])
    seq = "".join(rng.choice(chars, size=2000, p=probs))
    code, cls = dna.encode(seq)
    keys, locs = minimizers_np(code, cls, k, w)
    expect = quirky_deque_minimizers(seq, k, w)
    got = list(zip(keys.tolist(), locs.tolist()))
    assert got == expect


@pytest.mark.parametrize("name,k,w", [("minimizers_7", 12, 16),
                                      ("minimizers_8", 12, 16),
                                      ("minimizers_k11w8", 11, 8)])
def test_matches_reference_oracle(fixtures_dir, name, k, w):
    lines = (fixtures_dir / f"{name}.txt").read_text().splitlines()
    assert lines[0].startswith("SEQ ")
    seq = lines[0][4:]
    expect = []
    for ln in lines[1:]:
        hv, st, loc = ln.split()
        expect.append(((int(st) << (2 * k)) | int(hv), int(loc)))
    code, cls = dna.encode(seq)
    keys, locs = minimizers_np(code, cls, k, w)
    got = list(zip(keys.tolist(), locs.tolist()))
    assert got == expect


def test_short_sequence_empty():
    code, cls = dna.encode("ACGTACGT")
    keys, locs = minimizers_np(code, cls, 12, 16)
    assert keys.size == 0 and locs.size == 0
