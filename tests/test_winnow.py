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


@pytest.mark.parametrize("seed,w", [(0, 16), (1, 3), (2, 7), (3, 33)])
def test_closed_form_matches_scan(seed, w):
    """The windowed-min closed form == the literal q/m change-point scan
    (winnow.py module doc), incl. ties / descending / periodic keys."""
    from sedef_tpu.ops.winnow import change_points_closed_np, change_points_np
    rng = np.random.default_rng(seed)
    for style in range(4):
        n = int(rng.integers(1, 3000))
        if style == 0:
            keys = rng.integers(0, 1 << 28, n)
        elif style == 1:
            keys = rng.integers(0, 6, n)               # heavy ties
        elif style == 2:
            keys = np.sort(rng.integers(0, 999, n))[::-1].copy()  # descend
        else:
            keys = np.abs(np.sin(np.arange(n) * .1) * 999).astype(np.int64)
        keys = keys.astype(np.int64)
        assert np.array_equal(change_points_np(keys, w),
                              change_points_closed_np(keys, w))


@pytest.mark.parametrize("seed,k,w", [(0, 12, 16), (1, 12, 16), (2, 11, 8),
                                      (3, 5, 4), (4, 14, 32)])
def test_device_index_matches_host(seed, k, w):
    """Device winnow + posting sort == host minimizers_np + stable argsort."""
    from sedef_tpu.ops.winnow_device import device_index_arrays
    rng = np.random.default_rng(seed)
    chars = np.array(list("ACGTacgtNn"))
    probs = np.array([.14, .14, .14, .14, .09, .09, .09, .09, .04, .04])
    seq = "".join(rng.choice(chars, size=5000, p=probs))
    code, cls = dna.encode(seq)
    ekeys, elocs = minimizers_np(code, cls, k, w)
    order = np.argsort(ekeys, kind="stable")
    r = device_index_arrays(code, cls, k, w)
    assert r is not None
    keys, locs, skeys, slocs = r
    assert np.array_equal(keys, ekeys)
    assert np.array_equal(locs, elocs)
    assert np.array_equal(skeys, ekeys[order])
    assert np.array_equal(slocs, elocs[order])


def test_device_index_fixture_oracle(fixtures_dir):
    """Device winnow vs the reference-binary golden fixture."""
    from sedef_tpu.ops.winnow_device import device_index_arrays
    k, w = 12, 16
    lines = (fixtures_dir / "minimizers_7.txt").read_text().splitlines()
    seq = lines[0][4:]
    expect = []
    for ln in lines[1:]:
        hv, st, loc = ln.split()
        expect.append(((int(st) << (2 * k)) | int(hv), int(loc)))
    code, cls = dna.encode(seq)
    r = device_index_arrays(code, cls, k, w)
    assert r is not None
    keys, locs, _, _ = r
    assert list(zip(keys.tolist(), locs.tolist())) == expect


def test_device_index_multi_segment(monkeypatch):
    """Fixed-shape segment processing (one compile per genome) stitches to
    exactly the host result across segment boundaries."""
    from sedef_tpu.ops import winnow_device
    monkeypatch.setattr(winnow_device, "_SEG", 1 << 15)
    rng = np.random.default_rng(21)
    chars = np.array(list("ACGTacgtNn"))
    probs = np.array([.14, .14, .14, .14, .09, .09, .09, .09, .04, .04])
    seq = "".join(rng.choice(chars, size=150_000, p=probs))
    code, cls = dna.encode(seq)
    k, w = 12, 16
    ekeys, elocs = minimizers_np(code, cls, k, w)
    order = np.argsort(ekeys, kind="stable")
    r = winnow_device.device_index_arrays(code, cls, k, w)
    assert r is not None
    keys, locs, skeys, slocs = r
    assert np.array_equal(keys, ekeys)
    assert np.array_equal(locs, elocs)
    assert np.array_equal(skeys, ekeys[order])
    assert np.array_equal(slocs, elocs[order])
