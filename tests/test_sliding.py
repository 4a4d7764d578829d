"""SlidingJaccard vs the reference SlidingMap oracle fixtures.

Each fixture interleaves ``OP <op> <hash> <status>`` lines with
``<i> <query_size> <intersection> <limit> <jaccard>`` state lines produced by
the real reference ``sliding.cc`` driven with a randomized op stream.
"""

import pytest

from sedef_tpu.ops.sliding import SlidingJaccard

K = 12


def _key(hash_val: int, status: int) -> int:
    return (status << (2 * K)) | hash_val


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_matches_reference_oracle(fixtures_dir, seed):
    sm = SlidingJaccard(K)
    lines = (fixtures_dir / f"sliding_ops_{seed}.txt").read_text().splitlines()
    i = 0
    while i < len(lines):
        op_line = lines[i].split()
        assert op_line[0] == "OP"
        op, hv, st = int(op_line[1]), int(op_line[2]), int(op_line[3])
        key = _key(hv, st)
        if op == 0:
            sm.add_to_query(key)
        elif op == 1:
            sm.remove_from_query(key)
        elif op == 2:
            sm.add_to_reference(key)
        else:
            sm.remove_from_reference(key)
        state = lines[i + 1].split()
        step, qs, inter, limit, jac = map(int, state)
        assert sm.query_size == qs, f"step {step}: query_size"
        assert sm.intersection == inter, f"step {step}: intersection"
        assert int(sm.limit) == limit, f"step {step}: limit"
        assert sm.jaccard() == jac, f"step {step}: jaccard"
        i += 2


def test_copy_independent():
    sm = SlidingJaccard(K)
    for h in [5, 9, 3, 7]:
        sm.add_to_query(_key(h, 0))
    c = sm.copy()
    c.add_to_reference(_key(5, 0))
    assert sm.intersection == 0
    assert c.intersection == 1
