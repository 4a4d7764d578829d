"""AddressSanitizer run of the native runtime (the reference's
``make sanitize`` analog, Makefile:46-49).

Builds libsedef_native_asan.so and exercises the pointer-heavy entry points
(winnow, search, align, chain, backtrack) in a subprocess with libasan
LD_PRELOADed; any heap-buffer-overflow / use-after-free aborts the child.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

DRIVER = r"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from sedef_tpu.config import DEFAULT
from sedef_tpu.native import lib as nlib
from sedef_tpu.ops.dna import PackedSeq
from sedef_tpu.ops.index import MinimizerIndex
from sedef_tpu.models.seeder import initial_search

assert nlib.has("search") and nlib.has("align") and nlib.has("chain")

rng = np.random.default_rng(3)
UP = np.frombuffer(b"ACGT", dtype=np.uint8)

def mutate(c, rate):
    out = c.copy()
    snp = rng.random(len(out)) < rate
    out[snp] = (out[snp] + rng.integers(1, 4, int(snp.sum()))) % 4
    return out

g = rng.integers(0, 4, 60000, dtype=np.int8)
unit = rng.integers(0, 4, 2000, dtype=np.int8)
for pos in (5000, 20000, 41000):
    g[pos:pos + 2000] = mutate(unit, 0.08)
seq = UP[g].tobytes().decode()
idx = MinimizerIndex(PackedSeq("chrA", seq), 12, 16)
hits = initial_search(idx, idx, True, DEFAULT, use_native=True)
assert hits, "expected planted-repeat hits under ASan run"

q = rng.integers(0, 4, 700).astype(np.uint8)
t = mutate(q.astype(np.int8), 0.1).astype(np.uint8)
cig = nlib.align(q, t, 5, -4, 40, 1)
assert sum(l for op, l in cig if op in "MD") == len(q)

aq = np.sort(rng.integers(0, 5000, 64)).astype(np.int32)
ar = (aq + rng.integers(-3, 4, 64)).astype(np.int32)
al = rng.integers(11, 40, 64).astype(np.int32)
ahu = al.copy()
path, bounds = nlib.chain(aq, ar, al, ahu, 210, 4)
assert len(bounds) >= 1
print("ASAN_DRIVER_OK")
"""


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only")
def test_native_under_asan(tmp_path):
    libasan = subprocess.run(
        ["g++", "-print-file-name=libasan.so"], capture_output=True,
        text=True).stdout.strip()
    if not libasan or not os.path.exists(libasan):
        pytest.skip("libasan not available")
    from sedef_tpu.native.build import build
    so = build(verbose=False, sanitize=True)
    env = dict(os.environ)
    env.update({
        "SEDEF_NATIVE_SO": str(so),
        "LD_PRELOAD": libasan,
        "ASAN_OPTIONS": "detect_leaks=0:abort_on_error=1",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(REPO),
    })
    r = subprocess.run([sys.executable, "-c", DRIVER], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"ASan run failed:\n{r.stdout}\n{r.stderr}"
    assert "ASAN_DRIVER_OK" in r.stdout
