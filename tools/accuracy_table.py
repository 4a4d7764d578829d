"""Simulation accuracy table (paper/output-rand.txt analog).

Usage: python tools/accuracy_table.py [runs_per_rate] [max_error] [max_len]
"""
import random, sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax
jax.config.update("jax_platforms", "cpu")
from sedef_tpu.models.simulate import classify_pair, generate_random_sd
from sedef_tpu.ops.wavefront import WavefrontAligner

runs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
max_err = int(sys.argv[2]) if len(sys.argv) > 2 else 30
max_len = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
al = WavefrontAligner(use_tpu=False)
print("error;hits;misses;partials")
for error in range(0, max_err + 1):
    rng = random.Random(1000 + error)
    out = {"hit": 0, "miss": 0, "partial": 0}
    for _ in range(runs):
        s1, s2, _ = generate_random_sd(rng, error, min_len=1000,
                                       max_len=max_len)
        out[classify_pair(s1, s2, error, aligner=al)] += 1
    print(f"{error};{out['hit']};{out['miss']};{out['partial']}", flush=True)
