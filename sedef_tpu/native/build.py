"""Build libsedef_native.so:  python -m sedef_tpu.native.build"""

from __future__ import annotations

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).parent


def build(verbose: bool = True) -> pathlib.Path:
    src = HERE / "native.cc"
    out = HERE / "libsedef_native.so"
    cmd = ["g++", "-std=c++17", "-O3", "-fPIC", "-shared", "-march=native", "-fopenmp-simd", "-funroll-loops",
           str(src), "-o", str(out)]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
    print("built", HERE / "libsedef_native.so")
    sys.exit(0)
