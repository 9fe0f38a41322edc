"""Build the native host-runtime library.

Usage: python -m similaripy_tpu.native.build

Plain g++ -> shared object; no Python headers needed (ctypes ABI). The
engine works without it (NumPy/SciPy fallbacks in assembly.py), but the
native path removes the scipy COO->CSR sort from the output hot path.
"""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "simtpu.cpp")
    out = os.path.join(here, "libsimtpu.so")
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        out,
        src,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
