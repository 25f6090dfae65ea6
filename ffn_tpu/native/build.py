#!/usr/bin/env python3
"""Builds the native (C++) components of ffn_tpu.

Usage: python -m ffn_tpu.native.build
Produces ffn_tpu/native/libffn_native.so. The Python wrappers fall back to
scipy implementations when the library is absent, so building is optional
(but recommended: the EDT dominates PolicyPeaks seeding time on large
subvolumes).
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = ["edt.cc"]
OUTPUT = os.path.join(HERE, "libffn_native.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", "-o", OUTPUT]
    cmd += [os.path.join(HERE, s) for s in SOURCES]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUTPUT


if __name__ == "__main__":
    build()
    print(f"built {OUTPUT}")
