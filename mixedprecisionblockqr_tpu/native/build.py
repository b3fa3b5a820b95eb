"""Build the native helpers: ``python -m mixedprecisionblockqr_tpu.native.build``."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SO = os.path.join(HERE, "libeuroc_parser.so")
SRC = os.path.join(HERE, "euroc_parser.cpp")


def build(force: bool = False) -> str | None:
    """Compile the parser .so if needed; returns its path or None."""
    if not force and os.path.exists(SO) and os.path.getmtime(SO) >= os.path.getmtime(SRC):
        return SO
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O2", "-fPIC", "-shared", "-std=c++17", "-Wall", "-o", SO, SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native build failed: {e}", file=sys.stderr)
        return None
    return SO


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path or "FAILED")
    sys.exit(0 if path else 1)
