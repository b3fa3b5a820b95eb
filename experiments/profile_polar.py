"""Capture jax.profiler traces of one 2048^2 QR step: polar-g8 vs cholqr1.

Writes traces under experiments/prof/{polar,cholqr1}; then parses the
.trace.json.gz (if present) to print the top-20 ops by total duration.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixedprecisionblockqr_tpu.ops.blockqr import _jitted_driver
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "prof")


def run_one(tag, panel_method, group):
    outdir = os.path.join(BASE, tag)
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(0)
    A0 = jnp.asarray(rng.standard_normal((2048, 2048)).astype(np.float32))
    fn = _jitted_driver(128, POLICY_MIXED, True, False, panel_method,
                        "unroll", True, group)
    jax.block_until_ready(fn(A0))  # compile + warm
    jax.profiler.start_trace(outdir)
    for _ in range(4):
        out = fn(A0)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print(f"{tag}: trace written", flush=True)


def summarize(tag):
    files = glob.glob(os.path.join(BASE, tag, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print(f"{tag}: NO trace.json.gz found "
              f"({glob.glob(os.path.join(BASE, tag, '**', '*'), recursive=True)[:10]})")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            # keep device-lane events only (heuristic: XLA op names)
            tot[name] += ev["dur"]
            cnt[name] += 1
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:25]
    print(f"--- {tag}: top ops by total us (4 steps) ---")
    for name, us in rows:
        print(f"{us:10.1f} us  x{cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    run_one("polar", "polar", 4)
    run_one("cholqr1", "cholqr1", 4)
    summarize("polar")
    summarize("cholqr1")
