"""Round-9: profile the 16384^2 public scan tier (bgs1 g4 scan, mixed_fast)
to see where the ~97 ms goes — the carry-width bucketing that cuts the
Qbuf projection FLOPs 37.5% measured NO win (r9_scan_buckets.jsonl), so
either the projections are not the bottleneck (R-carry copies? panel
kernels?) or the narrowed GEMMs run proportionally slower.

Captures jax.profiler traces for bucketed vs MPBQR_NO_SCAN_BUCKETS=1
under experiments/prof/scan16k_{bucketed,full}/ (2 timed calls each).
Parse with experiments/trace_summary.py (note: its us/step divides by 4).

HISTORICAL (round-9): the bucketed variant was reverted at d2e164c; at
HEAD the knob is not consumed and both traces would profile identical
code.  The guard below fails loudly in that case (the 'full' arm alone
is still a valid profile of the shipping scan tier).
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import pathlib

_DRIVER_SRC = pathlib.Path(
    "/root/repo/mixedprecisionblockqr_tpu/ops/blockqr.py"
).read_text()
assert "MPBQR_NO_SCAN_BUCKETS" in _DRIVER_SRC, (
    "ops/blockqr.py no longer consumes MPBQR_NO_SCAN_BUCKETS — the "
    "width-bucketed scan variant was reverted at d2e164c; re-apply it "
    "before rerunning this profile A/B."
)

import numpy as np
import jax
import jax.numpy as jnp

from mixedprecisionblockqr_tpu.ops.blockqr import block_qr
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST

N = 16384
BASE = "/root/repo/experiments/prof"


def run(tag):
    a = np.random.default_rng(0).random((N, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    fn = jax.jit(lambda x: block_qr(
        x, 128, POLICY_MIXED_FAST, mode="complete", panel_method="auto",
        check="defer"))
    out = fn(A)
    jax.block_until_ready(out)
    jax.profiler.start_trace(os.path.join(BASE, tag))
    for _ in range(2):
        out = fn(A)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print("trace written:", tag, flush=True)


def main():
    os.environ.pop("MPBQR_NO_SCAN_BUCKETS", None)
    run("scan16k_bucketed")
    os.environ["MPBQR_NO_SCAN_BUCKETS"] = "1"
    run("scan16k_full")


if __name__ == "__main__":
    main()
