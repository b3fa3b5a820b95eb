"""Round-9: width-bucketed scan-BGS projections — on-chip A/B at 16384^2.

The grouped scan tier (auto for n > 12288) runs ONE Qbuf projection pass
per group against the FULL (m, n) buffer; on average only half the
columns are written, so half the projection FLOPs/HBM traffic multiply
zeros.  Width bucketing compiles 4 step bodies whose projections read a
static Qbuf prefix (avg width 0.625n), same math.  This measures the
public auto path (block_qr, POLICY_MIXED_FAST, check='defer') with the
knob on vs MPBQR_NO_SCAN_BUCKETS=1, INTERLEAVED in one process (the chip
is bimodal under tunnel contention — CLAUDE.md), and appends JSONL pairs
to r9_scan_buckets.jsonl.

HISTORICAL (round-9 negative result): bucketing measured dead even twice
and the variant was REVERTED at commit d2e164c ("Width-bucketed scan
projections: measured dead even at 16384^2, reverted") — HEAD's driver
does not consume MPBQR_NO_SCAN_BUCKETS.  The guard below makes a rerun
fail loudly instead of timing identical code in both arms; check out the
working-tree variant described in BENCH_NOTES round 9 to reproduce.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import pathlib

_DRIVER_SRC = pathlib.Path(
    "/root/repo/mixedprecisionblockqr_tpu/ops/blockqr.py"
).read_text()
assert "MPBQR_NO_SCAN_BUCKETS" in _DRIVER_SRC, (
    "ops/blockqr.py no longer consumes MPBQR_NO_SCAN_BUCKETS — the "
    "width-bucketed scan variant was reverted at d2e164c (measured dead "
    "even); re-apply it before rerunning this A/B."
)

import numpy as np
import jax
import jax.numpy as jnp

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import block_qr
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = "/root/repo/experiments/r9_scan_buckets.jsonl"
N = 16384
ITERS = 6
PAIRS = 3


def make_step():
    # env knobs are read at trace time; trace inside the current setting
    def step(x):
        Q, Rf = block_qr(x, 128, POLICY_MIXED_FAST, mode="complete",
                         panel_method="auto", check="defer")
        return x * (1.0 + 1e-12 * Rf[0, 0].astype(jnp.float32))

    return step


def main() -> None:
    a = np.random.default_rng(0).random((N, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)

    # One step-fn OBJECT per variant: the env knob is read at trace time
    # (first timing call); reusing the object across pairs reuses the
    # traced program, so later pairs time without retracing.
    step_by_variant = {"bucketed": make_step(), "full": make_step()}

    for p in range(PAIRS):
        for tag, env in (("bucketed", None), ("full", "1")):
            if env is None:
                os.environ.pop("MPBQR_NO_SCAN_BUCKETS", None)
            else:
                os.environ["MPBQR_NO_SCAN_BUCKETS"] = env
            sec = time_step_amortized(step_by_variant[tag], A,
                                      iters=ITERS, repeats=1)
            rec = {"design": "carry_width", "pair": p, "variant": tag, "sec": sec,
                   "tflops": qr_flops(N, N) / sec / 1e12}
            print(json.dumps(rec), flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")

    # quality check once, bucketed
    os.environ.pop("MPBQR_NO_SCAN_BUCKETS", None)
    Q, Rf = block_qr(A, 128, POLICY_MIXED_FAST, mode="complete",
                     panel_method="auto", check="defer")
    rep = metrics.evaluate(a, np.asarray(Q, np.float32),
                           np.asarray(Rf, np.float32), precision_bits=8)
    rec = {"design": "carry_width", "variant": "bucketed_quality", "backward": rep.backward,
           "orth": rep.orthogonality, "criteria_ok": rep.all_ok}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
