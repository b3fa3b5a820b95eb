"""Round-9: large-size refresh on the fused X/W chain (one v5e chip).

The 3072-12288 band (bgs1 g4) is issue-latency-bound on the same
in-kernel NS dots the fused recurrence shortens, so the round-8 numbers
(4096: 113.7-137.4 bimodal; 8192 BF16_FAST: 184.5; 16384 grouped scan:
109 TF) are re-measured on the public auto path.  One process, three
programs (relay-compile batching per CLAUDE.md); quality asserted per
size.  Appends JSONL records to r9_scale_refresh.jsonl.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import block_qr
from mixedprecisionblockqr_tpu.ops.policy import (
    POLICY_BF16_FAST,
    POLICY_MIXED_FAST,
)
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = "/root/repo/experiments/r9_scale_refresh.jsonl"

CASES = [
    # (n, policy-name, policy, iters, precision_bits)
    (4096, "mixed_fast", POLICY_MIXED_FAST, 48, 8),
    (8192, "bf16_fast", POLICY_BF16_FAST, 24, 8),
    (16384, "mixed_fast", POLICY_MIXED_FAST, 6, 8),
]


def main() -> None:
    for n, pname, policy, iters, bits in CASES:
        a = np.random.default_rng(0).random((n, n), dtype=np.float32) - 0.5
        A = jnp.asarray(a)

        def step(x):
            Q, Rf = block_qr(x, 128, policy, mode="complete",
                             panel_method="auto", check="defer")
            return x * (1.0 + 1e-12 * Rf[0, 0].astype(jnp.float32))

        sec = time_step_amortized(step, A, iters=iters, repeats=2)
        Q, Rf = block_qr(A, 128, policy, mode="complete",
                         panel_method="auto", check="defer")
        rep = metrics.evaluate(a, np.asarray(Q, np.float32),
                               np.asarray(Rf, np.float32),
                               precision_bits=bits)
        del Q, Rf, A
        rec = {
            "n": n,
            "policy": pname,
            "sec": sec,
            "tflops": qr_flops(n, n) / sec / 1e12,
            "backward": rep.backward,
            "orth": rep.orthogonality,
            "criteria_ok": rep.all_ok,
        }
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
