"""Round-8: block_size face-off at 2048^2 on the bgs1 group-kernel tier.

r=128 g8 is the locked headline (two group kernels, ~85% of whose time is
issue-latency-bound r x r NS dots).  Larger r halves the panel count
(fewer chain steps) at the cost of longer per-chain convergence
(tri_iters_for_aspect grows as aspect shrinks) and bigger in-kernel dots.
Sweep r x group_panels on the PUBLIC path; JSON lines to stdout + file.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import block_qr
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

M = N = 2048


def main():
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    out = open("/root/repo/experiments/r8_rsweep.jsonl", "a")
    for r, g in [(128, 8), (256, 4), (256, 8), (512, 4), (128, 16)]:
        def step(x, r=r, g=g):
            # bench.py's exact step convention (R-scalar feedback)
            Q, Rf = block_qr(x, r, POLICY_MIXED_FAST, mode="complete",
                             panel_method="bgs1", group_panels=g,
                             check="defer")
            return x * (1.0 + 1e-12 * Rf[0, 0].astype(jnp.float32))
        try:
            sec = time_step_amortized(step, A, iters=16, repeats=3)
            Q, Rf = block_qr(A, r, POLICY_MIXED_FAST, mode="complete",
                             panel_method="bgs1", group_panels=g,
                             check="defer")
            be = float(metrics.backward_error(A, Q, Rf))
            oe = float(metrics.orthogonality_error(Q))
            rec = {"r": r, "g": g, "sec": sec,
                   "tflops": qr_flops(M, N) / sec / 1e12,
                   "backward": be, "orth": oe}
        except Exception as e:  # noqa: BLE001
            rec = {"r": r, "g": g, "error": str(e)[:300]}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()


if __name__ == "__main__":
    main()
