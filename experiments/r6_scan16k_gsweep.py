"""Round-6: 16384^2 grouped scan-BGS group-width sweep (single chip).

The scan driver is Qbuf-BANDWIDTH-bound at 16384^2 (BENCH_NOTES round-4:
each step reads the m x n buffer for the group projection, so traffic
~ 2*m*n*(nb/g) elements) — g4 was the round-4 winner at 134.5 ms /
109 TF (55% of bf16 peak).  Doubling g halves the dominant traffic but
widens the serialized in-group eager-projection chain (g-1 slices per
step) and grows the per-step R column block.  Sweep g in {4, 8, 16} at
the auto tier's config (bgs1, POLICY_MIXED_FAST, bf16-resident Qbuf) and
record the quality triple + amortized time.  nb = 128 panels (r=128), so
all three divide nb.  Writes experiments/r6_scan16k_gsweep.jsonl.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import block_qr
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = "/root/repo/experiments/r6_scan16k_gsweep.jsonl"
M = 16384


def main():
    a = np.random.default_rng(0).random((M, M), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    with open(OUT, "w") as f:
        for g in (4, 8, 16):
            @jax.jit
            def fn(x, g=g):
                return block_qr(
                    x, 128, POLICY_MIXED_FAST, mode="complete",
                    panel_method="bgs1", loop_mode="scan",
                    group_panels=g, check="off",
                )

            try:
                Q, R = fn(A)
                rep = metrics.evaluate(
                    a, np.asarray(Q, np.float32), np.asarray(R, np.float32),
                    precision_bits=8)

                def step(x, fn=fn):
                    Qc, Rc = fn(x)
                    return x * (1.0 + 1e-12 * Rc[0, 0].astype(jnp.float32))

                secs = time_step_amortized(step, A, iters=4)
                row = {"g": g, "ms": round(secs * 1e3, 2),
                       "tflops": round(qr_flops(M, M) / secs / 1e12, 1),
                       "backward": rep.backward,
                       "orth": rep.orthogonality,
                       "ok": bool(rep.all_ok)}
            except Exception as e:  # noqa: BLE001
                row = {"g": g, "ok": False, "error": str(e)[:200]}
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
