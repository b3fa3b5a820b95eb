"""Round-6: the quality ladder at scale, on-chip (post corner-leak rescrub
+ fp32-Q return — BENCH_NOTES round-5c).

The 2048^2 ladder anchors are re-measured in r6_ladder_rescrub.py; this
fills in the SCALE rows: 'balanced' (bgs2) at 4096/8192 (unrolled, g4 —
the auto map's band) and at 16384 (grouped scan, the >12288 tier), all
single-chip mixed policy, plus 4096 fp32 'high'.  Writes
experiments/r6_ladder_scale.jsonl.

Expected from the CPU-mesh cert analogy: orth collapses from the 1e-4
class to fp32 roundoff at every size (the corner leak was the floor);
cost ~ one extra Qbuf double-pass (scan) / one rescrub per tail panel.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import qr
from mixedprecisionblockqr_tpu.ops.policy import POLICY_FP32, POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = "/root/repo/experiments/r6_ladder_scale.jsonl"

CASES = [
    (4096, POLICY_MIXED_FAST, "balanced", 8, 48),
    (4096, POLICY_FP32, "high", 23, 48),
    (8192, POLICY_MIXED_FAST, "balanced", 8, 16),
    (16384, POLICY_MIXED_FAST, "balanced", 8, 4),
]


def main():
    with open(OUT, "w") as f:
        for m, pol, quality, bits, iters in CASES:
            a = np.random.default_rng(0).random((m, m), dtype=np.float32)
            a -= 0.5
            A = jnp.asarray(a)

            @jax.jit
            def fn(x, pol=pol, quality=quality):
                return qr(x, policy=pol, mode="complete", quality=quality,
                          check="defer")

            try:
                Q, R = fn(A)
                rep = metrics.evaluate(
                    a, np.asarray(Q, np.float32), np.asarray(R, np.float32),
                    precision_bits=bits)

                def step(x, fn=fn):
                    Qc, Rc = fn(x)
                    return x * (1.0 + 1e-12 * Rc[0, 0].astype(jnp.float32))

                secs = time_step_amortized(step, A, iters=iters)
                row = {"m": m, "policy": pol.name, "quality": quality,
                       "ms": round(secs * 1e3, 3),
                       "tflops": round(qr_flops(m, m) / secs / 1e12, 1),
                       "backward": rep.backward,
                       "orth": rep.orthogonality,
                       "ok": bool(rep.all_ok), "tight": bool(rep.tight_ok)}
            except Exception as e:  # noqa: BLE001
                row = {"m": m, "policy": pol.name, "quality": quality,
                       "ok": False, "error": str(e)[:200]}
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
