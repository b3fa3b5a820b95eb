"""Round-6: quality ladder on-chip after the corner-leak rescrub.

The round-5b ladder-floor isolation (experiments/r5_ladder_floor.jsonl +
the Q^T Q block map) found the reorth tiers' orthogonality floor was NOT
projection precision but the robust tail panel's post-factorization
leak: the pre-factorization BCGS2 scrub's leftovers get amplified by the
trailing corner's conditioning (~kappa), leaving that panel's cross
terms ~5e-5 (fp32) above everything else's roundoff.  The rescrub
(ops/blockqr.py::_block_qr_bgs._tail_rescrub and the scan/dist mirrors)
projects the FINISHED panel once more and refolds exactly.

Re-measure the public ladder on-chip at the BENCH_NOTES anchor configs:
  * 2048^2 mixed  quality = fast / balanced / high   (prev: 7.5e-2 /
    5.7e-4 / 3.4e-5)
  * 1024^2 + 2048^2 fp32 quality = high               (prev: 5.6e-5 /
    6.1e-5 — the r5_ladder_floor floor)

Writes experiments/r6_ladder_rescrub.jsonl.
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

OUT = "/root/repo/experiments/r6_ladder_rescrub.jsonl"

CASES = [
    (2048, POLICY_MIXED_FAST, "fast", 8),
    (2048, POLICY_MIXED_FAST, "balanced", 8),
    (2048, POLICY_MIXED_FAST, "high", 8),
    (1024, POLICY_FP32, "high", 23),
    (2048, POLICY_FP32, "high", 23),
]


def main():
    with open(OUT, "w") as f:
        for m, pol, quality, bits in CASES:
            a = np.random.default_rng(0).random((m, m), dtype=np.float32)
            a -= 0.5
            A = jnp.asarray(a)

            @jax.jit
            def fn(x, pol=pol, quality=quality):
                Q, R = qr(x, policy=pol, mode="complete", quality=quality,
                          check="defer")
                return Q, R

            try:
                Q, R = fn(A)
                rep = metrics.evaluate(
                    a, np.asarray(Q, np.float32), np.asarray(R, np.float32),
                    precision_bits=bits)

                def step(x, fn=fn):
                    Qc, Rc = fn(x)
                    return x * (1.0 + 1e-12 * Rc[0, 0].astype(jnp.float32))

                secs = time_step_amortized(step, A, iters=96)
                row = {"m": m, "policy": pol.name, "quality": quality,
                       "us": round(secs * 1e6, 1),
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
