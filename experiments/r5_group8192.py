"""Round-5b: does the raised per-kernel VMEM limit pay at 8192^2?

The 8192 champion is bgs1 g4 with POLICY_BF16_FAST (bf16-resident A and
Q — the HBM-bound regime, 155.8 TF recorded round-4).  The group kernel
is gated out there by the buffer quota (m*r*g*4 = 16.8 MB fp32 > 10 MB);
with per-kernel scoped-VMEM lifted it COMPILES — but the kernel's aliased
buffer is fp32, so for bf16-resident policies it doubles the panel-column
traffic the per-panel path avoids.  This measures both, same session:

  * ship: public auto path (bgs1 g4, per-panel kernels) x POLICY_BF16_FAST
  * group_g4 / group_g2: _block_qr_bgs with the group kernel forced
    (MPBQR_GROUP_ANY_M=1 lifts the driver quota)

Writes experiments/r5_group8192.jsonl.
"""

import json
import os
import sys

os.environ["MPBQR_GROUP_ANY_M"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs, block_qr
from mixedprecisionblockqr_tpu.ops.policy import POLICY_BF16_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

M = 8192
OUT = "/root/repo/experiments/r5_group8192.jsonl"


def main():
    a = np.random.default_rng(0).random((M, M), dtype=np.float32) - 0.5
    A = jnp.asarray(a)

    variants = {
        "ship_auto": jax.jit(lambda x: block_qr(
            x, 128, POLICY_BF16_FAST, mode="complete",
            panel_method="auto", check="defer")),
    }
    for g in (4, 2):
        def drv(x, g=g):
            R_full, Q, _ = _block_qr_bgs(
                x, 128, POLICY_BF16_FAST, True, None, group_panels=g,
                on_tpu=True, reorth=False, chain_mid=True,
            )
            return Q, R_full
        variants[f"group_g{g}"] = jax.jit(drv)

    with open(OUT, "w") as f:
        for name, fn in variants.items():
            try:
                Q, R_full = fn(A)
                rep = metrics.evaluate(
                    a, np.asarray(Q, np.float32),
                    np.asarray(R_full, np.float32),
                    precision_bits=POLICY_BF16_FAST.precision_bits)
                ok = bool(rep.all_ok and rep.tight_ok
                          and np.isfinite(np.asarray(R_full[0, 0])))

                def step(x, fn=fn):
                    Qc, R = fn(x)
                    return x * (1.0 + 1e-12 * R[0, 0].astype(jnp.float32))

                secs = time_step_amortized(step, A, iters=24)
                row = {"variant": name, "us": round(secs * 1e6, 1),
                       "tflops": round(qr_flops(M, M) / secs / 1e12, 1),
                       "backward": rep.backward,
                       "orth": rep.orthogonality, "ok": ok}
            except Exception as e:  # noqa: BLE001
                row = {"variant": name, "ok": False, "error": str(e)[:200]}
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
