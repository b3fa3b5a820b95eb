"""Round-4 tier timing: (a) the bgs2 mid-tier's cost at the pinned 2048^2
config (BENCH_NOTES face-off row), (b) whether the bf16-resident lever
moves 4096^2 past cholqr1's 150 TF (perf-map update probe)."""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
from mixedprecisionblockqr_tpu.ops.policy import (
    POLICY_BF16_FAST,
    POLICY_MIXED,
    POLICY_MIXED_FAST,
)
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = "/root/repo/experiments/r4_tiers.jsonl"


def run(name, n, policy, iters=48, **kw):
    a = np.random.default_rng(0).random((n, n), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    drv = jax.jit(lambda x: _block_qr_bgs(
        x, 128, policy, True, None, on_tpu=True, **kw))
    R_full, Q, _ = drv(A)
    rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R_full),
                           precision_bits=8)

    def step(x):
        R_full, Qc, _ = drv(x)
        return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))

    sec = time_step_amortized(step, A, iters=iters)
    rec = {"variant": name, "n": n, "us": round(sec * 1e6, 1),
           "tflops": round(qr_flops(n, n) / sec / 1e12, 1),
           "backward": rep.backward, "orth": rep.orthogonality,
           "ok": bool(rep.all_ok), "tight": bool(rep.tight_ok)}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    cases = [
        # (a) bgs2 mid-tier at the pinned 2048 config
        ("bgs2_2048_g8", 2048, POLICY_MIXED,
         dict(reorth=True, mid_tier=True, group_panels=8)),
        ("bgs_2048_g8", 2048, POLICY_MIXED,
         dict(reorth=True, group_panels=8)),
        # (b) 4096 probe: does the bandwidth lever reach the 4096 regime?
        ("mf_4096_g4", 4096, POLICY_MIXED_FAST,
         dict(reorth=False, group_panels=4)),
        ("bf16res_4096_g4", 4096, POLICY_BF16_FAST,
         dict(reorth=False, group_panels=4)),
    ]
    for name, n, policy, kw in cases:
        try:
            run(name, n, policy, iters=48 if n == 2048 else 16, **kw)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
