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


def batch2():
    # Quality tiers at g4 (g8 lets single-pass drift span 8 panels and
    # forfeits the reorth benefit: measured orth 7.5e-2 at g8 vs round-3's
    # 2.7e-2 at g4); plus a clean re-measure of the 4096 bf16res timing
    # (first read glitched to ~0).
    cases = [
        ("bgs2_2048_g4", 2048, POLICY_MIXED,
         dict(reorth=True, mid_tier=True, group_panels=4)),
        ("bgs_2048_g4", 2048, POLICY_MIXED,
         dict(reorth=True, group_panels=4)),
        ("bf16res_4096_g4_b", 4096, POLICY_BF16_FAST,
         dict(reorth=False, group_panels=4)),
        ("bf16res_4096_g8", 4096, POLICY_BF16_FAST,
         dict(reorth=False, group_panels=8)),
    ]
    for name, n, policy, kw in cases:
        try:
            run(name, n, policy, iters=48 if n == 2048 else 24, **kw)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


def batch3():
    # Isolate the quality-tier orth regression: robust_tail 1 (new default)
    # vs 2 (round-3) for the reorth tiers at g4.
    for name, kw in [
        ("bgs_2048_g4_rt2", dict(reorth=False,)),  # placeholder replaced below
    ]:
        pass
    cases = [
        ("bgs_2048_g4_rt2", 2048, POLICY_MIXED,
         dict(reorth=True, group_panels=4, robust_tail=2)),
        ("bgs2_2048_g4_rt2", 2048, POLICY_MIXED,
         dict(reorth=True, mid_tier=True, group_panels=4, robust_tail=2)),
    ]
    for name, n, policy, kw in cases:
        try:
            run(name, n, policy, iters=48, **kw)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


def batch4():
    # HIGH-precision reorth scrub (the fix): quality tiers re-measured.
    cases = [
        ("bgs2_2048_g4_hi", 2048, POLICY_MIXED,
         dict(reorth=True, mid_tier=True, group_panels=4)),
        ("bgs2_2048_g8_hi", 2048, POLICY_MIXED,
         dict(reorth=True, mid_tier=True, group_panels=8)),
        ("bgs_2048_g4_hi", 2048, POLICY_MIXED,
         dict(reorth=True, group_panels=4)),
    ]
    for name, n, policy, kw in cases:
        try:
            run(name, n, policy, iters=48, **kw)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


def batch5():
    # Final ladder: bgs1 / bgs2 (HIGH reorth) / bgs (HIGHEST reorth),
    # all-HIGHEST in-kernel for the reorth tiers.
    cases = [
        ("ladder_bgs1_g8", 2048, POLICY_MIXED,
         dict(reorth=False, group_panels=8)),
        ("ladder_bgs2_g4", 2048, POLICY_MIXED,
         dict(reorth=True, mid_tier=True, group_panels=4)),
        ("ladder_bgs_g4", 2048, POLICY_MIXED,
         dict(reorth=True, group_panels=4)),
    ]
    for name, n, policy, kw in cases:
        try:
            run(name, n, policy, iters=48, **kw)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)
