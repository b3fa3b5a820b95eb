"""Round-4 (round-2 VERDICT item 7 territory): 8192^2 throughput attack.

Traffic model (BENCH_NOTES round-4): at 8192^2 the BGS driver is
HBM-bound on the fp32-resident trailing matrix (~4.3 GB of trailing
read+write across 16 groups at g4 = ~5 ms of the 18.3 ms), not VMEM-capped
kernels.  Levers tested, per-panel-kernel path (group kernel stays
VMEM-capped at this m — the 'streamed group kernel' answer is that the
kernel was never the bottleneck):

  control   — MIXED_FAST g4 (round-3 recommended config, 18.3 ms/100 TF)
  bf16res   — POLICY_BF16_FAST g4: bf16-resident A halves trailing passes
  bf16res_g8— + groups of 8: halves the number of trailing passes again
  mf_g8     — MIXED_FAST g8 (isolate the group-width effect at fp32-res)
Each with the round-4 robust-tail default (5 instead of 8 robust panels).
"""

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
    POLICY_MIXED_FAST,
)
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

M = N = 8192
BLOCK = 128
OUT = "/root/repo/experiments/r4_scale8k.jsonl"


def run(name, A, a_np, policy, group_panels, iters=8):
    drv = jax.jit(lambda x: _block_qr_bgs(
        x, BLOCK, policy, True, None, group_panels=group_panels,
        on_tpu=True, reorth=False))
    R_full, Q, _ = drv(A)
    rep = metrics.evaluate(a_np, np.asarray(Q), np.asarray(R_full),
                           precision_bits=8)

    def step(x):
        R_full, Qc, _ = drv(x)
        return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))

    sec = time_step_amortized(step, A, iters=iters)
    rec = {"variant": name, "ms": round(sec * 1e3, 2),
           "tflops": round(qr_flops(M, N) / sec / 1e12, 1),
           "backward": rep.backward, "orth": rep.orthogonality,
           "ok": bool(rep.all_ok), "tight": bool(rep.tight_ok)}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    for name, policy, g in [
        ("control_mf_g4", POLICY_MIXED_FAST, 4),
        ("bf16res_g4", POLICY_BF16_FAST, 4),
        ("bf16res_g8", POLICY_BF16_FAST, 8),
        ("mf_g8", POLICY_MIXED_FAST, 8),
    ]:
        try:
            run(name, A, a, policy, g)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()


def flagship16k():
    """BF16-resident lever at 16384^2 (scan-BGS, the compile-light path).
    Round-3: MIXED_FAST bgs1-scan = 215 ms.  Same HBM argument, 4x the
    traffic."""
    m = n = 16384
    from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs_scan

    # Device-side data + metrics: host<->device transfers of 16384^2
    # buffers cost minutes over the tunnel and starved earlier attempts.
    A = jax.random.uniform(jax.random.PRNGKey(0), (m, n),
                           jnp.float32, -0.5, 0.5)
    A = jax.block_until_ready(A)
    for name, policy in [("scan16k_bf16res", POLICY_BF16_FAST),
                         ("scan16k_mf", POLICY_MIXED_FAST)]:
        try:
            drv = jax.jit(lambda x: _block_qr_bgs_scan(
                x, 128, policy, True, None, on_tpu=True, reorth=False))
            R_full, Q, _ = drv(A)
            rep = metrics.evaluate(A, Q, R_full, precision_bits=8)

            def step(x):
                R_full, Qc, _ = drv(x)
                return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))

            sec = time_step_amortized(step, A, iters=4)
            rec = {"variant": name, "ms": round(sec * 1e3, 1),
                   "tflops": round(qr_flops(m, n) / sec / 1e12, 1),
                   "backward": rep.backward, "orth": rep.orthogonality,
                   "ok": bool(rep.all_ok), "tight": bool(rep.tight_ok)}
            print(json.dumps(rec), flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


def flagship16k_grouped():
    """Grouped scan (one Qbuf pass per GROUP): divides the dominant m x n
    buffer traffic by g at 16384^2."""
    m = n = 16384
    from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs_scan

    A = jax.random.uniform(jax.random.PRNGKey(0), (m, n),
                           jnp.float32, -0.5, 0.5)
    A = jax.block_until_ready(A)
    for name, g in [("scan16k_g4", 4), ("scan16k_g8", 8)]:
        try:
            drv = jax.jit(lambda x: _block_qr_bgs_scan(
                x, 128, POLICY_MIXED_FAST, True, None, on_tpu=True,
                reorth=False, group_panels=g))
            R_full, Q, _ = drv(A)
            rep = metrics.evaluate(A, Q, R_full, precision_bits=8)

            def step(x):
                R_full, Qc, _ = drv(x)
                return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))

            sec = time_step_amortized(step, A, iters=4)
            rec = {"variant": name, "ms": round(sec * 1e3, 1),
                   "tflops": round(qr_flops(m, n) / sec / 1e12, 1),
                   "backward": rep.backward, "orth": rep.orthogonality,
                   "ok": bool(rep.all_ok), "tight": bool(rep.tight_ok)}
            print(json.dumps(rec), flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)
