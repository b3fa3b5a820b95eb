"""Round-5b capstone: refresh every BASELINE-config measurement on the
current code (omega chains + lifted VMEM caps), one process, real chip.

Configs (BASELINE.json / SURVEY section 6):
  1. 256^2  fp32 unblocked Householder     (reference config 1)
  2. 1024^2 fp32 blocked, auto quality     (config 2: fp32 -> 'high' bgs)
  3. 2048^2 mixed public auto              (config 3: the bench headline)
  4. 4096^2 mixed public auto              (band check: bgs1 g4)
  5. 8192^2 bf16-fast public auto          (HBM-bound regime)
  6. 100000x64 tall-skinny tsqr            (config 4: direct CholeskyQR2)

Each row: amortized seconds, TFLOP/s (reference FLOP model), the error
triple vs its policy's 2^-bits*m criteria + the tight sqrt(m) gate.
Writes experiments/r5_final_sweep.jsonl.  16384^2 is measured separately
(experiments/r5_scale_mid.jsonl; compile ~2 min through the relay).
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import mixedprecisionblockqr_tpu as mpq
from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import block_qr
from mixedprecisionblockqr_tpu.ops.householder import householder_qr
from mixedprecisionblockqr_tpu.ops.policy import (
    POLICY_BF16_FAST,
    POLICY_FP32,
    POLICY_MIXED_FAST,
)
from mixedprecisionblockqr_tpu.parallel.tsqr import tsqr
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = "/root/repo/experiments/r5_final_sweep.jsonl"


def measure(name, m, n, fn, bits, iters=96):
    a = np.random.default_rng(0).random((m, n), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    Q, R = fn(A)
    rep = metrics.evaluate(a, np.asarray(Q, np.float32),
                           np.asarray(R, np.float32), precision_bits=bits)

    def step(x):
        Qc, Rc = fn(x)
        return x * (1.0 + 1e-12 * Rc[0, 0].astype(jnp.float32))

    secs = time_step_amortized(step, A, iters=iters)
    return {
        "config": name, "m": m, "n": n, "seconds": round(secs, 6),
        "us": round(secs * 1e6, 1),
        "tflops": round(qr_flops(m, n) / secs / 1e12, 2),
        "backward": rep.backward, "orth": rep.orthogonality,
        "ok": bool(rep.all_ok), "tight": bool(rep.tight_ok),
    }


def main():
    rows = []
    cases = [
        ("256 fp32 unblocked householder", 256, 256,
         jax.jit(lambda A: householder_qr(A, mode="complete")), 23, 512),
        ("1024 fp32 auto (quality=high bgs)", 1024, 1024,
         jax.jit(lambda A: block_qr(A, 128, POLICY_FP32, mode="complete",
                                    panel_method="auto", check="defer")),
         23, 96),
        ("2048 mixed public auto [headline]", 2048, 2048,
         jax.jit(lambda A: block_qr(A, 128, POLICY_MIXED_FAST,
                                    mode="complete", panel_method="auto",
                                    check="defer")), 8, 96),
        ("4096 mixed public auto", 4096, 4096,
         jax.jit(lambda A: block_qr(A, 128, POLICY_MIXED_FAST,
                                    mode="complete", panel_method="auto",
                                    check="defer")), 8, 48),
        ("8192 bf16-fast public auto", 8192, 8192,
         jax.jit(lambda A: block_qr(A, 128, POLICY_BF16_FAST,
                                    mode="complete", panel_method="auto",
                                    check="defer")), 8, 24),
        ("100000x64 tsqr cholqr2", 100000, 64,
         jax.jit(lambda A: tsqr(A, method="cholqr2")), 23, 256),
    ]
    with open(OUT, "w") as f:
        for name, m, n, fn, bits, iters in cases:
            try:
                row = measure(name, m, n, fn, bits, iters)
            except Exception as e:  # noqa: BLE001
                row = {"config": name, "ok": False, "error": str(e)[:200]}
            rows.append(row)
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
