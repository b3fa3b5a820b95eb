"""Headline benchmark: 2048x2048 mixed-precision blocked Householder QR on one
TPU chip (the BASELINE.json north-star config: fp32 panel + bf16 MXU GEMMs
with fp32 accumulation).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "TFLOP/s", "vs_baseline": N, ...}

``vs_baseline`` is measured TFLOP/s divided by the north-star target of 50%
of the chip's bf16 MXU peak (BASELINE.json: ">=50% of MXU peak per chip");
>= 1.0 means the target is met.  FLOPs use the reference's own analytic QR
model (``h_qr_flops_per_second``, ``Cuda/qr.cu:102-113``).  Error metrics are
asserted against the reference's acceptance criteria before timing counts.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_traced, block_qr
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import (
    device_peak_tflops,
    time_step_amortized,
)

M = N = 2048
BLOCK = 128
PANEL_METHOD = "cholqr1"  # all-MXU panel + Newton-Schulz reflector inverse


def main() -> int:
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)

    # Quality gate first (same program the timing loop runs).
    Q, R = block_qr(
        A, block_size=BLOCK, policy=POLICY_MIXED, mode="complete",
        panel_method=PANEL_METHOD,
    )
    rep = metrics.evaluate(a, Q, R, precision_bits=POLICY_MIXED.precision_bits)

    # Amortized device timing (tunnel-latency safe; utils/timing.py).
    def step(x):
        R_full, Qc, _ = _block_qr_traced(
            x, BLOCK, POLICY_MIXED, True, None, PANEL_METHOD
        )
        return x * (1.0 + 1e-12 * R_full[0, 0])

    seconds = time_step_amortized(step, A, iters=24)
    tflops = qr_flops(M, N) / seconds / 1e12
    peak = device_peak_tflops("bfloat16") or 197.0
    target = 0.5 * peak

    result = {
        "metric": f"{M}x{N} mixed-precision block QR (fp32 panel + bf16 MXU)",
        "value": round(tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / target, 4),
        "seconds": round(seconds, 5),
        "backward_error": rep.backward,
        "orthogonality_error": rep.orthogonality,
        "criteria_ok": rep.all_ok,
        "device": jax.devices()[0].device_kind,
        "block_size": BLOCK,
        "target_tflops_50pct_peak": target,
    }
    print(json.dumps(result))
    return 0 if rep.all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
