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
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import (
    device_peak_tflops,
    time_step_amortized,
)

M = N = 2048
BLOCK = 128
# Block Gram-Schmidt with triangular Newton-Schulz panels
# (ops/blockqr.py::_block_qr_bgs, single-pass): no chol/solve custom
# calls, Q materializes by concatenation (zero Q-update GEMMs), and — the
# round-3 lever — the whole per-GROUP factorization chain (4 panels'
# Gram + NS iterations + Q products + eager projections) runs as ONE
# Mosaic kernel (ops/pallas/ns.py::bgs_group_fused; the drivers are
# op-dispatch-bound at ~0.7us/XLA-op, so chain fusion is what XLA alone
# cannot express).  Face-off at this config (experiments/r3_ns_kernel
# .jsonl): group-of-8 292us / 98 TFLOP/s (the 50%-of-peak target),
# group-of-4 330us / 87, vs 574us / 50 for the round-2 XLA chain and
# 990us / 29 for round-1 cholqr1.  'bgs' (reorthogonalized) and 'polar'
# are the tighter-orthogonality tiers; 'householder' the robust tier.
PANEL_METHOD = "bgs1"
GROUP_PANELS = 8
# Round-4 additions on top (experiments/r4_headline.jsonl, same-session
# face-off vs the round-3 config at 331-337 us): bf16-resident Q output
# (POLICY_MIXED_FAST: -27 us of output traffic) and ONE robust tail panel
# instead of two (-39 us; quality identical, the poison canary guards
# hostile data loudly) -> 272-316 us / 90-105 TFLOP/s across the session.
# Negative result recorded: bf16 early NS iterations (chain_cheap)
# NaN-poisoned ON CHIP despite passing in interpret mode.
ROBUST_TAIL = 1
POLICY = POLICY_MIXED_FAST


def main() -> int:
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)

    from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs

    driver = jax.jit(
        lambda x: _block_qr_bgs(
            x, BLOCK, POLICY, True, None, group_panels=GROUP_PANELS,
            on_tpu=True, reorth=False, robust_tail=ROBUST_TAIL,
        )
    )

    # Quality gate first (the EXACT program the timing loop runs).
    R_full, Q, _ = driver(A)
    rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R_full),
                           precision_bits=POLICY.precision_bits)

    # Amortized device timing (tunnel-latency safe; utils/timing.py).
    def step(x):
        R_full, Qc, _ = driver(x)
        return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))

    # iters must be large enough that the differenced signal (iters *
    # step_time ~ 28 ms at 96) dominates the tunnel's ~5 ms fetch-latency
    # noise: iters=24 measured a physically impossible 410 TFLOP/s once
    # (noise comparable to the 7 ms signal).
    seconds = time_step_amortized(step, A, iters=96)
    tflops = qr_flops(M, N) / seconds / 1e12
    peak = device_peak_tflops("bfloat16") or 197.0
    target = 0.5 * peak
    if tflops > 0.75 * peak:
        # No QR driver reaches 75% of raw matmul peak — an implausibly
        # high reading means the measurement was noise-corrupted;
        # re-measure with a longer chain and keep the conservative value.
        seconds2 = time_step_amortized(step, A, iters=192)
        seconds = max(seconds, seconds2)
        tflops = qr_flops(M, N) / seconds / 1e12

    result = {
        "metric": f"{M}x{N} mixed-precision block QR (fp32 panel + bf16 MXU)",
        "value": round(tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / target, 4),
        "seconds": round(seconds, 5),
        "backward_error": rep.backward,
        "orthogonality_error": rep.orthogonality,
        "criteria_ok": rep.all_ok,
        # Secondary regression gate 2^-bits*sqrt(m) (ops/metrics.py::
        # tight_limit) — the reference's 2^-bits*m acceptance bound alone
        # cannot fail at this m; this one can.
        "tight_ok": rep.tight_ok,
        "device": jax.devices()[0].device_kind,
        "block_size": BLOCK,
        "target_tflops_50pct_peak": target,
    }
    print(json.dumps(result))
    return 0 if (rep.all_ok and rep.tight_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
