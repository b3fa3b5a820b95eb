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

Round-5: the timed program is the PUBLIC ``block_qr`` path end-to-end —
``panel_method='auto'`` dispatch + ``check='defer'`` (no host sync, pure —
so the whole public call traces into the in-jit timing loop), which resolves
to the bgs1 group-kernel configuration below (round-3 VERDICT item 3: the
bench must cost what a user's ``mpq.qr()`` costs; face-off vs the internal
driver in experiments/r5_faceoff.jsonl — public within noise of internal).
"""

import json
import os
import sys

import jax

# Persistent compilation cache: first TPU compiles go through a remote relay
# (10s-300s per program, occasionally 20+ min under contention — one round-9
# cold run was killed by exactly that).  The cache is keyed on HLO + backend
# config, verified to hit across processes on the tunneled backend (second
# fresh-process first-call 0.46s vs 10.46s), so a warmed cache makes every
# later cold `python bench.py` immune to relay weather.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass  # cache is an optimization, never a failure mode

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
# The auto dispatch (ops/blockqr.py::resolve_panel_config) resolves this
# config to: Block Gram-Schmidt 'bgs1', group_panels=8, robust_tail=1 —
# the whole per-GROUP factorization chain (8 panels' Gram + NS iterations
# + Q products + eager projections) as ONE Mosaic kernel
# (ops/pallas/ns.py::bgs_group_fused).  The drivers are op-DISPATCH bound
# (~0.7us per in-context XLA op), so chain fusion is the lever; round-5
# added emulated-HIGH (3-pass bf16 split) early NS iterations (chain_mid)
# — half of HIGHEST's MXU passes on the dominant in-kernel cost — for
# 272 -> ~245-250 us (experiments/r5_headline.jsonl, r5_faceoff.jsonl).
# POLICY_MIXED_FAST: bf16-resident Q output (the round-4 traffic cut).
POLICY = POLICY_MIXED_FAST


def main() -> int:
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)

    from mixedprecisionblockqr_tpu.ops.blockqr import block_qr

    # The public driver, jitted end-to-end: auto dispatch happens at trace
    # time, check='defer' adds no host synchronization (the NaN canary
    # rides in R[0,0] and is asserted by the quality gate below).
    # quality='fast' is pinned EXPLICITLY: block_qr's auto default is the
    # throughput rung anyway, but the headline must state its ladder rung
    # rather than inherit it (the convenience entry qr() defaults mixed
    # policies to 'balanced' — round-4 VERDICT weak item 4).
    public = jax.jit(
        lambda x: block_qr(
            x, BLOCK, POLICY, mode="complete", panel_method="auto",
            quality="fast", check="defer",
        )
    )

    # Quality gate first (the EXACT program the timing loop runs).
    Q, R_full = public(A)
    rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R_full),
                           precision_bits=POLICY.precision_bits)

    # Amortized device timing (tunnel-latency safe; utils/timing.py).
    def step(x):
        Qc, R_full = public(x)
        return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))

    # iters must be large enough that the differenced signal (iters *
    # step_time ~ 24 ms at 96) dominates the tunnel's ~5 ms fetch-latency
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
        "timed_path": "public block_qr(panel_method='auto', check='defer')",
    }
    print(json.dumps(result))
    return 0 if (rep.all_ok and rep.tight_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
