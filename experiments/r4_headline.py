"""Round-4 headline attack: trim the non-GEMM ~100us at 2048^2 bgs1-g8.

Variants over the pinned config (2048^2, complete Q, block 128, g8):
  control        — bgs1 g8 POLICY_MIXED (the round-3 headline)
  mixed_fast     — q_store bf16 (output-cast only for BGS; expect ~neutral)
  bf16_resident  — POLICY_BF16: A rides bf16 between groups (halves the
                   trailing-GEMM input traffic + kernel staging casts)
  robust1        — one robust tail panel instead of two (the second-to-last
                   panel takes the plain chain + extra iters)
  iters-1/-2     — shorter NS chains on clean panels
  combo          — best of the above together
Each variant: quality triple (must pass acceptance AND the sqrt(m) tight
gate) + amortized seconds + TFLOP/s by the reference FLOP model.
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
    POLICY_BF16,
    POLICY_MIXED,
    POLICY_MIXED_FAST,
)
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

M = N = 2048
BLOCK = 128
G = 8
OUT = "/root/repo/experiments/r4_headline.jsonl"


def run_variant(name, A, a_np, policy, iters_delta=0, robust_tail=None,
                group_panels=G, iters=96):
    def fn(x):
        return _block_qr_bgs(
            x, BLOCK, policy, True, None, group_panels=group_panels,
            on_tpu=True, reorth=False, iters_delta=iters_delta,
            robust_tail=robust_tail,
        )

    jfn = jax.jit(fn)
    R_full, Q, _ = jfn(A)
    rep = metrics.evaluate(a_np, np.asarray(Q), np.asarray(R_full),
                           precision_bits=8)

    def step(x):
        R_full, Qc, _ = jfn(x)
        return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))

    sec = time_step_amortized(step, A, iters=iters)
    tf = qr_flops(M, N) / sec / 1e12
    rec = {
        "variant": name, "us": round(sec * 1e6, 1), "tflops": round(tf, 1),
        "backward": rep.backward, "orth": rep.orthogonality,
        "ok": bool(rep.all_ok), "tight": bool(rep.tight_ok),
    }
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    variants = [
        ("control", dict(policy=POLICY_MIXED)),
        ("mixed_fast", dict(policy=POLICY_MIXED_FAST)),
        ("bf16_resident", dict(policy=POLICY_BF16)),
        ("robust1", dict(policy=POLICY_MIXED, robust_tail=1)),
        ("iters-1", dict(policy=POLICY_MIXED, iters_delta=-1)),
        ("iters-2", dict(policy=POLICY_MIXED, iters_delta=-2)),
        ("robust1_iters-1", dict(policy=POLICY_MIXED, robust_tail=1,
                                 iters_delta=-1)),
        ("bf16_robust1_iters-1", dict(policy=POLICY_BF16, robust_tail=1,
                                      iters_delta=-1)),
    ]
    for name, kw in variants:
        try:
            run_variant(name, A, a, **kw)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()


def batch2():
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    variants = [
        ("mf_robust1", dict(policy=POLICY_MIXED_FAST, robust_tail=1)),
        ("mf_robust1_b", dict(policy=POLICY_MIXED_FAST, robust_tail=1)),
        ("control_b2", dict(policy=POLICY_MIXED)),
        ("mf_robust1_g4", dict(policy=POLICY_MIXED_FAST, robust_tail=1,
                               group_panels=4)),
    ]
    for name, kw in variants:
        try:
            run_variant(name, A, a, **kw)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


def run_variant2(name, A, a_np, policy, tail_bump=4, iters=96, **kw):
    def fn(x):
        return _block_qr_bgs(
            x, BLOCK, policy, True, None, on_tpu=True, reorth=False,
            tail_bump=tail_bump, **kw,
        )

    jfn = jax.jit(fn)
    R_full, Q, _ = jfn(A)
    rep = metrics.evaluate(a_np, np.asarray(Q), np.asarray(R_full),
                           precision_bits=8)

    def step(x):
        R_full, Qc, _ = jfn(x)
        return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))

    sec = time_step_amortized(step, A, iters=iters)
    tf = qr_flops(M, N) / sec / 1e12
    rec = {"variant": name, "us": round(sec * 1e6, 1),
           "tflops": round(tf, 1), "backward": rep.backward,
           "orth": rep.orthogonality, "ok": bool(rep.all_ok),
           "tight": bool(rep.tight_ok)}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def batch3():
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    for name, kw in [
        ("mf_r1_tb2", dict(policy=POLICY_MIXED_FAST, robust_tail=1,
                           tail_bump=2, group_panels=G)),
        ("mf_r1_tb3", dict(policy=POLICY_MIXED_FAST, robust_tail=1,
                           tail_bump=3, group_panels=G)),
    ]:
        try:
            run_variant2(name, A, a, **kw)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


def batch4():
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    for name, kw in [
        ("mf_r1_cheap", dict(policy=POLICY_MIXED_FAST, robust_tail=1,
                             group_panels=G, chain_cheap=True)),
        ("mf_r1_cheap_b", dict(policy=POLICY_MIXED_FAST, robust_tail=1,
                               group_panels=G, chain_cheap=True)),
        ("mf_r1_ref", dict(policy=POLICY_MIXED_FAST, robust_tail=1,
                           group_panels=G)),
    ]:
        try:
            run_variant2(name, A, a, **kw)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)
