"""Round-5 headline attack: cut the NS-chain MXU passes inside the group
kernel.

BENCH_NOTES round-4 calibration: NS iteration count is the dominant
group-kernel cost (~1us per in-kernel 128^3 HIGHEST dot) and iters-1
NaN-poisons — the chain LENGTH is already minimal.  This round attacks the
COST PER ITERATION instead: `chain_mid` runs all but the final 2 iterations
of every non-refine chain at emulated Precision.HIGH (3-pass bf16 Dekker
split — Mosaic rejects HIGH natively) — half of HIGHEST's 6 MXU passes,
error class ~2^-16 per dot vs the single-pass 2^-8 that NaN'd on chip in
round 4 (`chain_cheap`).

Variants over the pinned config (2048^2, complete Q, block 128, g8,
POLICY_MIXED_FAST, robust_tail=1):
  control        — the round-4 headline (re-measured, same session)
  chain_mid      — 3-pass early NS iterations
  chain_mid_g4   — same at group_panels=4 (fewer panels/kernel; re-check
                   the g4-vs-g8 face-off under the cheaper chains)
Each variant: quality triple + amortized seconds + TFLOP/s.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

M = N = 2048
BLOCK = 128
OUT = "/root/repo/experiments/r5_headline.jsonl"


def run_variant(name, A, a_np, policy=POLICY_MIXED_FAST, iters=96, **kw):
    kw.setdefault("robust_tail", 1)
    kw.setdefault("group_panels", 8)

    def fn(x):
        return _block_qr_bgs(x, BLOCK, policy, True, None, on_tpu=True,
                             reorth=False, **kw)

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
    for name, kw in [
        ("control", dict()),
        ("chain_mid", dict(chain_mid=True)),
        ("chain_mid_g4", dict(chain_mid=True, group_panels=4)),
        ("chain_mid_b", dict(chain_mid=True)),
    ]:
        try:
            run_variant(name, A, a, **kw)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def batch2():
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    for name, kw in [
        ("mid_hoist", dict(chain_mid=True)),
        ("mid1", dict(chain_mid=True, mid_final=1)),
        ("mid1_rfast", dict(chain_mid=True, mid_final=1,
                            robust_iters=(10, 8, 4))),
        ("mid_hoist_b", dict(chain_mid=True)),
    ]:
        try:
            run_variant(name, A, a, **kw)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "batch2":
    batch2()
