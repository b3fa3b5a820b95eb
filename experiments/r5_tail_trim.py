"""Round-5b: trim the robust-tail chain in the 2048^2 headline config.

The headline trace (experiments/prof/headline_r5) shows group 2's kernel at
110 us vs group 1's 80 us — the gap is the robust tail panel's shifted
three-pass chain (14+12+4 iterations at HIGHEST/emulated-HIGH).  The chain
lengths were set for UNIVERSAL convergence (any cond via the shift cap),
but the headline's trailing corner at 2048^2/g8 is far milder, and the NaN
canary + public retry guard hostile inputs loudly.  This sweeps
``robust_iters`` / ``mid_final`` and checks, per variant:

  * amortized time on the bench draw (iters=96, difference timing),
  * quality criteria + tight gate on the bench draw,
  * quality + canary on conditioned draws (cond 1e3 / 1e5 / 1e7 via the
    Bierlaire generator) and on 1024^2 (the aspect-8 silent-poison shape),
    asserting the poison does NOT fire on healthy inputs and the criteria
    still hold.

Writes experiments/r5_tail_trim.jsonl.  Usage: python experiments/r5_tail_trim.py
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.datagen import conditioned_matrix
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

M = N = 2048
OUT = "/root/repo/experiments/r5_tail_trim.jsonl"

VARIANTS = [
    # (name, robust_iters, mid_final)
    ("control_14_12_4_mf2", (14, 12, 4), 2),
    ("t_12_10_4_mf2", (12, 10, 4), 2),
    ("t_12_10_3_mf2", (12, 10, 3), 2),
    ("t_10_8_3_mf2", (10, 8, 3), 2),
    ("control_mf1", (14, 12, 4), 1),
    ("t_12_10_4_mf1", (12, 10, 4), 1),
]


def driver(robust_iters, mid_final, group_panels=8):
    @jax.jit
    def fn(A):
        R_full, Q, _ = _block_qr_bgs(
            A, 128, POLICY_MIXED_FAST, True, None,
            group_panels=group_panels, on_tpu=True, reorth=False,
            chain_mid=True, mid_final=mid_final,
            robust_iters=robust_iters,
        )
        return Q, R_full

    return fn


def main():
    rng = np.random.default_rng(0)
    a = rng.random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    # Conditioned + aspect-8 safety draws (checked, not timed).
    safety = []
    for cond in (1e3, 1e5, 1e7):
        As = conditioned_matrix(2048, condition_number=cond, seed=7)
        safety.append((f"cond{cond:.0e}", np.asarray(As, np.float32)))
    a1k = rng.random((1024, 1024), dtype=np.float32) - 0.5
    results = []
    with open(OUT, "w") as f:
        for name, ri, mf in VARIANTS:
            fn = driver(ri, mf)
            Q, R_full = fn(A)
            Qn, Rn = np.asarray(Q, np.float32), np.asarray(R_full, np.float32)
            rep = metrics.evaluate(a, Qn, Rn,
                                   precision_bits=POLICY_MIXED_FAST.precision_bits)
            ok = bool(rep.all_ok and rep.tight_ok and np.isfinite(Rn[0, 0]))
            # safety draws at 2048 g8 + the 1024^2 aspect-8 shape
            safe = True
            worst = {}
            if ok:
                for sname, As in safety:
                    Qs, Rs = fn(jnp.asarray(As))
                    Rs0 = np.asarray(Rs[0, 0])
                    reps = metrics.evaluate(
                        As, np.asarray(Qs, np.float32),
                        np.asarray(Rs, np.float32),
                        precision_bits=POLICY_MIXED_FAST.precision_bits)
                    good = bool(np.isfinite(Rs0) and reps.all_ok
                                and reps.tight_ok)
                    worst[sname] = {
                        "backward": reps.backward,
                        "orth": reps.orthogonality, "ok": good}
                    safe = safe and good
                fn1k = driver(ri, mf)
                Q1, R1 = fn1k(jnp.asarray(a1k))
                rep1 = metrics.evaluate(
                    a1k, np.asarray(Q1, np.float32),
                    np.asarray(R1, np.float32),
                    precision_bits=POLICY_MIXED_FAST.precision_bits)
                good1 = bool(np.isfinite(np.asarray(R1[0, 0]))
                             and rep1.all_ok and rep1.tight_ok)
                worst["1024"] = {"backward": rep1.backward,
                                 "orth": rep1.orthogonality, "ok": good1}
                safe = safe and good1

            us = tflops = None
            if ok:
                def step(x):
                    Qc, R = fn(x)
                    return x * (1.0 + 1e-12 * R[0, 0].astype(jnp.float32))

                seconds = time_step_amortized(step, A, iters=96)
                us = round(seconds * 1e6, 1)
                tflops = round(qr_flops(M, N) / seconds / 1e12, 1)
            row = {
                "variant": name, "robust_iters": list(ri), "mid_final": mf,
                "us": us, "tflops": tflops,
                "backward": rep.backward, "orth": rep.orthogonality,
                "ok": ok, "safe": safe, "safety": worst,
            }
            results.append(row)
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
