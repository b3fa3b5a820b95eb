"""Round-5b: does the omega burst make chain_cheap (single-pass bf16 NS
iterations) viable ON CHIP — and faster than chain_mid?

Round-4 recorded chain_cheap as a hard negative: it passed interpret mode
and NaN'd on compiled Mosaic, so the headline shipped chain_mid (3-pass
bf16 Dekker split) instead.  The omega=1.5 burst changes the iteration's
dynamics (stronger early contraction of the error), and the seeded
regression test now observes chain_cheap CONVERGING on chip (backward
2.4e-3 / orth 0.081, tight gate passes).  Single-pass iterations cost 1
MXU pass vs chain_mid's 3 on the dominant in-kernel dots, so if quality
holds this is the next headline lever.

Measures, on chip: 2048^2 bgs1 g8 robust_tail=1 under (a) chain_mid
[shipping], (b) chain_cheap, (c) chain_cheap+chain_mid (cheap early, mid
late) — amortized time, quality on the bench draw, and canary/criteria on
the safety draws (cond-1e3 2048, uniform 1024).  Writes
experiments/r5_cheap.jsonl.
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
from mixedprecisionblockqr_tpu.utils.datagen import conditioned_matrix
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

M = 2048
OUT = "/root/repo/experiments/r5_cheap.jsonl"

VARIANTS = [
    ("mid_ship", dict(chain_mid=True, chain_cheap=False)),
    ("cheap", dict(chain_mid=False, chain_cheap=True)),
    ("cheap_mid", dict(chain_mid=True, chain_cheap=True, mid_final=2)),
]


def driver(m, r, g, kw):
    @jax.jit
    def fn(A):
        R_full, Q, _ = _block_qr_bgs(
            A, r, POLICY_MIXED_FAST, True, None, group_panels=g,
            on_tpu=True, reorth=False, robust_tail=1, **kw,
        )
        return Q, R_full

    return fn


def main():
    rng = np.random.default_rng(0)
    a = rng.random((M, M), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    safety = [
        ("cond1e3_2048",
         conditioned_matrix(2048, condition_number=1e3, seed=7)
         .astype(np.float32), 128, 8),
        ("uniform1024",
         (rng.random((1024, 1024), dtype=np.float32) - 0.5), 128, 8),
    ]
    with open(OUT, "w") as f:
        for name, kw in VARIANTS:
            fn = driver(M, 128, 8, kw)
            Q, R_full = fn(A)
            rep = metrics.evaluate(
                a, np.asarray(Q, np.float32), np.asarray(R_full, np.float32),
                precision_bits=POLICY_MIXED_FAST.precision_bits)
            ok = bool(rep.all_ok and rep.tight_ok
                      and np.isfinite(np.asarray(R_full[0, 0])))
            safe = {}
            if ok:
                for sname, As, r, g in safety:
                    fs = driver(As.shape[0], r, g, kw)
                    Qs, Rs = fs(jnp.asarray(As))
                    fin = bool(np.isfinite(np.asarray(Rs[0, 0])))
                    if fin:
                        reps = metrics.evaluate(
                            As, np.asarray(Qs, np.float32),
                            np.asarray(Rs, np.float32),
                            precision_bits=8)
                        safe[sname] = {"ok": bool(reps.all_ok
                                                  and reps.tight_ok),
                                       "orth": reps.orthogonality}
                    else:
                        safe[sname] = {"ok": False, "poisoned": True}
            us = tflops = None
            if ok:
                def step(x, fn=fn):
                    Qc, R = fn(x)
                    return x * (1.0 + 1e-12 * R[0, 0].astype(jnp.float32))

                secs = time_step_amortized(step, A, iters=96)
                us = round(secs * 1e6, 1)
                tflops = round(qr_flops(M, M) / secs / 1e12, 1)
            row = {"variant": name, "us": us, "tflops": tflops,
                   "backward": rep.backward, "orth": rep.orthogonality,
                   "ok": ok, "safety": safe}
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
