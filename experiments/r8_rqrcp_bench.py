"""Round-8: the pivoted-QR cliff, attacked — exact QP3 vs the RQRCP tier
(sketch pivoting + robust-NS panels) on the real chip.  The exact tier's
measured cliff (round-5): 3.1/7.6/32.9 ms at 512/1024/2048 — one full
O(m n) trailing pass per column over min(m,n) sequential steps.  RQRCP
drops the per-step pivot work to O((r+8) w) on a Gaussian sketch.
JSON lines to stdout + experiments/r8_rqrcp_bench.jsonl.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mixedprecisionblockqr_tpu.ops.pivoted import (
    _pivoted_qr_impl,
    _rqrcp_impl,
    pivoted_qr,
)
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized


def main():
    out = open("/root/repo/experiments/r8_rqrcp_bench.jsonl", "a")
    for n in (512, 1024, 2048, 4096):
        a = np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)
        A = jnp.asarray(a)

        def step_exact(x):
            R, Q, _, perm = _pivoted_qr_impl(x, None, False, False)
            return x * (1.0 + 1e-12 * R[0, 0])

        def step_rqrcp(x):
            R, Q, _, perm, worst = _rqrcp_impl(
                x, None, False, False, 128, 8, 0, True)
            return x * (1.0 + 1e-12 * (R[0, 0] + worst))

        for name, step in (("exact", step_exact), ("rqrcp", step_rqrcp)):
            if name == "exact" and n > 2048:
                continue  # 130+ ms/step; the round-5 cliff already recorded
            try:
                iters = max(8, min(48, int(0.02 / (n / 2048) ** 3 * 96)))
                sec = time_step_amortized(step, A, iters=iters, repeats=3)
                rec = {"n": n, "method": name, "ms": sec * 1e3}
            except Exception as e:  # noqa: BLE001
                rec = {"n": n, "method": name, "error": str(e)[:200]}
            print(json.dumps(rec), flush=True)
            out.write(json.dumps(rec) + "\n")
            out.flush()
    # quality spot-check on chip (rank detection on a low-rank input)
    rng = np.random.default_rng(2)
    al = (rng.standard_normal((2048, 300)) @
          rng.standard_normal((300, 2048))).astype(np.float32)
    from mixedprecisionblockqr_tpu.ops.pivoted import numerical_rank
    R, perm = pivoted_qr(al, mode="r", method="rqrcp")
    rec = {"n": 2048, "check": "lowrank300",
           "rank": int(numerical_rank(np.asarray(R), m=2048))}
    print(json.dumps(rec), flush=True)
    out.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
