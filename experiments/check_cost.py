"""A/B: cost of the per-panel lax.cond safety fallback in tri_cholqr."""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mixedprecisionblockqr_tpu.ops.polar as pol
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_cost.jsonl")


def record(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def main():
    rng = np.random.default_rng(0)
    A0 = jnp.asarray(rng.standard_normal((2048, 2048)).astype(np.float32))
    flops = qr_flops(2048, 2048)

    orig = pol.tri_cholqr

    def nocheck(P, iters=10, refine_iters=0, sign_fix=True,
                gram_precision=pol._HI, check=True):
        return orig(P, iters, refine_iters, sign_fix, gram_precision,
                    check=False)

    for name, patch in [("bgs1_check", None), ("bgs1_nocheck", nocheck)]:
        if patch is not None:
            pol.tri_cholqr = patch
        try:
            fn = jax.jit(lambda x: _block_qr_bgs(
                x, 128, POLICY_MIXED, True, None, 4, True, reorth=False))
            t0 = time.time()
            jax.block_until_ready(fn(A0))

            def step(x, fn=fn):
                R_full, Q, _ = fn(x)
                return x * (1.0 + 1e-12 * (R_full[0, 0] + Q[0, 0].astype(jnp.float32)))

            s = time_step_amortized(step, A0, iters=96)
            record(probe=name, us=round(s * 1e6, 1),
                   tflops=round(flops / s / 1e12, 1),
                   compile_s=round(time.time() - t0, 1))
        finally:
            pol.tri_cholqr = orig


if __name__ == "__main__":
    main()
