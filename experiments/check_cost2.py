"""A/B: deferred-global-cond cost. Patch jax.lax.cond to always take the
fast branch (no conditional HLO) and compare."""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized


def record(**row):
    print(json.dumps(row), flush=True)


def bench(name, fn):
    t0 = time.time()
    rng = np.random.default_rng(0)
    A0 = jnp.asarray(rng.standard_normal((2048, 2048)).astype(np.float32))
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(A0))

    def step(x):
        R_full, Q, _ = jfn(x)
        return x * (1.0 + 1e-12 * (R_full[0, 0] + Q[0, 0].astype(jnp.float32)))

    s = time_step_amortized(step, A0, iters=96)
    record(probe=name, us=round(s * 1e6, 1),
           tflops=round(qr_flops(2048, 2048) / s / 1e12, 1),
           compile_s=round(time.time() - t0, 1))


def main():
    bench("bgs1_safe", lambda x: _block_qr_bgs(
        x, 128, POLICY_MIXED, True, None, 4, True, reorth=False))

    # strip the global cond: force the fast branch
    import mixedprecisionblockqr_tpu.ops.blockqr as bq
    orig_cond = jax.lax.cond

    def fake_cond(pred, tfn, ffn, operand):
        return tfn(operand)

    bq.jax.lax.cond = fake_cond
    try:
        bench("bgs1_nocond", lambda x: _block_qr_bgs(
            x, 128, POLICY_MIXED, True, None, 4, True, reorth=False))
    finally:
        bq.jax.lax.cond = orig_cond


if __name__ == "__main__":
    main()
