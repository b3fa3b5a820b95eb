"""Single-session head-to-head of all 2048^2 mixed complete-Q drivers."""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import (
    _block_qr_bgs,
    _block_qr_grouped,
    _block_qr_traced,
)
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "final_faceoff.jsonl")


def record(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def main():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2048, 2048)).astype(np.float32)
    A0 = jnp.asarray(a)
    flops = qr_flops(2048, 2048)

    drivers = {
        "bgs1_g4": lambda x: _block_qr_bgs(
            x, 128, POLICY_MIXED, True, None, 4, True, reorth=False),
        "bgs1_g1": lambda x: _block_qr_bgs(
            x, 128, POLICY_MIXED, True, None, 1, True, reorth=False),
        "bgs1_g8": lambda x: _block_qr_bgs(
            x, 128, POLICY_MIXED, True, None, 8, True, reorth=False),
        "bgs2grp_g4": lambda x: _block_qr_bgs(
            x, 128, POLICY_MIXED, True, None, 4, True, reorth=True),
        "polar_g4": lambda x: _block_qr_grouped(
            x, 128, POLICY_MIXED, True, None, group_panels=4, on_tpu=True),
        "cholqr1_ctl": lambda x: _block_qr_traced(
            x, 128, POLICY_MIXED, True, None, "cholqr1", True),
    }
    for name, fnb in drivers.items():
        t0 = time.time()
        try:
            fn = jax.jit(fnb)
            R_full, Q, _ = jax.block_until_ready(fn(A0))
            rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R_full),
                                   precision_bits=8)

            def step(x, fn=fn):
                R_full, Q, _ = fn(x)
                return x * (
                    1.0 + 1e-12 * (R_full[0, 0] + Q[0, 0].astype(jnp.float32))
                )

            s = time_step_amortized(step, A0, iters=96)
            record(probe=name, us=round(s * 1e6, 1),
                   tflops=round(flops / s / 1e12, 1),
                   backward=float(rep.backward), orth=float(rep.orthogonality),
                   ok=bool(rep.all_ok), tight=bool(rep.tight_ok),
                   compile_s=round(time.time() - t0, 1))
        except Exception as e:
            record(probe=name, error=repr(e)[:300])


if __name__ == "__main__":
    main()
