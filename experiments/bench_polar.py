"""On-chip benchmark of the productionized polar grouped driver at 2048^2.

Sweeps group_panels and block size; records time + quality.
Appends to experiments/bench_polar.jsonl.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _jitted_driver
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED, POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_polar.jsonl")


def record(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def main():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2048, 2048)).astype(np.float32)
    A0 = jnp.asarray(a)
    flops = qr_flops(2048, 2048)

    cases = [
        ("mixed_g1_r128", POLICY_MIXED, 128, 1),
        ("mixed_g4_r128", POLICY_MIXED, 128, 4),
        ("mixed_g8_r128", POLICY_MIXED, 128, 8),
        ("mixed_g16_r128", POLICY_MIXED, 128, 16),
        ("mixed_g4_r256", POLICY_MIXED, 256, 4),
        ("mixedfast_g8_r128", POLICY_MIXED_FAST, 128, 8),
    ]
    for name, policy, r, g in cases:
        t0 = time.time()
        try:
            fn = _jitted_driver(r, policy, True, False, "polar", "unroll",
                                True, g)
            R_full, Q, _ = jax.block_until_ready(fn(A0))
            rep = metrics.evaluate(
                a, np.asarray(Q, np.float32), np.asarray(R_full, np.float32),
                precision_bits=8,
            )

            def step(x, fn=fn):
                R_full, Q, _ = fn(x)
                return x * (1.0 + 1e-12 * (R_full[0, 0] + Q[0, 0].astype(jnp.float32)))

            s = time_step_amortized(step, A0, iters=96)
            record(
                probe=name, us=round(s * 1e6, 1),
                tflops=round(flops / s / 1e12, 1),
                backward=float(rep.backward), orth=float(rep.orthogonality),
                ok=bool(rep.all_ok), compile_s=round(time.time() - t0, 1),
            )
        except Exception as e:
            record(probe=name, error=repr(e)[:300])


if __name__ == "__main__":
    main()
