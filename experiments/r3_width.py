"""Round-3 sweep: block width r x group size for the bgs1 driver at 2048^2.

The per-panel NS chain is ~25 small matmuls at the ~0.7us in-context op
floor; halving the panel count (r=256) should cut the chain roughly in
half if the NS iteration count holds (aspect 8 -> 6 iters, same as 16).
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
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3_width.jsonl")


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
        ("r128_g4", 128, 4, False),
        ("r256_g2", 256, 2, False),
        ("r256_g4", 256, 4, False),
        ("r256_g1", 256, 1, False),
        ("r512_g1", 512, 1, False),
        ("r256_g2_reorth", 256, 2, True),
    ]
    for name, r, g, reorth in cases:
        t0 = time.time()
        try:
            fn = jax.jit(lambda x, r=r, g=g, reorth=reorth: _block_qr_bgs(
                x, r, POLICY_MIXED, True, None, g, True, reorth=reorth))
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
