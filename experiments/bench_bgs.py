"""On-chip bench of the production _block_qr_bgs at 2048^2 mixed."""

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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_bgs.jsonl")


def record(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def main():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2048, 2048)).astype(np.float32)
    A0 = jnp.asarray(a)
    flops = qr_flops(2048, 2048)
    for name, g, reorth in [
        ("bgs2_g4", 4, True),
        ("bgs1_g4", 4, False),
        ("bgs2_g8", 8, True),
        ("bgs2_g2", 2, True),
    ]:
        t0 = time.time()
        try:
            fn = jax.jit(lambda x, g=g, ro=reorth: _block_qr_bgs(
                x, 128, POLICY_MIXED, True, None, group_panels=g,
                on_tpu=True, reorth=ro))
            R_full, Q, _ = jax.block_until_ready(fn(A0))
            rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R_full),
                                   precision_bits=8)

            def step(x, fn=fn):
                R_full, Q, _ = fn(x)
                return x * (1.0 + 1e-12 * (R_full[0, 0] + Q[0, 0].astype(jnp.float32)))

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
