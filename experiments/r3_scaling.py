"""Round-3 size scaling with the group/pallas NS-kernel bgs1 driver."""
import json, os, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED, POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3_scaling.jsonl")

def record(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)

def main():
    import os
    todo = os.environ.get("SIZES", "4096,8192")
    table = {"4096": (4096, POLICY_MIXED, "mixed"),
             "8192": (8192, POLICY_MIXED_FAST, "mixed_fast")}
    for n, pol, pname in [table[t] for t in todo.split(",")]:
        t0 = time.time()
        try:
            A0 = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
            g = int(os.environ.get("GROUP", "4"))
            fn = jax.jit(lambda x, pol=pol, g=g: _block_qr_bgs(
                x, 128, pol, True, None, g, True, reorth=False))
            R_full, Q, _ = jax.block_until_ready(fn(A0))
            backward = float(metrics.backward_error(A0, Q, R_full))
            orth = float(metrics.orthogonality_error(Q))
            def step(x, fn=fn):
                R_full, Q, _ = fn(x)
                return x * (1.0 + 1e-12 * (R_full[0, 0] + Q[0, 0].astype(jnp.float32)))
            s = time_step_amortized(step, A0, iters=16 if n <= 4096 else 4)
            record(probe=f"bgs1_{n}_{pname}_g{g}", us=round(s * 1e6, 1),
                   tflops=round(qr_flops(n, n) / s / 1e12, 1),
                   backward=backward, orth=orth,
                   compile_s=round(time.time() - t0, 1))
        except Exception as e:
            record(probe=f"bgs1_{n}_{pname}_gX", error=repr(e)[:300])

if __name__ == "__main__":
    main()
