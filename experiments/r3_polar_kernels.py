"""'polar' grouped driver with fused kernels (round-3): 2048 + 4096 mixed."""
import json, os, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_grouped
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3_polar_kernels.jsonl")

def record(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)

def main():
    for n, g, iters in [(2048, 4, 24), (2048, 8, 24), (4096, 4, 24)]:
        t0 = time.time()
        try:
            a = np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)
            A0 = jnp.asarray(a)
            fn = jax.jit(lambda x, g=g: _block_qr_grouped(
                x, 128, POLICY_MIXED, True, None, group_panels=g, on_tpu=True))
            R, Q, _ = jax.block_until_ready(fn(A0))
            rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R), precision_bits=8)
            def step(x, fn=fn):
                R, Q, _ = fn(x)
                return x * (1.0 + 1e-12 * (R[0, 0] + Q[0, 0].astype(jnp.float32)))
            s = time_step_amortized(step, A0, iters=48 if n <= 2048 else 12)
            record(probe=f"polar_{n}_g{g}", us=round(s * 1e6, 1),
                   tflops=round(qr_flops(n, n) / s / 1e12, 1),
                   backward=float(rep.backward), orth=float(rep.orthogonality),
                   ok=bool(rep.all_ok), tight=bool(rep.tight_ok),
                   compile_s=round(time.time() - t0, 1))
        except Exception as e:
            record(probe=f"polar_{n}_g{g}", error=repr(e)[:300])

if __name__ == "__main__":
    main()
