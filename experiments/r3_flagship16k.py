"""Round-3 VERDICT item 5 (part 1): FULL metric triple for the 16384^2
complete-Q single-chip factorization (round 1 recorded only a sampled
orthogonality).  A is generated ON DEVICE (host staging of 1 GB through the
tunnel dominated the round-1 run) and all three metrics are evaluated
on-device; only scalars cross the link.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _jitted_driver
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3_flagship16k.jsonl")

N = int(os.environ.get("N", "16384"))
# 'cholqr1' = round-1/2 Yamamoto scan path; 'bgs'/'bgs1' = round-3
# scan-mode Block Gram-Schmidt (_block_qr_bgs_scan).
DRIVER = os.environ.get("DRIVER", "bgs")


def main():
    t0 = time.time()
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (N, N), dtype=jnp.float32)
    A = jax.block_until_ready(A)
    print("A generated on device", time.time() - t0, flush=True)

    fn = _jitted_driver(128, POLICY_MIXED_FAST, True, False, DRIVER,
                        "scan", True)
    t1 = time.time()
    R_full, Q, _ = jax.block_until_ready(fn(A))
    wall = time.time() - t1
    print("factor (incl compile)", wall, flush=True)
    # Amortized runtime (tunnel-safe): only when requested — two more big
    # compiles.
    run_s = None
    if os.environ.get("TIME", "1") == "1":
        from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

        def step(x):
            R_full, Q, _ = fn(x)
            return x * (1.0 + 1e-12 * (R_full[0, 0] + Q[0, 0].astype(jnp.float32)))

        run_s = time_step_amortized(step, A, iters=4)
        print("amortized step", run_s, flush=True)

    backward = float(metrics.backward_error(A, Q, R_full))
    orth = float(metrics.orthogonality_error(Q))
    ltz = float(metrics.lower_trapezoid_error(R_full))
    limit = metrics.error_limit(8, N)
    tight = metrics.tight_limit(8, N)
    row = {
        "config": f"{N}^2 complete-Q single chip, scan + MIXED_FAST "
                  f"(bf16-resident Q), driver={DRIVER}",
        "factor_wall_s_incl_compile": round(wall, 1),
        "amortized_step_s": None if run_s is None else round(run_s, 4),
        "backward": backward,
        "orthogonality": orth,
        "lower_trapezoid": ltz,
        "limit_2^-8*m": limit,
        "tight_2^-8*sqrt(m)": tight,
        "all_ok": bool(backward <= limit and orth <= limit and ltz <= limit),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
