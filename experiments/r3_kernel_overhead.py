"""Split ns_chain kernel cost into fixed overhead vs per-iteration cost:
time iters=1 vs 6 vs 12 standalone (amortized chains)."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixedprecisionblockqr_tpu.ops.pallas.ns import ns_chain
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3_kernel_overhead.jsonl")


def record(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def main():
    rng = np.random.default_rng(1)
    P = rng.standard_normal((2048, 128)).astype(np.float32)
    G0 = jnp.asarray(P.T @ P)

    for iters in (1, 6, 12):
        def step(G, iters=iters):
            X, t, resid = ns_chain(G, iters=iters)
            return G * (1.0 + 1e-12 * (X[0, 0] + t[0, 0] + resid))

        s = time_step_amortized(jax.jit(step), G0, iters=512)
        record(probe=f"ns_chain_i{iters}", us=round(s * 1e6, 2))

    # and a 2-kernel chain (robust-tail shape): dispatch scaling
    def step2(G):
        X, t, r1 = ns_chain(G, iters=6)
        X2, t2, r2 = ns_chain(t, iters=6, refine=True)
        return G * (1.0 + 1e-12 * (X[0, 0] + X2[0, 0] + r1 + r2))

    s = time_step_amortized(jax.jit(step2), G0, iters=512)
    record(probe="ns_chain_i6_x2", us=round(s * 1e6, 2))


if __name__ == "__main__":
    main()
