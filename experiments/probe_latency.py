"""On-chip latency probe for the per-panel small-op chain (round-2 perf work).

Measures, with the amortized in-jit harness, the device time of each
component of the cholqr1+Newton panel pipeline at r=128/256, plus the full
2048^2 QR under several variants.  Results append to experiments/probe.jsonl
one JSON line per probe so partial runs are still useful.

Chaining trick: every step feeds its output back as the next input via a
1e-20-scaled perturbation of a fixed operand, so the loop carries a true
data dependency while values stay bounded.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixedprecisionblockqr_tpu.ops.cholqr import newton_inv
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

_HI = jax.lax.Precision.HIGHEST
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe.jsonl")


def record(name, seconds, extra=None):
    row = {"probe": name, "us": round(seconds * 1e6, 3)}
    if extra:
        row.update(extra)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def probe(name, step, x0, iters=64, extra=None):
    t0 = time.time()
    try:
        s = time_step_amortized(step, x0, iters=iters)
        record(name, s, dict(extra or {}, compile_s=round(time.time() - t0, 1)))
    except Exception as e:  # keep going on individual failures
        record(name, -1, {"error": repr(e)[:200]})


def main():
    rng = np.random.default_rng(0)

    for r in (128, 256):
        # Orthogonal seed keeps x @ x bounded across iterations.
        q, _ = np.linalg.qr(rng.standard_normal((r, r)))
        X = jnp.asarray(q, jnp.float32)
        G0 = jnp.asarray(
            np.eye(r, dtype=np.float32) * 2.0
            + 0.1 * (q + q.T).astype(np.float32)
        )
        S0 = jnp.asarray(np.eye(r, dtype=np.float32) + 0.3 * q.astype(np.float32) @ q.T.astype(np.float32) * 0.5)

        probe(f"gemm{r}_f32_hi", lambda x: jnp.matmul(x, x, precision=_HI), X)
        probe(
            f"gemm{r}_bf16",
            lambda x: jnp.matmul(
                x.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32),
            X,
        )
        probe(
            f"chol{r}_xla",
            lambda x: jnp.linalg.cholesky(G0 + 1e-20 * x),
            X,
        )
        probe(
            f"trisolve{r}_xla",
            lambda x: jax.scipy.linalg.solve_triangular(
                jnp.triu(G0) + 1e-20 * x, jnp.eye(r, dtype=jnp.float32),
                lower=False,
            ),
            X,
        )
        probe(
            f"newton6_{r}",
            lambda x: newton_inv(S0 + 1e-20 * x, iters=6),
            X,
        )
        probe(
            f"newton3_{r}",
            lambda x: newton_inv(S0 + 1e-20 * x, iters=3),
            X,
        )

        def _pallas_chol(x):
            from mixedprecisionblockqr_tpu.ops.pallas.chol import chol_rinv

            R, Rinv = chol_rinv(G0 + 1e-20 * x)
            return R + 1e-20 * Rinv

        probe(f"pallas_chol_rinv{r}", _pallas_chol, X)

    # Mid-size GEMM latencies at 2048 panel scale.
    m = 2048
    q, _ = np.linalg.qr(rng.standard_normal((m, 128)))
    Y = jnp.asarray(q, jnp.float32)

    def trailing_gemm(y):
        yb = y.astype(jnp.bfloat16)
        g = jnp.matmul(
            yb.T, jnp.broadcast_to(yb, (m, 128)),
            preferred_element_type=jnp.float32,
        )  # 128 x m^T x 128 shape stand-in
        return y + 1e-20 * jnp.sum(g)

    probe("gemm_2048x128x128_bf16", trailing_gemm, Y)

    # Full 2048^2 mixed QR variants.
    from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_traced
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED

    A0 = jnp.asarray(
        rng.standard_normal((2048, 2048)).astype(np.float32)
    )

    def qr_step(pm, block):
        def step(x):
            R_full, Qc, _ = _block_qr_traced(x, block, POLICY_MIXED, True, None, pm)
            return x * (1.0 + 1e-12 * R_full[0, 0])

        return step

    probe("qr2048_cholqr1_b128", qr_step("cholqr1", 128), A0, iters=24)

    os.environ["MPBQR_PALLAS_CHOL"] = "1"
    probe("qr2048_cholqr1_b128_pallaschol", qr_step("cholqr1", 128), A0,
          iters=24)
    os.environ["MPBQR_PALLAS_CHOL"] = "0"


if __name__ == "__main__":
    main()
