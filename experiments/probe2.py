"""Round-2 probe: where do the 784us of the 2048^2 mixed QR go?

Uses big iteration counts so the amortized signal (>=50ms) clears the
tunnel jitter (~1-3ms).  Appends to experiments/probe2.jsonl.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixedprecisionblockqr_tpu.ops import cholqr
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_traced
from mixedprecisionblockqr_tpu.ops.policy import (
    POLICY_MIXED,
    POLICY_MIXED_FAST,
)
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

_HI = jax.lax.Precision.HIGHEST
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe2.jsonl")


def record(name, seconds, extra=None):
    row = {"probe": name, "us": round(seconds * 1e6, 3)}
    if extra:
        row.update(extra)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def probe(name, step, x0, iters, extra=None):
    t0 = time.time()
    try:
        s = time_step_amortized(step, x0, iters=iters)
        record(name, s, dict(extra or {}, compile_s=round(time.time() - t0, 1)))
    except Exception as e:
        record(name, -1, {"error": repr(e)[:300]})


def main():
    rng = np.random.default_rng(0)
    r = 128
    q, _ = np.linalg.qr(rng.standard_normal((r, r)))
    X = jnp.asarray(q, jnp.float32)
    G0 = jnp.asarray(np.eye(r, dtype=np.float32) * 2.0 + 0.1 * (q + q.T).astype(np.float32))
    S0 = jnp.asarray((np.eye(r) + 0.15 * (q @ q.T)).astype(np.float32))

    # --- micro ops, iters high enough for >=30ms signal ---
    probe("gemm128_f32_hi", lambda x: jnp.matmul(x, x, precision=_HI), X, 8192)
    probe(
        "gemm128_bf16",
        lambda x: jnp.matmul(
            x.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ),
        X, 8192,
    )
    probe("chol128", lambda x: jnp.linalg.cholesky(G0 + 1e-20 * x), X, 4096)
    probe(
        "trisolve128",
        lambda x: jax.scipy.linalg.solve_triangular(
            jnp.triu(G0) + 1e-20 * x, jnp.eye(r, dtype=jnp.float32), lower=False
        ),
        X, 4096,
    )
    probe("newton6_128", lambda x: cholqr.newton_inv(S0 + 1e-20 * x, iters=6), X, 2048)
    probe("newton4_128", lambda x: cholqr.newton_inv(S0 + 1e-20 * x, iters=4), X, 2048)

    # The whole small chain as it appears per panel: chol+trisolve+newton6.
    def small_chain(x):
        G = G0 + 1e-20 * x
        L = jnp.linalg.cholesky(G)
        Rinv = jax.scipy.linalg.solve_triangular(
            L.T, jnp.eye(r, dtype=jnp.float32), lower=False
        )
        Sinv = cholqr.newton_inv(S0 + 1e-20 * Rinv, iters=6)
        return Sinv

    probe("chain_chol_tri_newton6", small_chain, X, 2048)

    # --- full 2048^2 QR variants ---
    A0 = jnp.asarray(rng.standard_normal((2048, 2048)).astype(np.float32))

    def qr_step(pm, block, policy, want_q=True):
        def step(x):
            R_full, Qc, _ = _block_qr_traced(x, block, policy, want_q, None, pm)
            out = R_full[0, 0]
            if Qc is not None:
                out = out + Qc[0, 0].astype(jnp.float32)
            return x * (1.0 + 1e-12 * out)

        return step

    probe("qr2048_base_b128", qr_step("cholqr1", 128, POLICY_MIXED), A0, 96)
    probe("qr2048_Ronly_b128", qr_step("cholqr1", 128, POLICY_MIXED, want_q=False), A0, 96)
    probe("qr2048_mixedfast_b128", qr_step("cholqr1", 128, POLICY_MIXED_FAST), A0, 96)
    probe("qr2048_base_b256", qr_step("cholqr1", 256, POLICY_MIXED), A0, 96)

    # Newton iteration count: monkeypatch (trace-time resolution).
    orig = cholqr.newton_inv

    def newton4(S, iters=6):
        return orig(S, iters=4)

    cholqr.newton_inv = newton4
    try:
        probe("qr2048_newton4_b128", qr_step("cholqr1", 128, POLICY_MIXED), A0, 96)
    finally:
        cholqr.newton_inv = orig

    # Plain big GEMM sanity at the same scale (ceiling check).
    B0 = jnp.asarray(rng.standard_normal((2048, 2048)).astype(np.float32))

    def big_gemm(x):
        xb = x.astype(jnp.bfloat16)
        y = jnp.matmul(xb, xb, preferred_element_type=jnp.float32)
        return y / jnp.linalg.norm(y) * 2048.0

    probe("gemm2048_bf16_normed", big_gemm, B0, 256)


if __name__ == "__main__":
    main()
