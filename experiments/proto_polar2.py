"""Ablation: find where proto_polar loses 700us vs the cholqr1 baseline.

Variants at 2048^2, r=128, POLICY_MIXED, complete Q:
  A: polar panels, NO deferred fixup (R left block-dense) -- panel+updates only
  B: polar panels + fixup (same as proto_polar)            -- fixup cost = B-A
  C: chol panels inside THIS prototype frame                -- frame parity check
  D: ns_isqrt chain microbench (16 chained)                 -- isqrt cost direct
  E: A but with fp32-HI isqrt (no bf16)                     -- cast-op cost probe
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
from mixedprecisionblockqr_tpu.ops.householder import panel_factor
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED
from mixedprecisionblockqr_tpu.ops.wy import (
    apply_block_reflector_left_t,
    apply_block_reflector_right,
)
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

_HI = jax.lax.Precision.HIGHEST
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "proto_polar2.jsonl")


def record(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def ns_isqrt(G, iters_lo=6, iters_hi=2, hi_only=False):
    r = G.shape[0]
    I = jnp.eye(r, dtype=jnp.float32)
    v0 = jnp.sum(G, axis=1, keepdims=True)
    v1 = jnp.matmul(G, v0, precision=_HI)
    v2 = jnp.matmul(G, v1, precision=_HI)
    c = 1.15 * jnp.linalg.norm(v2) / (jnp.linalg.norm(v1) + 1e-30)
    Gn = G / c
    Y = Gn
    Z = I

    def lo_mm(a, b):
        return jnp.matmul(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    def hi_mm(a, b):
        return jnp.matmul(a, b, precision=_HI)

    steps = (
        [hi_mm] * (iters_lo + iters_hi)
        if hi_only
        else [lo_mm] * iters_lo + [hi_mm] * iters_hi
    )
    for mm in steps:
        T = 1.5 * I - 0.5 * mm(Z, Y)
        Y = mm(Y, T)
        Z = mm(T, Z)
    return Z * jax.lax.rsqrt(c)


def driver(A, r, panel="polar", fixup_on=True, hi_only=False):
    m, n = A.shape
    policy = POLICY_MIXED
    A = A.astype(jnp.float32)
    Q = jnp.eye(m, dtype=jnp.float32)
    mm_t = lambda a, b: jnp.matmul(
        a.astype(policy.trailing), b.astype(policy.trailing),
        preferred_element_type=jnp.float32,
    )
    Gs, fixup = [], []
    lam = 0
    while lam < n:
        w = min(r, n - lam)
        P = A[lam:, lam : lam + w]
        if (m - lam) >= 2 * w:
            G = jnp.matmul(P.T, P, precision=_HI)
            if panel == "polar":
                N = ns_isqrt(G, hi_only=hi_only)
                Rfac = None
            else:  # chol
                L = jnp.linalg.cholesky(G)
                Rc = L.T
                N = jax.scipy.linalg.solve_triangular(
                    Rc, jnp.eye(w, dtype=jnp.float32), lower=False
                )
                Rfac = Rc
            Q1 = jnp.matmul(P[:w, :], N, precision=_HI)
            D = jnp.where(jnp.diag(Q1) > 0, -1.0, 1.0).astype(jnp.float32)
            Ns = N * D[None, :]
            Qs = jnp.matmul(P, Ns, precision=_HI)
            if panel == "polar":
                Rt = D[:, None] * jnp.matmul(G, N, precision=_HI)
                Gs.append(G)
                fixup.append(lam)
            else:
                Rt = D[:, None] * Rfac
            rows = jax.lax.broadcasted_iota(jnp.int32, (m - lam, w), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (m - lam, w), 1)
            Y = Qs - (rows == cols).astype(jnp.float32)
            S = jnp.eye(w, dtype=jnp.float32) - Qs[:w, :].T
            Sinv = newton_inv(S, iters=5)
            A = A.at[lam:, lam : lam + w].set(
                jnp.concatenate(
                    [Rt, jnp.zeros((m - lam - w, w), jnp.float32)], axis=0
                )
            )

            def left(X, Y=Y, Sinv=Sinv):
                Gl = mm_t(Y.T, X)
                return X - mm_t(Y, jnp.matmul(Sinv.T, Gl, precision=_HI))

            def right(X, Y=Y, Sinv=Sinv):
                XY = mm_t(X, Y)
                return X - mm_t(jnp.matmul(XY, Sinv, precision=_HI), Y.T)
        else:
            V, T, Rp = panel_factor(P)
            A = A.at[lam:, lam : lam + w].set(Rp)

            def left(X, V=V, T=T):
                return apply_block_reflector_left_t(X, V, T, policy)

            def right(X, V=V, T=T):
                return apply_block_reflector_right(X, V, T, policy)

        if lam + w < n:
            C = A[lam:, lam + w :]
            A = A.at[lam:, lam + w :].set(left(C).astype(A.dtype))
        Q = Q.at[:, lam:].set(right(Q[:, lam:]))
        lam += w

    if fixup and fixup_on:
        k = len(fixup)
        Gb = jnp.stack(Gs)
        tb = jnp.swapaxes(jnp.linalg.cholesky(Gb), 1, 2)
        Rtb = jnp.stack(
            [jax.lax.dynamic_slice(A, (l_, l_), (r, r)) for l_ in fixup]
        )
        ub = jnp.swapaxes(
            jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(tb, 1, 2), jnp.swapaxes(Rtb, 1, 2), lower=True
            ),
            1, 2,
        )
        rows_blocks = jnp.stack(
            [jax.lax.dynamic_slice(A, (l_, 0), (r, n)) for l_ in fixup]
        )
        new_rows = jnp.einsum("kji,kjl->kil", ub, rows_blocks, precision=_HI)
        for i, l_ in enumerate(fixup):
            A = jax.lax.dynamic_update_slice(A, new_rows[i], (l_, 0))
        qcols = jnp.stack(
            [jax.lax.dynamic_slice(Q, (0, l_), (m, r)) for l_ in fixup]
        )
        newq = jnp.einsum(
            "kmj,kjl->kml",
            qcols.astype(jnp.bfloat16), ub.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        for i, l_ in enumerate(fixup):
            Q = jax.lax.dynamic_update_slice(Q, newq[i], (0, l_))
    return jnp.triu(A), Q


def bench(name, fn, A0, iters=96):
    t0 = time.time()
    try:
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(A0))

        def step(x):
            R, Q = jfn(x)
            return x * (1.0 + 1e-12 * (R[0, 0] + Q[0, 0]))

        s = time_step_amortized(step, A0, iters=iters)
        record(probe=name, us=round(s * 1e6, 1),
               compile_s=round(time.time() - t0, 1))
    except Exception as e:
        record(probe=name, error=repr(e)[:300])


def main():
    rng = np.random.default_rng(0)
    A0 = jnp.asarray(rng.standard_normal((2048, 2048)).astype(np.float32))

    bench("A_polar_nofix", lambda x: driver(x, 128, "polar", fixup_on=False), A0)
    bench("B_polar_fix", lambda x: driver(x, 128, "polar", fixup_on=True), A0)
    bench("C_chol_frame", lambda x: driver(x, 128, "chol"), A0)
    bench("E_polar_hionly_nofix",
          lambda x: driver(x, 128, "polar", fixup_on=False, hi_only=True), A0)

    # D: 16 chained isqrts, nothing else.
    q, _ = np.linalg.qr(rng.standard_normal((128, 128)))
    G0 = jnp.asarray((np.eye(128) * 2 + 0.3 * (q + q.T)).astype(np.float32))
    X0 = jnp.asarray(q.astype(np.float32))

    def chain16(x):
        out = x
        for _ in range(16):
            out = ns_isqrt(G0 + 1e-20 * out)
        return out

    t0 = time.time()
    s = time_step_amortized(chain16, X0, iters=512)
    record(probe="D_isqrt_chain16", us=round(s * 1e6, 2),
           per_panel_us=round(s * 1e6 / 16, 2),
           compile_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
