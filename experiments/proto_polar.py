"""Prototype: polar-panel blocked QR with deferred triangularization.

Per panel (width r, rows lam:):
  G = P^T P                          (one GEMM, HIGH/HIGHEST)
  N ~= G^{-1/2}                      (Newton-Schulz isqrt: chained GEMMs)
  Qs = P @ (N * D)  (sign-fixed)     (one GEMM)
  Rtilde = D * (G @ N)               (dense r x r "R" block; triangularized
                                      in ONE batched pass at the end)
  Yamamoto reflector from Qs as before (Newton S-inverse).

End: for each panel k, t_k = chol(G_k)^T (BATCHED), u_k = Rt_k t_k^{-1}
(batched trisolve), then R rows <- u_k^T R rows (bmm) and Q <- Q blkdiag(u)
(bmm).  Identity: Rt^T Rt = (D G^{1/2})^T (D G^{1/2}) = G, so chol(G) is the
triangular factor of Rt.

Measures the 2048^2 mixed complete-Q time + quality for r in {128, 256}.
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
from mixedprecisionblockqr_tpu.ops.cholqr import newton_inv
from mixedprecisionblockqr_tpu.ops.householder import panel_factor
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED
from mixedprecisionblockqr_tpu.ops.wy import (
    apply_block_reflector_left_t,
    apply_block_reflector_right,
)
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

_HI = jax.lax.Precision.HIGHEST
_H3 = jax.lax.Precision.HIGH
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "proto_polar.jsonl")


def record(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def ns_isqrt(G, iters_lo=6, iters_hi=2, lo_dtype=jnp.bfloat16):
    """N ~= G^{-1/2} for SPD G via coupled Newton-Schulz, chained GEMMs only.

    Normalization: 2 power-iteration matvecs estimate ||G||_2 (tight for the
    clustered Gram spectra of tall random panels); x1.15 guard keeps the
    normalized spectrum < 3 (the NS convergence domain).
    """
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
            a.astype(lo_dtype), b.astype(lo_dtype),
            preferred_element_type=jnp.float32,
        )

    for _ in range(iters_lo):
        T = 1.5 * I - 0.5 * lo_mm(Z, Y)
        Y = lo_mm(Y, T)
        Z = lo_mm(T, Z)
    for _ in range(iters_hi):
        T = 1.5 * I - 0.5 * jnp.matmul(Z, Y, precision=_HI)
        Y = jnp.matmul(Y, T, precision=_HI)
        Z = jnp.matmul(T, Z, precision=_HI)
    return Z * jax.lax.rsqrt(c)


def polar_block_qr(A, r, policy, iters_lo=6, iters_hi=2, gram_prec=_HI):
    m, n = A.shape
    A = A.astype(jnp.float32)
    q_dtype = policy.q_store or policy.accum
    Q = jnp.eye(m, dtype=q_dtype)
    mm_t = lambda a, b: jnp.matmul(
        a.astype(policy.trailing), b.astype(policy.trailing),
        preferred_element_type=jnp.float32,
    )
    Gs = []   # per polar panel: Gram matrix (for the deferred batched chol)
    fixup = []  # panel start offsets needing triangularization

    lam = 0
    while lam < n:
        w = min(r, n - lam)
        P = A[lam:, lam : lam + w]
        if (m - lam) >= 2 * w:
            # polar panel
            G = jnp.matmul(P.T, P, precision=gram_prec)
            N = ns_isqrt(G, iters_lo, iters_hi)
            Q1 = jnp.matmul(P[:w, :], N, precision=_HI)
            D = jnp.where(jnp.diag(Q1) > 0, -1.0, 1.0).astype(jnp.float32)
            Ns = N * D[None, :]
            Qs = jnp.matmul(P, Ns, precision=_HI)
            # Qs Rt = P needs Rt = Ns^{-1} = D^{-1} N^{-1} = D G^{1/2}
            # (rows sign-flipped); G^{1/2} = G N, symmetric.
            Rt = D[:, None] * jnp.matmul(G, N, precision=_HI)
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
            Gs.append(G)
            fixup.append(lam)

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
        Qc = Q[:, lam:]
        Q = Q.at[:, lam:].set(right(Qc.astype(jnp.float32)).astype(q_dtype))
        lam += w

    # Deferred triangularization: ONE batched chol + trisolve across panels.
    if fixup:
        k = len(fixup)
        Gb = jnp.stack(Gs)                       # (k, r, r)
        Lb = jnp.linalg.cholesky(Gb)             # batched
        tb = jnp.swapaxes(Lb, 1, 2)              # upper, (k, r, r)
        Rtb = jnp.stack([
            jax.lax.dynamic_slice(A, (lam_, lam_), (r, r)) for lam_ in fixup
        ])
        # u = Rt t^{-1}  <=>  u^T = t^{-T} Rt^T: solve t^T x = Rt^T (lower).
        ub = jnp.swapaxes(
            jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(tb, 1, 2), jnp.swapaxes(Rtb, 1, 2), lower=True
            ),
            1, 2,
        )
        # rows fixup: block-row lam_: A_rows <- u^T A_rows
        rows_blocks = jnp.stack([
            jax.lax.dynamic_slice(A, (lam_, 0), (r, n)) for lam_ in fixup
        ])
        new_rows = jnp.einsum("kji,kjl->kil", ub, rows_blocks, precision=_H3)
        for i, lam_ in enumerate(fixup):
            A = jax.lax.dynamic_update_slice(A, new_rows[i], (lam_, 0))
        # Q fixup: block-col lam_: Q_cols <- Q_cols u
        qcols = jnp.stack([
            jax.lax.dynamic_slice(
                Q.astype(jnp.float32), (0, lam_), (m, r)
            )
            for lam_ in fixup
        ])  # (k, m, r)
        newq = jnp.einsum(
            "kmj,kjl->kml",
            qcols.astype(policy.q_update),
            ub.astype(policy.q_update),
            preferred_element_type=jnp.float32,
        )
        for i, lam_ in enumerate(fixup):
            Q = jax.lax.dynamic_update_slice(
                Q, newq[i].astype(q_dtype), (0, lam_)
            )

    return jnp.triu(A), Q.astype(jnp.float32)


def main():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2048, 2048)).astype(np.float32)
    A0 = jnp.asarray(a)

    for r, ilo, ihi in [(128, 6, 2), (256, 7, 2), (128, 8, 0), (512, 8, 2)]:
        name = f"polar2048_r{r}_lo{ilo}_hi{ihi}"
        try:
            fn = jax.jit(
                lambda x, r=r, ilo=ilo, ihi=ihi: polar_block_qr(
                    x, r, POLICY_MIXED, ilo, ihi
                )
            )
            R, Q = jax.block_until_ready(fn(A0))
            rep = metrics.evaluate(a, Q, R, precision_bits=8)

            def step(x, fn=fn):
                R, Q = fn(x)
                return x * (1.0 + 1e-12 * (R[0, 0] + Q[0, 0]))

            t0 = time.time()
            s = time_step_amortized(step, A0, iters=96)
            flops = 4 * 2048**3 - 2048**3 + 2048**3 / 3
            record(
                probe=name, us=round(s * 1e6, 1),
                tflops=round(flops / s / 1e12, 1),
                backward=float(rep.backward),
                orth=float(rep.orthogonality),
                ok=bool(rep.all_ok),
                compile_s=round(time.time() - t0, 1),
            )
        except Exception as e:
            record(probe=name, error=repr(e)[:300])


if __name__ == "__main__":
    main()
