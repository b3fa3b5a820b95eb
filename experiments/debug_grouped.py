"""Instrumented replica of _block_qr_grouped (g=1, fp32, no tail): track
orthogonality of accumulated Q and backward error after each panel, for
both the W-form and the 3-GEMM cholqr1-style update, same panels."""

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mixedprecisionblockqr_tpu.ops.cholqr import newton_inv
from mixedprecisionblockqr_tpu.ops.polar import tri_cholqr

HI = jax.lax.Precision.HIGHEST

rng = np.random.default_rng(0)
m, n, r = 1024, 896, 128
a = rng.standard_normal((m, n)).astype(np.float32)
an = a.astype(np.float64)


def run(form):
    A = jnp.asarray(a)
    Q = jnp.eye(m, dtype=jnp.float32)
    for k in range(n // r):
        lam = k * r
        P = A[lam:, lam : lam + r]
        Qs, t, _ = tri_cholqr(P, iters=12)
        rows = jax.lax.broadcasted_iota(jnp.int32, (m - lam, r), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (m - lam, r), 1)
        Y = Qs - (rows == cols).astype(jnp.float32)
        S = jnp.eye(r) - Qs[:r, :].T
        Sinv = newton_inv(S, iters=5)
        Sn = np.asarray(S, np.float64)
        smin = np.linalg.svd(Sn, compute_uv=False).min()
        nres = np.abs(np.eye(r) - Sn @ np.asarray(Sinv, np.float64)).max()
        po = np.abs(
            np.asarray(Qs, np.float64).T @ np.asarray(Qs, np.float64)
            - np.eye(r)
        ).max()
        condP = np.linalg.cond(np.asarray(P, np.float64))
        print(f"    smin(S)={smin:.3f} newton_resid={nres:.2e} "
              f"panel_orth={po:.2e} cond(P)={condP:.1e}")
        A = A.at[lam:, lam : lam + r].set(
            jnp.concatenate([t, jnp.zeros((m - lam - r, r))], 0)
        )
        if lam + r < n:
            C = A[lam:, lam + r :]
            if form == "W":
                W = jnp.matmul(Y, Sinv, precision=HI)
                C = C - jnp.matmul(Y, jnp.matmul(W.T, C, precision=HI),
                                   precision=HI)
            else:
                G = jnp.matmul(Y.T, C, precision=HI)
                C = C - jnp.matmul(Y, jnp.matmul(Sinv.T, G, precision=HI),
                                   precision=HI)
            A = A.at[lam:, lam + r :].set(C)
        Qc = Q[:, lam:]
        if form == "W":
            W = jnp.matmul(Y, Sinv, precision=HI)
            Qc = Qc - jnp.matmul(jnp.matmul(Qc, W, precision=HI), Y.T,
                                 precision=HI)
        else:
            XY = jnp.matmul(Qc, Y, precision=HI)
            Qc = Qc - jnp.matmul(jnp.matmul(XY, Sinv, precision=HI), Y.T,
                                 precision=HI)
        Q = Q.at[:, lam:].set(Qc)
        Qn = np.asarray(Q, np.float64)
        orth = np.abs(Qn.T @ Qn - np.eye(m)).max()
        print(f"  panel {k} (lam={lam}): Q orth so far {orth:.2e}")
    R = np.triu(np.asarray(A, np.float64))
    back = np.linalg.norm(an - Qn @ R) / np.linalg.norm(an)
    print(f"  final: back={back:.2e} orth={orth:.2e}")


for form in ("W", "3gemm"):
    print(f"form={form}")
    run(form)
