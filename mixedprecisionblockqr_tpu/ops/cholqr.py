"""CholeskyQR panel factorization — the all-MXU fast path.

The reference leaves its panel factorization sequential on the host
(``h_householder_qr``, ``Cuda/qr.cu:198``), so its GPU pipeline stalls every
panel.  On TPU the panel can instead be factored with CholeskyQR2
[Yamamoto, Nakatsukasa, Yanagisawa, Fukaya 2015]:

    G = P^T P            (one m x r x r GEMM — MXU)
    R = chol(G)^T        (r x r, the only non-GEMM step)
    Q = P R^-1           (triangular solve as GEMM with R^-1)
    ... repeated once more (the "2" in CholeskyQR2) to restore
    orthogonality to machine precision: Q2 = Q S^-1, R_out = S R.

Everything heavy is a large matmul, so the panel rides the systolic array
instead of a 2048-step scalar-ish reflector loop.  Numerical domain: plain
CholeskyQR2 in fp32 needs cond(P) <~ sqrt(1/eps_f32) ~ 4e3 (G squares the
condition number); ``shifted=True`` applies the Fukaya et al. 2020 shift on
the first iteration, extending the domain to cond(P) ~ 1/eps at the cost of
one more pass.  The blocked driver exposes ``panel_method='cholqr2'`` as the
bench/fast path and keeps the Householder panel (exact GVL semantics) as the
robust default; both produce panels consumed identically downstream.

The trailing/Q updates reconstruct a single block reflector from the reduced
panel Q via the basis-kernel identity (see ``parallel/dist_qr.py``):
``H = I - Y S^-1 Y^T`` with ``Y = Q_red - E1``, ``S = I - Q1^T``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _use_pallas_chol(r: int) -> bool:
    # The fused Pallas chol+inverse kernel (ops/pallas/chol.py) matches
    # XLA's cholesky+solve_triangular latency in isolation but measured
    # slower *in context* (an opaque pallas_call blocks XLA's scheduling /
    # fusion around it), so it is opt-in pending further tuning.
    import os

    if os.environ.get("MPBQR_PALLAS_CHOL", "0") != "1":
        return False
    import jax.extend.backend as jxb

    try:
        platform = jxb.get_backend().platform
    except Exception:
        platform = "cpu"
    return r % 32 == 0 and platform not in ("cpu",)


def _chol_and_inv(G: jax.Array, shift=None):
    """(R, R^-1) with R^T R = G (+ shift * I); shift may be traced.

    On TPU with r % 32 == 0 uses the fused Pallas kernel
    (``ops/pallas/chol.py``) — XLA's cholesky + solve_triangular cost
    ~180us of loop overhead per call at r=256, which multiplied across
    panels dominated the whole factorization.
    """
    r = G.shape[0]
    if shift is not None:
        G = G + shift * jnp.eye(r, dtype=G.dtype)
    if _use_pallas_chol(r):
        from mixedprecisionblockqr_tpu.ops.pallas.chol import chol_rinv

        return chol_rinv(G)
    L = jnp.linalg.cholesky(G)
    R = L.T
    Rinv = jax.scipy.linalg.solve_triangular(
        R, jnp.eye(r, dtype=R.dtype), lower=False
    )
    return R, Rinv


def cholesky_qr2(
    P: jax.Array, shifted: bool = False, passes: int = 2
) -> Tuple[jax.Array, jax.Array]:
    """Reduced QR of a tall panel P (m x r) by (shifted) CholeskyQR.

    ``passes=2`` (CholeskyQR2) reaches fp32-machine orthogonality;
    ``passes=1`` gives orthogonality ~ cond(P)^2 * eps_f32 — below bf16
    noise for well-conditioned panels, so the mixed-precision blocked
    driver can use it to halve the small-op count per panel.

    Returns (Q (m x r) with orthonormal columns, R (r x r) upper).
    """
    m, r = P.shape
    G = jnp.matmul(P.T, P, precision=_HI)
    shift = None
    if shifted:
        # Fukaya et al. 2020: s ~ 11 (m r + r (r+1)) eps ||G||_2; use the
        # trace as a cheap upper bound for ||G||_2.
        eps = jnp.finfo(P.dtype).eps
        shift = 11.0 * (m * r + r * (r + 1)) * eps * jnp.trace(G)
    R1, R1inv = _chol_and_inv(G, shift)
    Q = jnp.matmul(P, R1inv, precision=_HI)
    R = R1
    # Extra orthogonalization passes (the "2" of CholeskyQR2; +1 absorbs
    # the shifted variant's bias — CholeskyQR3).
    for _ in range((1 if shifted else 0) + max(passes - 1, 0)):
        G2 = jnp.matmul(Q.T, Q, precision=_HI)
        R2, R2inv = _chol_and_inv(G2)
        Q = jnp.matmul(Q, R2inv, precision=_HI)
        R = jnp.matmul(R2, R, precision=_HI)
    return Q, R


def newton_inv(S: jax.Array, iters: int = 6) -> jax.Array:
    """Inverse of a well-conditioned matrix by Newton-Schulz — pure GEMMs
    (MXU) instead of XLA's LU path.

    The Yamamoto S = I - Q1^T with diag(Q1) <= 0 has singular values in
    [1, 2], so X0 = 0.5 I gives ||I - X0 S|| <= 1/2 and quadratic
    convergence; 6 iterations reach fp32 roundoff.
    """
    r = S.shape[0]
    I = jnp.eye(r, dtype=S.dtype)
    X = 0.5 * I
    for _ in range(iters):
        X = jnp.matmul(
            X, 2.0 * I - jnp.matmul(S, X, precision=_HI), precision=_HI
        )
    return X


def yamamoto_reflector(
    Q_red: jax.Array, R: jax.Array, inv_method: str = "lu"
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Build the block reflector (Y, Sinv) with ``H = I - Y Sinv Y^T``
    orthogonal and ``H[:, :r] = Q_red`` (basis-kernel / Yamamoto identity),
    plus the sign-fixed R.

    Columns are sign-flipped so diag(Q1) <= 0, keeping S = I - Q1^T
    well-conditioned (cond(S) ~ 2); R rows flip accordingly so Q R is
    invariant.  Then ``H^T A_panel = [R; 0]`` and trailing updates are
    ``C - Y (Sinv^T (Y^T C))`` — three GEMMs.
    """
    m, r = Q_red.shape
    Q1 = Q_red[:r, :]
    D = jnp.where(jnp.diag(Q1) > 0, -1.0, 1.0).astype(Q_red.dtype)
    Qs = Q_red * D[None, :]
    R = R * D[:, None]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, r), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, r), 1)
    Y = Qs - (rows == cols).astype(Qs.dtype)
    S = jnp.eye(r, dtype=Qs.dtype) - Qs[:r, :].T
    Sinv = newton_inv(S) if inv_method == "newton" else jnp.linalg.inv(S)
    return Y, Sinv, R
