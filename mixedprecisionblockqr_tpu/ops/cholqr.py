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


def _chol_r(G: jax.Array, shift=None) -> jax.Array:
    """Upper-triangular R with R^T R = G (+ shift * I); shift may be traced."""
    r = G.shape[0]
    if shift is not None:
        G = G + shift * jnp.eye(r, dtype=G.dtype)
    L = jnp.linalg.cholesky(G)
    return L.T


def _apply_rinv(P: jax.Array, R: jax.Array) -> jax.Array:
    """Q = P R^-1 via explicit triangular inverse + GEMM (MXU-friendly:
    the (r x r) inverse is tiny; the (m x r)(r x r) product is the work)."""
    r = R.shape[0]
    Rinv = jax.scipy.linalg.solve_triangular(
        R, jnp.eye(r, dtype=R.dtype), lower=False
    )
    return jnp.matmul(P, Rinv, precision=_HI)


def cholesky_qr2(
    P: jax.Array, shifted: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Reduced QR of a tall panel P (m x r) by (shifted) CholeskyQR2.

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
    R1 = _chol_r(G, shift)
    Q1 = _apply_rinv(P, R1)
    # Second pass restores orthogonality (and absorbs the shift's bias).
    G2 = jnp.matmul(Q1.T, Q1, precision=_HI)
    R2 = _chol_r(G2)
    Q2 = _apply_rinv(Q1, R2)
    R = jnp.matmul(R2, R1, precision=_HI)
    if shifted:
        # One more cheap pass (CholeskyQR3) for the shifted variant.
        G3 = jnp.matmul(Q2.T, Q2, precision=_HI)
        R3 = _chol_r(G3)
        Q2 = _apply_rinv(Q2, R3)
        R = jnp.matmul(R3, R, precision=_HI)
    return Q2, R


def yamamoto_reflector(
    Q_red: jax.Array, R: jax.Array
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
    Sinv = jnp.linalg.inv(S)
    return Y, Sinv, R
