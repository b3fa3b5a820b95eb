"""Givens-rotation QR — the reference paper's alternative to Householder.

The reference derives Givens rotations alongside Householder reflections as
the two unitary eliminations for QR (``LaTeX/QR_Decomposition.tex``, Givens
section: c = x_i/r, s = -x_j/r pairs zeroing one entry at a time) but never
implements them.  This module supplies the TPU-idiomatic implementation:

  * ``givens_rotation(a, b)`` — the (c, s) pair with the same convention as
    the paper (post-rotation second component = 0), guarded for b = 0.
  * ``givens_qr(A)`` — QR by column-wise elimination.  Instead of the
    paper's one-rotation-per-entry sequential sweep (O(mn) tiny host steps
    — hostile to the MXU), each column is zeroed by a LOG-DEPTH pairwise
    elimination tree: rows are paired (stride 1, 2, 4, ...) and every pair
    is rotated SIMULTANEOUSLY as one vectorized row-pair update — the same
    communication-avoiding tree shape as TSQR (``parallel/tsqr.py``), so a
    column costs ceil(log2(m)) full-width VPU/MXU steps rather than m-1
    dependent scalar steps.

Numerically Givens QR is unconditionally stable (each step is exactly
orthogonal), like the Householder path; it exists for parity and for
structured updates (e.g. rank-1 R updates) where rotations touch only two
rows.  For dense factorization the blocked drivers remain the fast path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def givens_rotation(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(c, s) with ``[[c, -s], [s, c]] [a; b] = [r; 0]`` (paper convention:
    c = a/r, s = -b/r with r = hypot(a, b)); (1, 0) when b == 0."""
    r = jnp.hypot(a, b)
    safe = r > 0
    rs = jnp.where(safe, r, 1.0)
    return jnp.where(safe, a / rs, 1.0), jnp.where(safe, -b / rs, 0.0)


def _eliminate_column(R: jax.Array, Q: jax.Array, k: int):
    """Zero R[k+1:, k] by a log-depth pairwise rotation tree.

    At stride s, row k+j (j in [1, s]) eliminates row k+j+s: disjoint row
    pairs, so all rotations at one stride apply as a single gather/rotate
    of full rows (vectorized over pairs AND columns).
    """
    import numpy as np  # static index construction (shapes fixed per step)

    m = R.shape[0]
    s = 1
    while k + s < m:
        # Binary-reduction pairing: surviving rows after level s are
        # k + multiples of 2s; each leader lo eliminates lo + s.  Pairs
        # are disjoint, so one vectorized two-row rotation per level.
        lo = np.arange(k, m, 2 * s)
        hi = lo + s
        keep = hi < m
        lo = jnp.asarray(lo[keep])
        hi = jnp.asarray(hi[keep])
        c, sn = givens_rotation(R[lo, k], R[hi, k])
        # Vectorized two-row rotation: rows_lo' = c*lo - s*hi; rows_hi' =
        # s*lo + c*hi  (G^T with G = [[c, s], [-s, c]] per pair).
        Rlo, Rhi = R[lo, :], R[hi, :]
        R = R.at[lo, :].set(c[:, None] * Rlo - sn[:, None] * Rhi)
        R = R.at[hi, :].set(sn[:, None] * Rlo + c[:, None] * Rhi)
        Qlo, Qhi = Q[lo, :], Q[hi, :]
        Q = Q.at[lo, :].set(c[:, None] * Qlo - sn[:, None] * Qhi)
        Q = Q.at[hi, :].set(sn[:, None] * Qlo + c[:, None] * Qhi)
        s *= 2
    return R, Q


from functools import lru_cache


@lru_cache(maxsize=None)
def _givens_run(m: int, k: int):
    """Shape-specialized jitted elimination program.  Module-level cache:
    defining-and-jitting inside ``givens_qr`` retraced on every call (the
    jit cache died with the closure), and the statically unrolled
    ~n*ceil(log2 m) rotation levels make each retrace expensive (round-2
    ADVICE item 4).  Practical ceiling: program size grows ~quadratically
    with (m, n) — this parity path is for small/structured problems
    (~512^2 class); dense factorization belongs to the blocked drivers."""

    @jax.jit
    def run(A):
        R = A
        Q = jnp.eye(m, dtype=jnp.float32)
        for kk in range(k):
            R, Q = _eliminate_column(R, Q, kk)
        return Q.T, jnp.triu(R)

    return run


def givens_qr(A, mode: str = "reduced"):
    """QR by vectorized Givens elimination trees (one per column).

    Returns (Q, R) like ``householder_qr``: reduced -> (m x k, k x n),
    complete -> (m x m, m x n), k = min(m, n).
    """
    A = jnp.asarray(A, dtype=jnp.float32)
    m, n = A.shape
    k = min(m, n)

    Q, R = _givens_run(m, k if m > k else k - 1)(A)
    if mode == "reduced":
        return Q[:, :k], R[:k, :]
    if mode == "complete":
        return Q, R
    raise ValueError(f"unknown mode {mode!r}")
