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


def _eliminate_column_masked(R: jax.Array, Q: jax.Array, k: jax.Array):
    """Zero R[k+1:, k] for a RUNTIME column index ``k``: the same log-depth
    pairwise rotation tree as ``_eliminate_column``, but with dynamic
    (traced) gather indices and identity-masked out-of-range pairs, so ONE
    compiled program serves every column.  Levels are the static
    ceil(log2(m)) worst case; pairs past the live range gather from
    clamped indices (their rotation is masked to identity) and scatter
    back through the UNCLAMPED out-of-bounds index under ``mode='drop'``
    — a clamped scatter would collide with a valid pair's write to row
    m-1 and clobber it nondeterministically.
    """
    m = R.shape[0]
    s = 1
    while s < m:
        npairs = (m + 2 * s - 1) // (2 * s)  # static per level
        i = jnp.arange(npairs)
        lo = k + 2 * s * i
        hi = lo + s
        valid = hi < m  # hi > lo, so this bounds lo too
        lo_c = jnp.minimum(lo, m - 1)
        hi_c = jnp.minimum(hi, m - 1)
        colk = jax.lax.dynamic_slice(R, (jnp.zeros_like(k), k), (m, 1))[:, 0]
        c, sn = givens_rotation(colk[lo_c], colk[hi_c])
        c = jnp.where(valid, c, 1.0)
        sn = jnp.where(valid, sn, 0.0)
        Rlo, Rhi = R[lo_c, :], R[hi_c, :]
        R = R.at[lo, :].set(c[:, None] * Rlo - sn[:, None] * Rhi,
                            mode="drop")
        R = R.at[hi, :].set(sn[:, None] * Rlo + c[:, None] * Rhi,
                            mode="drop")
        Qlo, Qhi = Q[lo_c, :], Q[hi_c, :]
        Q = Q.at[lo, :].set(c[:, None] * Qlo - sn[:, None] * Qhi,
                            mode="drop")
        Q = Q.at[hi, :].set(sn[:, None] * Qlo + c[:, None] * Qhi,
                            mode="drop")
        s *= 2
    return R, Q


@lru_cache(maxsize=None)
def _givens_run_scan(m: int, k: int):
    """Scan-mode program: ``lax.fori_loop`` over columns with the masked
    dynamic-index tree — program size O(log m) independent of n, so it
    compiles at the flagship scales where the unrolled program (one traced
    tree per column, ~quadratic growth) cannot.  ~2x the unrolled path's
    gather work (full-height index ranges every column instead of the
    shrinking k: suffix), same unconditional stability."""

    @jax.jit
    def run(A):
        R = A
        Q = jnp.eye(m, dtype=jnp.float32)

        def body(kk, carry):
            R, Q = carry
            return _eliminate_column_masked(R, Q, kk)

        R, Q = jax.lax.fori_loop(0, k, body, (R, Q))
        return Q.T, jnp.triu(R)

    return run


@lru_cache(maxsize=None)
def _givens_run(m: int, k: int):
    """Shape-specialized jitted elimination program.  Module-level cache:
    defining-and-jitting inside ``givens_qr`` retraced on every call (the
    jit cache died with the closure), and the statically unrolled
    ~n*ceil(log2 m) rotation levels make each retrace expensive (round-2
    ADVICE item 4).  Practical ceiling: program size grows ~quadratically
    with (m, n) — past ~512^2 ``loop_mode='auto'`` switches to
    ``_givens_run_scan``; dense factorization belongs to the blocked
    drivers either way."""

    @jax.jit
    def run(A):
        R = A
        Q = jnp.eye(m, dtype=jnp.float32)
        for kk in range(k):
            R, Q = _eliminate_column(R, Q, kk)
        return Q.T, jnp.triu(R)

    return run


def givens_qr(A, mode: str = "reduced", loop_mode: str = "auto"):
    """QR by vectorized Givens elimination trees (one per column).

    Returns (Q, R) like ``householder_qr``: reduced -> (m x k, k x n),
    complete -> (m x m, m x n), k = min(m, n).

    ``loop_mode``: 'unroll' traces one static-index tree per column
    (fastest, but program size grows ~quadratically with (m, n) — the
    ~512^2-class ceiling); 'scan' runs ONE masked dynamic-index tree in a
    ``fori_loop`` (O(log m) program, compiles at any size); 'auto' picks
    'unroll' within the documented ceiling and 'scan' past it — mirroring
    ``block_qr``'s unroll/scan split.
    """
    A = jnp.asarray(A, dtype=jnp.float32)
    m, n = A.shape
    k = min(m, n)

    if loop_mode == "auto":
        loop_mode = "unroll" if m <= 512 and k <= 512 else "scan"
    if loop_mode not in ("unroll", "scan"):
        raise ValueError(f"unknown loop_mode {loop_mode!r}")
    runner = _givens_run if loop_mode == "unroll" else _givens_run_scan
    Q, R = runner(m, k if m > k else k - 1)(A)
    if mode == "reduced":
        return Q[:, :k], R[:k, :]
    if mode == "complete":
        return Q, R
    raise ValueError(f"unknown mode {mode!r}")
