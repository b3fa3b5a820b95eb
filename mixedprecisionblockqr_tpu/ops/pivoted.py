"""Column-pivoted (rank-revealing) Householder QR.

The reference's solver oracle is Eigen's ``colPivHouseholderQr``
(``Cuda/QR/Solver/solver.cu:21-32``) and its Python fixtures include
rank-deficient matrices (``python/test_data.py:38-57``: rank-1, zero-row,
diagonal) — but no pivoted factorization exists anywhere in the reference
itself.  This module supplies it, closing the rank-deficient least-squares
path (``models/lstsq.py`` routes here when R's diagonal decays).

Algorithm: Businger-Golub column pivoting (the LAPACK ``xGEQP3`` family) —
at step k, swap the remaining column of largest 2-norm into position k,
eliminate it with a Householder reflector, repeat.  The result is
``A P = Q R`` with ``|R[0,0]| >= |R[1,1]| >= ...`` — the diagonal decay
exposes numerical rank.

TPU-first shape: ONE ``lax.fori_loop`` whose step works on full-width
static-shaped buffers —
  * pivot selection is a masked argmax over maintained column norms (no
    data-dependent shapes),
  * the column swap is two ``dynamic_update_slice`` writes (columns are
    contiguous in the (m, n) layout's minor axis tiling),
  * the reflector is built from a row-masked column (rows < k zeroed) and
    applied FULL-WIDTH as a rank-1 update ``A -= beta v (v^T A)`` — rows
    above k carry v = 0 and are untouched, exactly the masked-static-shape
    pattern of ``ops/householder.py``,
  * column norms are RECOMPUTED from the updated rows each step (one
    masked reduction — same O(mn) order as the rank-1 update itself)
    instead of LAPACK's downdate-with-retolerancing: simpler, immune to
    the classic downdate cancellation failure, and free on the VPU.

Cost: 2mn(k) FLOPs of rank-1 updates over min(m, n) sequential steps —
the robustness tier's price; the unpivoted blocked drivers remain the
throughput path.  Compiles as one scan program (compile-light at any n).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("want_q", "with_b"))
def _pivoted_qr_impl(A: jax.Array, B, want_q: bool, with_b: bool):
    m, n = A.shape
    kmax = min(m, n)
    A = A.astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    Q = jnp.eye(m, dtype=jnp.float32) if want_q else jnp.zeros((1, 1))
    Bc = B.astype(jnp.float32) if with_b else jnp.zeros((1, 1))
    perm = jnp.arange(n, dtype=jnp.int32)
    tiny = jnp.finfo(jnp.float32).tiny

    def step(k, carry):
        A, Q, Bc, perm = carry
        k = jnp.asarray(k)
        zero = jnp.zeros((), k.dtype)  # index dtypes must match (x64 mode)
        # --- pivot: remaining column (>= k) of largest live-row norm ---
        live = (rows >= k).astype(jnp.float32)
        colnorms = jnp.sum((A * live) ** 2, axis=0)          # (n,)
        masked = jnp.where(cols1[0] >= k, colnorms, -jnp.inf)
        j = jnp.argmax(masked).astype(k.dtype)
        # --- swap columns k <-> j of A (and the bookkeeping vectors) ---
        ck = jax.lax.dynamic_slice(A, (zero, k), (m, 1))
        cj = jax.lax.dynamic_slice(A, (zero, j), (m, 1))
        A = jax.lax.dynamic_update_slice(A, ck, (zero, j))
        A = jax.lax.dynamic_update_slice(A, cj, (zero, k))
        pk = jax.lax.dynamic_slice(perm, (k,), (1,))
        pj = jax.lax.dynamic_slice(perm, (j,), (1,))
        perm = jax.lax.dynamic_update_slice(perm, pk, (j,))
        perm = jax.lax.dynamic_update_slice(perm, pj, (k,))
        # --- Householder reflector on column k, rows >= k (masked) ---
        x = jax.lax.dynamic_slice(A, (zero, k), (m, 1)) * live  # (m, 1)
        sigma = jnp.sqrt(jnp.sum(x * x))
        xk = jnp.sum(jnp.where(rows == k, x, 0.0))
        sign = jnp.where(xk >= 0, 1.0, -1.0)                 # GVL convention
        ek = (rows == k).astype(jnp.float32)
        v = x + sign * sigma * ek
        vtv = jnp.sum(v * v)
        beta = jnp.where(vtv > tiny, 2.0 / jnp.maximum(vtv, tiny), 0.0)
        # --- full-width rank-1 updates (rows < k untouched: v there = 0) ---
        vA = jnp.matmul(v.T, A, precision=_HI)               # (1, n)
        A = A - beta * v * vA
        if with_b:
            vB = jnp.matmul(v.T, Bc, precision=_HI)
            Bc = Bc - beta * v * vB
        if want_q:
            Qv = jnp.matmul(Q, v, precision=_HI)             # (m, 1)
            Q = Q - beta * Qv * v.T
        return A, Q, Bc, perm

    A, Q, Bc, perm = jax.lax.fori_loop(0, kmax, step, (A, Q, Bc, perm))
    R = jnp.triu(A)
    return R, Q, Bc, perm


def pivoted_qr(A, mode: str = "reduced"):
    """Column-pivoted QR: ``A[:, perm] = Q @ R`` with non-increasing
    ``|diag(R)|``.

    Returns (Q, R, perm) — reduced: Q (m, k), R (k, n); complete: Q (m, m),
    R (m, n); mode 'r': (R (k, n), perm).  Parity target:
    ``scipy.linalg.qr(A, pivoting=True)`` / Eigen ``colPivHouseholderQr``
    (``solver.cu:21-32``) up to column-sign convention.
    """
    A = jnp.asarray(A)
    m, n = A.shape
    k = min(m, n)
    want_q = mode in ("reduced", "complete")
    R, Q, _, perm = _pivoted_qr_impl(A, None, want_q, False)
    if mode == "r":
        return R[:k, :], perm
    if mode == "reduced":
        return Q[:, :k], R[:k, :], perm
    if mode == "complete":
        return Q, R, perm
    raise ValueError(f"unknown mode {mode!r}")


def pivoted_qr_qtb(A, B) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Factor with pivoting and return (R, Q^T B, perm) without
    materializing Q — the rank-deficient least-squares fast path."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    squeeze = B.ndim == 1
    if squeeze:
        B = B[:, None]
    m, n = A.shape
    k = min(m, n)
    R, _, QtB, perm = _pivoted_qr_impl(A, B, False, True)
    QtB = QtB[:, 0] if squeeze else QtB
    return R[:k, :], QtB, perm


def numerical_rank(
    R: jax.Array, rcond: float | None = None, m: int | None = None
) -> int:
    """Numerical rank from a PIVOTED R's diagonal decay: the count of
    ``|R[i,i]| > rcond * |R[0,0]|`` (diagonal is non-increasing by the
    pivoting invariant).  Default rcond = eps_f32 * max(m, n) — the
    ``np.linalg.lstsq``-style machine-precision cutoff.  ``R`` is usually
    the trimmed (k, n) factor, which no longer carries the original row
    count: callers that know it pass ``m`` so the default cutoff evaluates
    eps * max(m, n) for tall systems, not eps * n (round-3 ADVICE item 3).
    """
    d = jnp.abs(jnp.diag(jnp.asarray(R)))
    if rcond is None:
        rcond = float(jnp.finfo(jnp.float32).eps) * max(
            R.shape[1], m if m is not None else 0, R.shape[0]
        )
    return int(jnp.sum(d > rcond * (d[0] + jnp.finfo(jnp.float32).tiny)))
