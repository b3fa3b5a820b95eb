"""Blocked WY Householder QR — the flagship factorization, one jitted program.

Capability parity (behavior, not code) with the reference's GPU drivers:
  * fp32 blocked QR            -> ``dev_block_qr_wy``   (``Cuda/qr.cu:958-1047``)
  * mixed-precision blocked QR -> ``dev_mixed_precision_block_qr``
                                  (``Cuda/qr.cu:1049-1226``)
  * host/CPU blocked QR        -> ``h_block_qr``        (``Cuda/qr.cu:1275``)
    and the NumPy spec ``block_qr`` (``python/qr.py:91-142``, GVL Alg 5.2.3)
  * recursive blocked QR       -> ``block_recursive_qr`` (``python/qr.py:145``,
    GVL Alg 5.2.4)

TPU-first design.  The reference's panel loop crosses host<->device four-plus
times per panel (CPU panel factor at ``Cuda/qr.cu:1080``, H2D/D2H memcpys at
``qr.cu:1082,1215``, per-kernel syncs inside ``dev_wy_transform``) — its own
acknowledged bottleneck (``README.md:27-28``).  Here the *entire* loop is
traced into one XLA program: the Python-level panel loop has static bounds,
so every slice is static-shaped and exact (no masking waste on the trailing
GEMMs), and XLA overlaps/fuses across panels.  Precision boundaries follow a
:class:`DTypePolicy` instead of cast kernels + pad-to-16 TensorCore plumbing
(``Cuda/qr.cu:1115-1191``).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mixedprecisionblockqr_tpu.ops.cholqr import cholesky_qr2, yamamoto_reflector
from mixedprecisionblockqr_tpu.ops.householder import (
    householder_qr,
    panel_factor,
)
from mixedprecisionblockqr_tpu.ops.policy import (
    DTypePolicy,
    POLICY_FP32,
    matmul,
)
from mixedprecisionblockqr_tpu.ops.wy import (
    apply_block_reflector_left_t,
    apply_block_reflector_right,
)

_HI = jax.lax.Precision.HIGHEST

DEFAULT_BLOCK_SIZE = 128


def _block_qr_traced(
    A: jax.Array,
    block_size: int,
    policy: DTypePolicy,
    want_q: bool,
    B: Optional[jax.Array],
    panel_method: str = "householder",
):
    """Trace-time body: unrolled panel loop with static slices.

    Returns (R_full (m x n, upper-triangular in top n rows), Q (m x m) or
    None, QtB or None).  ``B`` rides along through every left-update so the
    least-squares path never materializes Q (the reference's solver applies
    pinv(Q) explicitly instead, ``python/linear_least_sqare.py:10``).

    panel_method:
      * 'householder' — GVL reflector loop (robust; exact reference
        semantics); applications use the compact-WY (V, T) factors.
      * 'cholqr2' / 'cholqr2s' — (shifted) CholeskyQR2 panel: all-GEMM,
        rides the MXU; applications use the Yamamoto block reflector
        (Y, Sinv).  ~5x faster end-to-end on TPU, conditional on panel
        conditioning (see ops/cholqr.py).
    """
    m, n = A.shape
    r = min(block_size, n)
    A = A.astype(policy.panel)
    q_dtype = policy.q_store or policy.accum
    Q = jnp.eye(m, dtype=q_dtype) if want_q else None
    mm_t = lambda a, b: matmul(a, b, in_dtype=policy.trailing,
                               accum_dtype=policy.accum)
    mm_q = lambda a, b: matmul(a, b, in_dtype=policy.q_update,
                               accum_dtype=policy.accum)

    for lam in range(0, n, r):
        w = min(r, n - lam)
        panel = A[lam:, lam : lam + w]

        # CholeskyQR squares the panel's condition number; tall random
        # panels are safe (cond ~ O(1-10)) but the FINAL panel of a square
        # matrix is square and ill-conditioned — its Gram breaks fp32
        # Cholesky.  Hybrid rule: any panel with aspect < 2 falls back to
        # the Householder panel (static per-panel decision, zero overhead).
        pm = panel_method
        if pm.startswith("cholqr") and (m - lam) < 2 * w:
            pm = "householder"

        if pm in ("householder", "householder_pallas"):
            if pm == "householder_pallas":
                # Fused VMEM kernel (ops/pallas/panel.py): ~1.7x faster than
                # the XLA fori loop for MXU-aligned panels on TPU.
                from mixedprecisionblockqr_tpu.ops.pallas.panel import (
                    panel_factor_fused,
                )

                V, T, Rp = panel_factor_fused(panel)
                V, T, Rp = (
                    V.astype(policy.panel),
                    T.astype(policy.panel),
                    Rp.astype(policy.panel),
                )
            else:
                V, T, Rp = panel_factor(panel)
            A = A.at[lam:, lam : lam + w].set(Rp)

            def left(X):
                return apply_block_reflector_left_t(X, V, T, policy)

            def right(X):
                return apply_block_reflector_right(X, V, T, policy)

        elif pm in ("cholqr1", "cholqr2", "cholqr2s"):
            # cholqr1: single orthogonalization pass + Newton-Schulz S
            # inverse — all small ops become GEMMs; panel orthogonality
            # ~cond^2*eps_f32, below bf16 noise (mixed-policy fast path).
            Q_red, Rp = cholesky_qr2(
                panel,
                shifted=pm == "cholqr2s",
                passes=1 if pm == "cholqr1" else 2,
            )
            Y, Sinv, Rp = yamamoto_reflector(
                Q_red, Rp,
                inv_method="newton" if pm == "cholqr1" else "lu",
            )
            pad = jnp.zeros((m - lam - w, w), A.dtype)
            A = A.at[lam:, lam : lam + w].set(
                jnp.concatenate([Rp.astype(A.dtype), pad], axis=0)
            )

            def left(X):
                # H^T X = X - Y Sinv^T (Y^T X)
                G = mm_t(Y.T, X)
                return X - mm_t(Y, jnp.matmul(Sinv.T, G, precision=_HI))

            def right(X):
                # X H = X - ((X Y) Sinv) Y^T
                XY = mm_q(X, Y)
                return X - mm_q(jnp.matmul(XY, Sinv, precision=_HI), Y.T)

        else:
            raise ValueError(f"unknown panel_method {pm!r}")

        if lam + w < n:
            C = A[lam:, lam + w :]
            A = A.at[lam:, lam + w :].set(left(C).astype(A.dtype))

        if B is not None:
            Bl = B[lam:, :]
            B = B.at[lam:, :].set(left(Bl).astype(B.dtype))

        if want_q:
            Qc = Q[:, lam:]
            Q = Q.at[:, lam:].set(right(Qc).astype(q_dtype))

    R_full = jnp.triu(A.astype(policy.accum))
    return R_full, Q, B


@lru_cache(maxsize=None)
def _jitted_driver(
    block_size: int,
    policy: DTypePolicy,
    want_q: bool,
    with_b: bool,
    panel_method: str = "householder",
):
    def fn(A, B=None):
        return _block_qr_traced(A, block_size, policy, want_q, B, panel_method)

    if with_b:
        return jax.jit(lambda A, B: fn(A, B))
    return jax.jit(lambda A: fn(A, None))


def block_qr(
    A,
    block_size: int = DEFAULT_BLOCK_SIZE,
    policy: DTypePolicy = POLICY_FP32,
    mode: str = "reduced",
    panel_method: str = "householder",
):
    """Blocked WY Householder QR: A = QR.

    Args:
        A: (m, n) matrix, m >= n.
        block_size: panel width r (the reference sweeps r in its size tables,
            ``Cuda/qr.cu:1762-1787``; 128 aligns with the MXU).
        policy: dtype policy. ``POLICY_FP32`` mirrors ``dev_block_qr_wy``;
            ``POLICY_MIXED`` mirrors ``dev_mixed_precision_block_qr`` with
            bf16 GEMMs in place of FP16 TensorCores.
        mode: 'reduced' -> (Q[:, :n], R[:n]); 'complete' -> (Q, R); 'r' ->
            R only (skips all Q-accumulation GEMMs).
        panel_method: 'householder' (robust, reference semantics) or
            'cholqr2'/'cholqr2s' (all-MXU fast path; see ops/cholqr.py).
    """
    A = jnp.asarray(A)
    if A.dtype not in (jnp.float32, jnp.float64, jnp.bfloat16):
        A = A.astype(policy.panel)
    m, n = A.shape
    if m < n:
        raise ValueError(f"block_qr requires m >= n, got {A.shape}")
    want_q = mode in ("reduced", "complete")
    R_full, Q, _ = _jitted_driver(block_size, policy, want_q, False, panel_method)(A)
    if mode == "r":
        return R_full[:n, :]
    if mode == "reduced":
        return Q[:, :n], R_full[:n, :]
    if mode == "complete":
        return Q, R_full
    raise ValueError(f"unknown mode {mode!r}")


def block_qr_qtb(
    A,
    B,
    block_size: int = DEFAULT_BLOCK_SIZE,
    policy: DTypePolicy = POLICY_FP32,
    panel_method: str = "householder",
) -> Tuple[jax.Array, jax.Array]:
    """Factor A and return (R (n x n), Q^T B) without materializing Q.

    The least-squares fast path: B is updated by each panel's block reflector
    in the same pass as the trailing matrix.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    squeeze = B.ndim == 1
    if squeeze:
        B = B[:, None]
    m, n = A.shape
    R_full, _, QtB = _jitted_driver(block_size, policy, False, True, panel_method)(
        A, B.astype(policy.panel)
    )
    QtB = QtB.astype(policy.accum)
    if squeeze:
        QtB = QtB[:, 0]
    return R_full[:n, :], QtB


def block_recursive_qr(A, mode: str = "reduced", min_block: int = 64):
    """Recursive blocked QR on *reduced* factors (GVL Alg 5.2.4; spec at
    ``python/qr.py:145-173`` — whose leaf returns reduced factors regardless
    of the mode argument, making the whole recursion reduced-form; we follow
    that semantics and therefore only support ``mode='reduced'``).

    Columns are split in half recursively; leaves use the blocked driver.
    The combine step is two block GEMMs — all MXU work.
    """
    if mode != "reduced":
        raise ValueError("block_recursive_qr supports mode='reduced' only")
    A = jnp.asarray(A, dtype=jnp.float32)

    @jax.jit
    def run(A):
        def rec(A):
            m, n = A.shape
            if n <= min_block:
                R_full, Q, _ = _block_qr_traced(A, min_block, POLICY_FP32, True, None)
                return Q[:, :n], R_full[:n, :]
            n1 = n // 2
            Q1, R11 = rec(A[:, :n1])
            R12 = jnp.matmul(Q1.T, A[:, n1:], precision=_HI)
            Q2, R22 = rec(A[:, n1:] - jnp.matmul(Q1, R12, precision=_HI))
            Q = jnp.concatenate([Q1, Q2], axis=1)
            top = jnp.concatenate([R11, R12], axis=1)
            bot = jnp.concatenate(
                [jnp.zeros((R22.shape[0], n1), A.dtype), R22], axis=1
            )
            return Q, jnp.concatenate([top, bot], axis=0)

        return rec(A)

    return run(A)


def block_qr_batched(
    A_batch,
    block_size: int = DEFAULT_BLOCK_SIZE,
    policy: DTypePolicy = POLICY_FP32,
    mode: str = "reduced",
    panel_method: str = "householder",
):
    """Batched blocked QR over a leading batch axis (vmap; the data-parallel
    analog — shard the batch axis over a mesh for multi-chip DP)."""
    A_batch = jnp.asarray(A_batch)
    if A_batch.ndim != 3:
        raise ValueError(f"expected (batch, m, n), got {A_batch.shape}")
    want_q = mode in ("reduced", "complete")
    fn = _jitted_driver(block_size, policy, want_q, False, panel_method)
    R_full, Q, _ = jax.vmap(fn)(A_batch)
    n = A_batch.shape[2]
    if mode == "r":
        return R_full[:, :n, :]
    if mode == "reduced":
        return Q[:, :, :n], R_full[:, :n, :]
    return Q, R_full


def qr(
    A,
    block_size: int = DEFAULT_BLOCK_SIZE,
    policy: DTypePolicy = POLICY_FP32,
    mode: str = "reduced",
):
    """Main entry: dispatches unblocked for narrow problems, blocked otherwise."""
    A = jnp.asarray(A)
    m, n = A.shape
    if n <= 8 or m < n:
        if m < n:
            raise ValueError(f"qr requires m >= n, got {A.shape}")
        return householder_qr(A.astype(policy.panel), mode=mode, dtype=policy.panel)
    return block_qr(A, block_size=block_size, policy=policy, mode=mode)
