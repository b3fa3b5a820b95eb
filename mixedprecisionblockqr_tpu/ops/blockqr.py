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

from mixedprecisionblockqr_tpu.ops.cholqr import (
    cholesky_qr2,
    newton_inv,
    yamamoto_reflector,
)
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


def _on_tpu() -> bool:
    import jax.extend.backend as jxb

    try:
        return jxb.get_backend().platform not in ("cpu",)
    except Exception:
        return False


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
      * 'cholqr1' / 'cholqr2' / 'cholqr2s' — (1-pass / 2-pass / shifted)
        CholeskyQR panel: all-GEMM, rides the MXU; applications use the
        Yamamoto block reflector (Y, Sinv) with a Newton-Schulz S-inverse.
        cholqr1 is 15-20x faster than the reflector loop at 2048^2
        (BENCH_NOTES.md); low-aspect panels auto-fall back to Householder
        (hybrid rule below).
      * 'cholqr1x2' — paired panels merged into one 2r-wide reflector
        (fewer large GEMMs; measured neutral-to-slower at 2048 — kept for
        wider-panel experimentation).
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

    def _sub_reflector(cols, lam_, w_):
        """CholeskyQR1 + Yamamoto of one sub-panel (rows lam_:, given the
        already-updated column block ``cols`` of height m - lam_)."""
        Q_red, Rp = cholesky_qr2(cols, passes=1)
        Y, Sinv, Rp = yamamoto_reflector(Q_red, Rp, inv_method="newton")
        return Y, Sinv, Rp

    pair_mode = panel_method == "cholqr1x2"
    base_method = "cholqr1" if pair_mode else panel_method

    lam = 0
    while lam < n:
        w = min(r, n - lam)

        # --- paired-panel fast path ("cholqr1x2"): factor two adjacent
        # r-wide panels, merge their Yamamoto reflectors into one 2r-wide
        # block reflector (H1 H2 = I - Yc Sc Yc^T with
        # Sc = [[S1, -S1 (Y1^T Y2) S2], [0, S2]]), and apply trailing/Q/B
        # updates ONCE — halving the count of the large GEMMs.
        if (
            pair_mode
            and w == r
            and lam + 2 * r <= n
            and (m - lam - r) >= 2 * r  # sub-panel 2 stays tall (aspect>=2)
        ):
            P1 = A[lam:, lam : lam + r]
            Y1, S1, R1 = _sub_reflector(P1, lam, r)
            A = A.at[lam:, lam : lam + r].set(
                jnp.concatenate(
                    [R1, jnp.zeros((m - lam - r, r), A.dtype)], axis=0
                ).astype(A.dtype)
            )
            # Update only the sibling panel's columns with H1^T.
            C = A[lam:, lam + r : lam + 2 * r]
            G1 = mm_t(Y1.T, C)
            C = C - mm_t(Y1, jnp.matmul(S1.T, G1, precision=_HI))
            # Sub-panel 2 lives on rows lam+r: (static slice).
            Y2b, S2, R2 = _sub_reflector(C[r:, :], lam + r, r)
            A = A.at[lam:, lam + r : lam + 2 * r].set(
                jnp.concatenate(
                    [C[:r, :], R2, jnp.zeros((m - lam - 2 * r, r), A.dtype)],
                    axis=0,
                ).astype(A.dtype)
            )
            Y2 = jnp.concatenate(
                [jnp.zeros((r, r), Y2b.dtype), Y2b], axis=0
            )
            # Merge: Sc upper block = -S1 (Y1^T Y2) S2.
            cross = jnp.matmul(
                jnp.matmul(S1, mm_t(Y1.T, Y2), precision=_HI),
                S2, precision=_HI,
            )
            Yc = jnp.concatenate([Y1, Y2], axis=1)       # (m-lam, 2r)
            Sc = jnp.concatenate(
                [
                    jnp.concatenate([S1, -cross], axis=1),
                    jnp.concatenate([jnp.zeros((r, r), S2.dtype), S2], axis=1),
                ],
                axis=0,
            )

            if lam + 2 * r < n:
                C2 = A[lam:, lam + 2 * r :]
                G = mm_t(Yc.T, C2)
                C2 = C2 - mm_t(Yc, jnp.matmul(Sc.T, G, precision=_HI))
                A = A.at[lam:, lam + 2 * r :].set(C2.astype(A.dtype))
            if B is not None:
                Bl = B[lam:, :]
                Gb = mm_t(Yc.T, Bl)
                Bl = Bl - mm_t(Yc, jnp.matmul(Sc.T, Gb, precision=_HI))
                B = B.at[lam:, :].set(Bl.astype(B.dtype))
            if want_q:
                Qc = Q[:, lam:]
                XY = mm_q(Qc, Yc)
                Qc = Qc - mm_q(jnp.matmul(XY, Sc, precision=_HI), Yc.T)
                Q = Q.at[:, lam:].set(Qc.astype(q_dtype))
            lam += 2 * r
            continue

        panel = A[lam:, lam : lam + w]

        # CholeskyQR squares the panel's condition number; tall random
        # panels are safe (cond ~ O(1-10)) but the FINAL panel of a square
        # matrix is square and ill-conditioned — its Gram breaks fp32
        # Cholesky.  Hybrid rule: any panel with aspect < 2 falls back to
        # the Householder panel (static per-panel decision, zero overhead).
        pm = base_method
        if pm.startswith("cholqr") and (m - lam) < 2 * w:
            pm = "householder_pallas" if _on_tpu() else "householder"

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
            # Newton-Schulz S-inverse converges to fp32 roundoff in 6
            # GEMMs (sigma(S) in [1,2]); LU costs ~150us latency per call.
            Y, Sinv, Rp = yamamoto_reflector(Q_red, Rp, inv_method="newton")
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

        lam += w

    R_full = jnp.triu(A.astype(policy.accum))
    return R_full, Q, B


def _block_qr_scan(
    A: jax.Array,
    block_size: int,
    policy: DTypePolicy,
    want_q: bool,
    B: Optional[jax.Array],
    panel_method: str = "cholqr1",
):
    """Scan-mode driver: ONE compiled panel step iterated by ``fori_loop``.

    The unrolled driver compiles n/r distinct panel programs (minutes at
    8192^2 over a remote-compile link); here every panel shares one step:
    the CholeskyQR panel is masked to rows >= lam, the Yamamoto reflector is
    applied FULL-WIDTH (finished columns are invariant — Y has no support on
    their nonzero rows — and the panel columns become [R; 0] exactly), so no
    slice-and-scatter bookkeeping exists.  The final panel (square,
    CholeskyQR-hostile) runs statically through the Householder panel.

    Requires n % block_size == 0 (caller falls back to unrolled otherwise).
    """
    m, n = A.shape
    r = block_size
    A = A.astype(policy.panel)
    q_dtype = policy.q_store or policy.accum
    Q = jnp.eye(m, dtype=q_dtype) if want_q else None
    mm_t = lambda a, b: matmul(a, b, in_dtype=policy.trailing,
                               accum_dtype=policy.accum)
    mm_q = lambda a, b: matmul(a, b, in_dtype=policy.q_update,
                               accum_dtype=policy.accum)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]

    def panel_step(k, carry):
        A, Q, B = carry
        lam = k * r
        P = jax.lax.dynamic_slice(A, (0, lam), (m, r))
        P = jnp.where(rows[:, None] >= lam, P, 0.0)
        Q_red, _ = cholesky_qr2(
            P, shifted=panel_method == "cholqr2s",
            passes=1 if panel_method == "cholqr1" else 2,
        )
        # Yamamoto reflector anchored at global row lam.
        Q1 = jax.lax.dynamic_slice(Q_red, (lam, 0), (r, r))
        D = jnp.where(jnp.diag(Q1) > 0, -1.0, 1.0).astype(Q_red.dtype)
        Qs = Q_red * D[None, :]
        e1 = (
            (rows[:, None] - lam)
            == jax.lax.broadcasted_iota(jnp.int32, (m, r), 1)
        ).astype(Qs.dtype)
        Y = Qs - e1
        S = jnp.eye(r, dtype=Qs.dtype) - (Q1 * D[None, :]).T
        Sinv = newton_inv(S)
        # Full-width left update A <- H^T A.
        G = mm_t(Y.T, A)
        A = (A - mm_t(Y, jnp.matmul(Sinv.T, G, precision=_HI))).astype(A.dtype)
        if B is not None:
            Gb = mm_t(Y.T, B)
            B = (B - mm_t(Y, jnp.matmul(Sinv.T, Gb, precision=_HI))).astype(
                B.dtype
            )
        if Q is not None:
            QY = mm_q(Q, Y)
            Q = (Q - mm_q(jnp.matmul(QY, Sinv, precision=_HI), Y.T)).astype(
                q_dtype
            )
        return A, Q, B

    nb = n // r
    dummy = jnp.zeros((1, 1), A.dtype)
    carry = (A, Q if want_q else dummy, B if B is not None else dummy)

    def wrapped(k, c):
        a, q, b = c
        a2, q2, b2 = panel_step(
            k, (a, q if want_q else None, b if B is not None else None)
        )
        return a2, (q2 if want_q else q), (b2 if B is not None else b)

    # All but the last panel via the scan; the final (aspect-1) panel runs
    # statically with the robust Householder factorization.
    A, Qc, Bc = jax.lax.fori_loop(0, nb - 1, wrapped, carry)
    Q = Qc if want_q else None
    B = Bc if B is not None else None

    lam = n - r
    V, T, Rp = panel_factor(A[lam:, lam:])
    A = A.at[lam:, lam:].set(Rp)
    if B is not None:
        B = B.at[lam:, :].set(
            apply_block_reflector_left_t(B[lam:, :], V, T, policy).astype(
                B.dtype
            )
        )
    if want_q:
        Qc = apply_block_reflector_right(
            Q[:, lam:].astype(policy.accum), V, T, policy
        )
        Q = Q.at[:, lam:].set(Qc.astype(q_dtype))

    R_full = jnp.triu(A.astype(policy.accum))
    return R_full, Q, B


@lru_cache(maxsize=None)
def _jitted_driver(
    block_size: int,
    policy: DTypePolicy,
    want_q: bool,
    with_b: bool,
    panel_method: str = "householder",
    loop_mode: str = "unroll",
):
    def fn(A, B=None):
        if loop_mode == "scan":
            return _block_qr_scan(A, block_size, policy, want_q, B,
                                  panel_method)
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
    loop_mode: str = "unroll",
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
    if jnp.dtype(policy.panel) == jnp.float64 and not jax.config.jax_enable_x64:
        raise ValueError(
            "POLICY_FP64 requires jax_enable_x64 "
            "(jax.config.update('jax_enable_x64', True))"
        )
    m, n = A.shape
    if m < n:
        raise ValueError(f"block_qr requires m >= n, got {A.shape}")
    want_q = mode in ("reduced", "complete")
    if loop_mode == "scan" and (
        n % min(block_size, n) != 0
        or not panel_method.startswith("cholqr")
        or n <= block_size
    ):
        loop_mode = "unroll"  # scan needs r | n and a cholqr panel method
    R_full, Q, _ = _jitted_driver(
        block_size, policy, want_q, False, panel_method, loop_mode
    )(A)
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
    """Main entry: dispatches unblocked for narrow/wide problems, blocked
    otherwise.  Wide matrices (m < n) go through the unblocked path, matching
    the reference's ``householder_qr`` semantics (``python/qr.py:26``):
    Q is (m, k) / (m, m) and R is (k, n) / (m, n) with k = min(m, n)."""
    A = jnp.asarray(A)
    m, n = A.shape
    if n <= 8 or m < n:
        return householder_qr(A.astype(policy.panel), mode=mode, dtype=policy.panel)
    return block_qr(A, block_size=block_size, policy=policy, mode=mode)
