"""Givens-rotation QR (ops/givens.py) — the reference paper's alternative
elimination (LaTeX/QR_Decomposition.tex, Givens section), implemented as
log-depth vectorized rotation trees.  Oracle: numpy reconstruction."""

import jax.numpy as jnp
import numpy as np
import pytest

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.givens import givens_qr, givens_rotation


def test_givens_rotation_zeroes_second_component():
    c, s = givens_rotation(jnp.float32(3.0), jnp.float32(4.0))
    G = np.array([[c, -s], [s, c]], dtype=np.float32)
    np.testing.assert_allclose(G @ np.array([3.0, 4.0]), [5.0, 0.0],
                               atol=1e-6)
    # Degenerate b = 0: identity rotation, no NaN.
    c0, s0 = givens_rotation(jnp.float32(0.0), jnp.float32(0.0))
    assert float(c0) == 1.0 and float(s0) == 0.0


@pytest.mark.parametrize("shape", [(8, 8), (16, 8), (7, 5), (12, 12), (5, 9)])
def test_givens_qr_reconstructs(shape):
    rng = np.random.default_rng(sum(shape))
    A = rng.standard_normal(shape).astype(np.float32)
    Q, R = givens_qr(A, mode="reduced")
    k = min(shape)
    assert Q.shape == (shape[0], k) and R.shape == (k, shape[1])
    np.testing.assert_allclose(np.asarray(Q) @ np.asarray(R), A, atol=1e-5)
    assert np.max(np.abs(np.asarray(Q).T @ np.asarray(Q) - np.eye(k))) < 1e-5
    assert np.allclose(np.tril(np.asarray(R), -1), 0.0)


def test_givens_qr_complete_criteria():
    rng = np.random.default_rng(3)
    A = rng.standard_normal((24, 16)).astype(np.float32)
    Q, R = givens_qr(A, mode="complete")
    rep = metrics.evaluate(A, Q, R, precision_bits=23)
    assert rep.all_ok, str(rep)


@pytest.mark.parametrize("shape", [(16, 8), (12, 12), (5, 9)])
def test_givens_qr_scan_matches_unroll(shape):
    """The masked dynamic-index scan tree applies EXACTLY the same
    rotation sequence as the per-column unrolled tree — results agree to
    roundoff (invalid pairs are identity-masked and their writes dropped;
    a clamped scatter instead collided with valid writes to row m-1)."""
    rng = np.random.default_rng(sum(shape))
    A = rng.standard_normal(shape).astype(np.float32)
    Qs, Rs = givens_qr(A, mode="complete", loop_mode="scan")
    Qu, Ru = givens_qr(A, mode="complete", loop_mode="unroll")
    np.testing.assert_allclose(np.asarray(Qs), np.asarray(Qu), atol=2e-5)
    np.testing.assert_allclose(np.asarray(Rs), np.asarray(Ru), atol=2e-5)


@pytest.mark.parametrize("shape", [(12, 8), (16, 16), (8, 20)])
def test_qr_rank1_update(shape):
    """GVL 12.5.1 rank-1 update: Q'R' = A + uv^T at fp32 roundoff, Q'
    orthogonal, R' exactly triangular; downdating with -u round-trips."""
    from mixedprecisionblockqr_tpu.ops.givens import qr_rank1_update

    rng = np.random.default_rng(sum(shape))
    A = rng.standard_normal(shape).astype(np.float32)
    u = rng.standard_normal(shape[0]).astype(np.float32)
    v = rng.standard_normal(shape[1]).astype(np.float32)
    Q, R = givens_qr(A, mode="complete")
    Q2, R2 = qr_rank1_update(Q, R, u, v)
    tgt = A + np.outer(u, v)
    rep = metrics.evaluate(tgt, np.asarray(Q2), np.asarray(R2),
                           precision_bits=23)
    assert rep.all_ok, str(rep)
    assert np.allclose(np.tril(np.asarray(R2), -1), 0.0)
    Q3, R3 = qr_rank1_update(Q2, R2, -u, v)
    np.testing.assert_allclose(np.asarray(Q3) @ np.asarray(R3), A, atol=1e-4)


def test_qr_rank1_update_rejects_reduced_q():
    from mixedprecisionblockqr_tpu.ops.givens import qr_rank1_update

    rng = np.random.default_rng(0)
    A = rng.standard_normal((10, 4)).astype(np.float32)
    Q, R = givens_qr(A, mode="reduced")
    with pytest.raises(ValueError):
        qr_rank1_update(Q, np.zeros((10, 4), np.float32),
                        np.zeros(10), np.zeros(4))


def test_qr_append_row_incremental_lstsq():
    """Appending an observation row to (R, Q^T b) must reproduce the
    stacked system's fresh factorization: same |diag(R)|, same R^T R
    Gram, and the SAME least-squares solution — the recursive-least-
    squares primitive (new SLAM measurement rows without O(mn^2)
    refactorization)."""
    from mixedprecisionblockqr_tpu.ops.givens import qr_append_row

    rng = np.random.default_rng(2)
    A = rng.standard_normal((20, 8)).astype(np.float32)
    b = rng.standard_normal(20).astype(np.float32)
    a_new = rng.standard_normal(8).astype(np.float32)
    beta = np.float32(0.7)
    Q, R = givens_qr(A, mode="reduced")
    qtb = np.asarray(Q).T @ b
    R2, qtb2 = qr_append_row(np.asarray(R)[:8], a_new, qtb=qtb, beta=beta)
    A2 = np.vstack([A, a_new])
    Rref = np.linalg.qr(A2.astype(np.float64), mode="r")
    assert np.allclose(np.abs(np.diag(np.asarray(R2))),
                       np.abs(np.diag(Rref)), rtol=1e-5)
    assert np.allclose(np.asarray(R2).T @ np.asarray(R2), A2.T @ A2,
                       rtol=1e-4, atol=1e-4)
    x_inc = np.linalg.solve(np.asarray(R2), np.asarray(qtb2))
    x_ref, *_ = np.linalg.lstsq(A2.astype(np.float64),
                                np.append(b, beta).astype(np.float64),
                                rcond=None)
    np.testing.assert_allclose(x_inc, x_ref, atol=1e-4)
    # R-only variant agrees with the augmented one.
    R3 = qr_append_row(np.asarray(R)[:8], a_new)
    np.testing.assert_allclose(np.asarray(R3), np.asarray(R2), atol=1e-6)


def test_givens_qr_scan_past_unroll_ceiling():
    """'auto' routes past the ~512^2 unrolled-program ceiling to the scan
    tier (O(log m) program in a fori_loop) — fp32-roundoff quality at a
    size whose unrolled trace cannot reasonably compile (round-3 VERDICT
    weak item 6)."""
    rng = np.random.default_rng(7)
    A = rng.standard_normal((640, 96)).astype(np.float32)
    Q, R = givens_qr(A, mode="complete")  # auto -> scan (m > 512)
    rep = metrics.evaluate(A, Q, R, precision_bits=23)
    assert rep.all_ok, str(rep)
    assert np.max(np.abs(np.asarray(Q).T @ np.asarray(Q) - np.eye(640))) < 1e-5


# --- incremental family completion: scipy qr_insert/qr_delete parity ------


def _complete_qr(a):
    Q, R = np.linalg.qr(a, mode="complete")
    return jnp.asarray(Q.astype(np.float32)), jnp.asarray(R.astype(np.float32))


def _check_factors(a_new, Q, R, rtol=2e-5):
    Q, R = np.asarray(Q, np.float64), np.asarray(R, np.float64)
    m = Q.shape[0]
    assert np.max(np.abs(Q.T @ Q - np.eye(m))) < rtol
    assert np.allclose(np.tril(R[: R.shape[1], :], -1), 0.0)
    scale = max(np.linalg.norm(a_new), 1e-30)
    assert np.linalg.norm(a_new - Q @ R) / scale < rtol
    # R-diagonal parity with a fresh factorization (sign-free)
    Rn = np.linalg.qr(a_new, mode="r")
    k = min(a_new.shape)
    np.testing.assert_allclose(
        np.abs(np.diag(R)[:k]), np.abs(np.diag(Rn)[:k]), rtol=1e-4,
        atol=rtol * (np.abs(Rn).max() + 1),
    )


@pytest.mark.parametrize("k", [0, 7, 19])
def test_qr_delete_col(k):
    from mixedprecisionblockqr_tpu.ops.givens import qr_delete_col

    rng = np.random.default_rng(20 + k)
    a = rng.standard_normal((32, 20)).astype(np.float32)
    Q, R = _complete_qr(a)
    Qp, Rp = qr_delete_col(Q, R, k)
    _check_factors(np.delete(a, k, axis=1), Qp, Rp)


@pytest.mark.parametrize("k", [0, 9, 20])
def test_qr_insert_col(k):
    from mixedprecisionblockqr_tpu.ops.givens import qr_insert_col

    rng = np.random.default_rng(40 + k)
    a = rng.standard_normal((32, 20)).astype(np.float32)
    u = rng.standard_normal(32).astype(np.float32)
    Q, R = _complete_qr(a)
    Qp, Rp = qr_insert_col(Q, R, k, u)
    _check_factors(np.insert(a, k, u, axis=1), Qp, Rp)


@pytest.mark.parametrize("k", [0, 13, 31])
def test_qr_delete_row(k):
    from mixedprecisionblockqr_tpu.ops.givens import qr_delete_row

    rng = np.random.default_rng(60 + k)
    a = rng.standard_normal((32, 20)).astype(np.float32)
    Q, R = _complete_qr(a)
    Qp, Rp = qr_delete_row(Q, R, k)
    assert Qp.shape == (31, 31) and Rp.shape == (31, 20)
    _check_factors(np.delete(a, k, axis=0), Qp, Rp)


def test_qr_insert_then_delete_col_roundtrip():
    from mixedprecisionblockqr_tpu.ops.givens import (
        qr_delete_col,
        qr_insert_col,
    )

    rng = np.random.default_rng(80)
    a = rng.standard_normal((24, 12)).astype(np.float32)
    u = rng.standard_normal(24).astype(np.float32)
    Q, R = _complete_qr(a)
    Qi, Ri = qr_insert_col(Q, R, 5, u)
    Qd, Rd = qr_delete_col(Qi, Ri, 5)
    _check_factors(a, Qd, Rd)


def test_qr_update_family_guards():
    from mixedprecisionblockqr_tpu.ops.givens import (
        qr_delete_col,
        qr_delete_row,
        qr_insert_col,
    )

    a = np.random.default_rng(0).standard_normal((8, 8)).astype(np.float32)
    Q, R = _complete_qr(a)
    with pytest.raises(ValueError):
        qr_insert_col(Q, R, 0, np.ones(8, np.float32))  # square: no free row
    with pytest.raises(ValueError):
        qr_delete_col(Q[:, :4], R, 0)  # reduced-mode Q rejected
    with pytest.raises(ValueError):
        qr_delete_row(Q[:1, :1], R[:1, :1], 0)  # m < 2
