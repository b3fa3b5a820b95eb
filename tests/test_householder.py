"""Unblocked Householder QR vs NumPy oracles.

Replicates the reference's Python suite (``python/test_all.py``): reflector
unit test, general/strange fixtures, residual + orthogonality criteria.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mixedprecisionblockqr_tpu.ops.householder import (
    householder_qr,
    householder_reflector,
    q_backward_accumulation,
    panel_factor,
)
from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.utils.datagen import (
    general_fixtures,
    strange_fixtures,
)


def test_reflector_matches_reference_convention():
    # python/test_all.py:10-21: raw=[0,0,2] reflects to [-2,0,0].
    x = jnp.array([0.0, 0.0, 2.0])
    w, beta, rkk = householder_reflector(x, 0)
    np.testing.assert_allclose(
        np.asarray(w), np.array([1.0, 0.0, 1.0]) / np.sqrt(2.0), atol=1e-6
    )
    H = np.eye(3) - float(beta) * np.outer(w, w)
    np.testing.assert_allclose(H @ np.asarray(x), [-2, 0, 0], atol=1e-6)
    assert float(rkk) == pytest.approx(-2.0)


def test_reflector_masked_offset():
    x = jnp.array([5.0, 3.0, 4.0, 0.0])
    w, beta, rkk = householder_reflector(x, 1)
    assert float(w[0]) == 0.0
    H = np.eye(4) - float(beta) * np.outer(w, w)
    y = H @ np.asarray(x)
    # Row 0 untouched; rows 2+ annihilated; |y[1]| = norm of x[1:].
    assert y[0] == pytest.approx(5.0)
    np.testing.assert_allclose(y[2:], 0.0, atol=1e-6)
    assert abs(y[1]) == pytest.approx(5.0, rel=1e-6)
    assert float(rkk) == pytest.approx(-5.0, rel=1e-6)


def test_reflector_zero_column_skip():
    x = jnp.zeros((4,))
    w, beta, _ = householder_reflector(x, 1)
    assert float(beta) == 0.0
    assert float(jnp.sum(jnp.abs(w))) == 0.0


@pytest.mark.parametrize("mode", ["reduced", "complete"])
def test_qr_general_fixtures(mode):
    for A in general_fixtures():
        Q, R = householder_qr(A, mode=mode)
        err = metrics.backward_error(jnp.asarray(A, jnp.float32), Q, R)
        assert float(err) < 1e-5, f"shape {A.shape}: backward error {err}"
        oerr = metrics.orthogonality_error(Q)
        assert float(oerr) < 1e-4, f"shape {A.shape}: orthogonality {oerr}"
        # R upper-triangular
        assert float(metrics.lower_trapezoid_error(R)) == 0.0


def test_qr_strange_fixtures():
    # rank-deficient / diagonal / zero-rows (python/test_data.py:38-57)
    for A in strange_fixtures():
        Q, R = householder_qr(A)
        err = metrics.backward_error(jnp.asarray(A, jnp.float32), Q, R)
        assert float(err) < 1e-6


def test_qr_matches_numpy_strict():
    # Sign conventions can differ column-wise; compare up to column signs,
    # the concession python/test_all.py:25-37 makes via strict_check=False.
    rng = np.random.default_rng(1)
    A = rng.random((50, 30)).astype(np.float32)
    Q, R = householder_qr(A)
    Qn, Rn = np.linalg.qr(A)
    signs = np.sign(np.diag(Rn)) * np.sign(np.diag(np.asarray(R)))
    np.testing.assert_allclose(np.asarray(R) * signs[:, None], Rn, atol=5e-4)
    np.testing.assert_allclose(np.asarray(Q) * signs[None, :], Qn, atol=5e-4)


def test_q_backward_accumulation_orthogonal():
    rng = np.random.default_rng(2)
    A = rng.random((40, 24)).astype(np.float32)
    V, beta = householder_qr(A, mode="raw")
    Q = q_backward_accumulation(V, beta)
    np.testing.assert_allclose(
        np.asarray(Q) @ np.asarray(Q).T, np.eye(40), atol=1e-5
    )


def test_panel_factor_reconstructs_qr():
    rng = np.random.default_rng(3)
    P = rng.random((64, 16)).astype(np.float32)
    V, T, Rp = panel_factor(jnp.asarray(P))
    Vn, Tn = np.asarray(V), np.asarray(T)
    Qp = np.eye(64) - Vn @ Tn @ Vn.T
    # Q_panel^T P == Rp and Rp upper-triangular in top 16 rows.
    np.testing.assert_allclose(Qp.T @ P, np.asarray(Rp), atol=1e-4)
    np.testing.assert_allclose(np.tril(np.asarray(Rp)[:16], -1), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Rp)[16:], 0.0, atol=1e-4)
    # orthogonality of the block reflector
    np.testing.assert_allclose(Qp.T @ Qp, np.eye(64), atol=1e-5)


def test_qr_fp64():
    rng = np.random.default_rng(4)
    A = rng.random((30, 20))
    Q, R = householder_qr(A, dtype=jnp.float64)
    assert Q.dtype == jnp.float64
    err = float(metrics.backward_error(jnp.asarray(A, jnp.float32), Q, R))
    assert err < 1e-12 or err < 1e-6  # fp32 metric cast dominates
