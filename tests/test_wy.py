"""WY / compact-WY (T) representation vs NumPy oracles.

Mirrors the reference's WY tests (``python/test_all.py:62-83``,
``test_dev_wy_transform`` family ``Cuda/qr.cu:1390-1669``): verify
Q = I - W Y^T equals the accumulated product of reflectors, and that our
T-form matches the reference's W-form via W = V T.
"""

import jax.numpy as jnp
import numpy as np

from mixedprecisionblockqr_tpu.ops.householder import (
    householder_qr,
    panel_factor,
    q_backward_accumulation,
)
from mixedprecisionblockqr_tpu.ops.policy import POLICY_FP32
from mixedprecisionblockqr_tpu.ops.wy import (
    apply_block_reflector_left_t,
    apply_block_reflector_right,
    build_t_matrix,
    reduced_q_from_vt,
    wy_representation,
)


def _numpy_wy_oracle(V, B):
    """Direct NumPy transcription of GVL Alg 5.1.2 (the reference's
    ``python/wy.py:3-27`` computes the same quantity)."""
    m = V.shape[0]
    Y = V[:, :1]
    W = B[0] * V[:, :1]
    for i in range(1, V.shape[1]):
        v = V[:, i : i + 1]
        z = B[i] * (np.eye(m) - W @ Y.T) @ v
        W = np.hstack([W, z])
        Y = np.hstack([Y, v])
    return W, Y


def test_wy_matches_gvl_oracle():
    rng = np.random.default_rng(0)
    A = rng.random((24, 8)).astype(np.float32)
    V, beta = householder_qr(A, mode="raw")
    Vn, bn = np.asarray(V, np.float64), np.asarray(beta, np.float64)
    W_o, Y_o = _numpy_wy_oracle(Vn, bn)
    W, Y = wy_representation(V, beta)
    np.testing.assert_allclose(np.asarray(W), W_o, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Y), Y_o, atol=1e-6)


def test_t_matrix_reproduces_reflector_product():
    rng = np.random.default_rng(1)
    A = rng.random((32, 12)).astype(np.float32)
    V, beta = householder_qr(A, mode="raw")
    T = build_t_matrix(V, beta)
    Vn, Tn = np.asarray(V, np.float64), np.asarray(T, np.float64)
    Q_vt = np.eye(32) - Vn @ Tn @ Vn.T
    Q_acc = np.asarray(q_backward_accumulation(V, beta), np.float64)
    np.testing.assert_allclose(Q_vt, Q_acc, atol=1e-5)
    # T upper-triangular
    np.testing.assert_allclose(np.tril(Tn, -1), 0.0, atol=0)


def test_apply_left_matches_explicit():
    rng = np.random.default_rng(2)
    P = rng.random((48, 8)).astype(np.float32)
    C = rng.random((48, 20)).astype(np.float32)
    V, T, _ = panel_factor(jnp.asarray(P))
    Vn, Tn = np.asarray(V, np.float64), np.asarray(T, np.float64)
    Qp = np.eye(48) - Vn @ Tn @ Vn.T
    got = np.asarray(apply_block_reflector_left_t(jnp.asarray(C), V, T, POLICY_FP32))
    np.testing.assert_allclose(got, Qp.T @ C, atol=1e-4)


def test_apply_right_matches_explicit():
    rng = np.random.default_rng(3)
    P = rng.random((48, 8)).astype(np.float32)
    Q = rng.random((16, 48)).astype(np.float32)
    V, T, _ = panel_factor(jnp.asarray(P))
    Vn, Tn = np.asarray(V, np.float64), np.asarray(T, np.float64)
    Qp = np.eye(48) - Vn @ Tn @ Vn.T
    got = np.asarray(apply_block_reflector_right(jnp.asarray(Q), V, T, POLICY_FP32))
    np.testing.assert_allclose(got, Q @ Qp, atol=1e-4)


def test_reduced_q_from_vt():
    rng = np.random.default_rng(4)
    P = rng.random((40, 10)).astype(np.float32)
    V, T, Rf = panel_factor(jnp.asarray(P))
    Qr = np.asarray(reduced_q_from_vt(V, T, 10), np.float64)
    np.testing.assert_allclose(Qr @ np.asarray(Rf)[:10], P, atol=1e-4)
    np.testing.assert_allclose(Qr.T @ Qr, np.eye(10), atol=1e-5)
