"""TSQR / reduction tree vs NumPy oracle.

Completes the reference's prototype tests (``python/ca_qr.py:86-101``):
the prototype asserts exact Q/R match with np.linalg.qr on a fixed 24x3
case; we test residual/orthogonality across shapes, leaf counts, batching,
and the mesh-sharded path on the virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.parallel.mesh import make_mesh, shard_rows
from mixedprecisionblockqr_tpu.parallel.tsqr import (
    reduction_tree,
    tsqr,
    tsqr_batched,
    tsqr_sharded,
)


def _check(A, Q, R, tol=1e-5):
    assert float(metrics.backward_error(jnp.asarray(A), Q, R)) < tol
    assert float(metrics.orthogonality_error(Q)) < tol
    assert float(metrics.lower_trapezoid_error(R)) == 0.0


@pytest.mark.parametrize("m,n,L", [(96, 3, 4), (256, 16, 4), (1024, 32, 8), (999, 8, 4)])
def test_tsqr_shapes(m, n, L):
    A = np.random.default_rng(m).random((m, n)).astype(np.float32)
    Q, R = tsqr(A, n_leaves=L)
    assert Q.shape == (m, n) and R.shape == (n, n)
    _check(A, Q, R)


def test_tsqr_matches_numpy_r():
    A = np.random.default_rng(1).random((512, 12)).astype(np.float32)
    _, R = tsqr(A, n_leaves=4)
    Rn = np.linalg.qr(A)[1]
    np.testing.assert_allclose(
        np.abs(np.asarray(R)), np.abs(Rn), rtol=2e-3, atol=2e-4
    )


def test_reduction_tree_factors():
    rng = np.random.default_rng(2)
    n, L = 8, 8
    Rs = jnp.asarray(
        np.stack([np.triu(rng.random((n, n))) + np.eye(n) for _ in range(L)]),
        jnp.float32,
    )
    F, R = reduction_tree(Rs)
    stack = np.asarray(Rs).reshape(L * n, n)
    Fstack = np.asarray(F).reshape(L * n, n)
    np.testing.assert_allclose(Fstack @ np.asarray(R), stack, atol=1e-4)
    np.testing.assert_allclose(Fstack.T @ Fstack, np.eye(n), atol=1e-4)


def test_tsqr_batched():
    A = np.random.default_rng(3).random((4, 256, 8)).astype(np.float32)
    Qs, Rs = tsqr_batched(jnp.asarray(A), n_leaves=4)
    assert Qs.shape == (4, 256, 8)
    for i in range(4):
        _check(A[i], Qs[i], Rs[i])


def test_tsqr_sharded_8dev():
    mesh = make_mesh()
    A = np.random.default_rng(4).random((1024, 16)).astype(np.float32)
    Ash = shard_rows(jnp.asarray(A), mesh)
    Q, R = tsqr_sharded(Ash, mesh)
    # Q keeps the input's row sharding; R is replicated.
    assert "rows" in str(Q.sharding.spec)
    _check(A, Q, R)


def test_tsqr_sharded_local_leaves():
    mesh = make_mesh()
    A = np.random.default_rng(5).random((2048, 8)).astype(np.float32)
    Ash = shard_rows(jnp.asarray(A), mesh)
    Q, R = tsqr_sharded(Ash, mesh, local_leaves=4)
    _check(A, Q, R)


def test_tsqr_cholqr2_leaves():
    A = np.random.default_rng(6).random((2048, 24)).astype(np.float32)
    Q, R = tsqr(A, n_leaves=8, method="cholqr2")
    _check(A, Q, R)


def test_reduction_tree_cholqr2():
    rng = np.random.default_rng(7)
    n, L = 8, 4
    Rs = jnp.asarray(
        np.stack([np.triu(rng.random((n, n))) + np.eye(n) for _ in range(L)]),
        jnp.float32,
    )
    F, R = reduction_tree(Rs, method="cholqr2")
    stack = np.asarray(Rs).reshape(L * n, n)
    Fstack = np.asarray(F).reshape(L * n, n)
    np.testing.assert_allclose(Fstack @ np.asarray(R), stack, atol=1e-4)


def test_tsqr_cholqr2s_ill_conditioned():
    """Robust tall-skinny path (round-2 VERDICT item 6): at cond(A) >= 1e5
    plain cholqr2's Gram squares past the fp32 chol domain, while the
    SHIFTED variant (cholqr2s) must still deliver a usable factorization;
    the Householder leaves remain the exact oracle."""
    from mixedprecisionblockqr_tpu.utils.datagen import conditioned_matrix

    n = 48
    base = conditioned_matrix(n, 1e5, seed=3).astype(np.float32)
    # tall-skinny with exact cond 1e5: stack scaled copies of the square
    rng = np.random.default_rng(4)
    lift, _ = np.linalg.qr(rng.standard_normal((4096, n)))
    A = (lift @ base).astype(np.float32)
    assert np.linalg.cond(A.astype(np.float64)) > 9e4

    Qs, Rs = tsqr(A, method="cholqr2s")
    Qn = np.asarray(Qs, np.float64)
    back = np.linalg.norm(A - Qn @ np.asarray(Rs, np.float64)) / np.linalg.norm(A)
    orth = np.abs(Qn.T @ Qn - np.eye(n)).max()
    assert back < 1e-5, back
    assert orth < 1e-3, orth

    # tree variant (the distributed robustness path)
    Qt, Rt = tsqr(A, n_leaves=8, method="cholqr2s")
    Qtn = np.asarray(Qt, np.float64)
    assert np.linalg.norm(A - Qtn @ np.asarray(Rt, np.float64)) / np.linalg.norm(A) < 1e-5
    assert np.abs(Qtn.T @ Qtn - np.eye(n)).max() < 1e-3


def test_tsqr_leaf_method_validation():
    A = np.random.default_rng(5).random((256, 16)).astype(np.float32)
    with pytest.raises(ValueError):
        tsqr(A, method="nonsense")
    with pytest.raises(ValueError):
        tsqr(A, n_leaves=3)


def test_tsqr_short_leaf_validation():
    """Leaves shorter than n are rank-deficient and the reduction tree
    propagates the defect SILENTLY — cholqr leaves returned all-NaN
    factors with no canary and householder leaves crashed with an opaque
    broadcast error (review finding, verified at exactly this config).
    All entry points must reject it loudly."""
    from mixedprecisionblockqr_tpu.parallel.tsqr import tsqr_batched

    A = np.random.default_rng(6).random((256, 64)).astype(np.float32)
    for method in ("cholqr2", "householder"):
        with pytest.raises(ValueError, match="leaf height"):
            tsqr(A, n_leaves=8, method=method)  # ceil(256/8)=32 < 64
    with pytest.raises(ValueError, match="leaf height"):
        tsqr_batched(A[None], n_leaves=8)


def test_tsqr_sharded_short_leaf_validation():
    mesh = make_mesh()
    A = np.random.default_rng(7).random((256, 64)).astype(np.float32)
    with pytest.raises(ValueError, match="leaf height"):
        tsqr_sharded(jnp.asarray(A), mesh)  # 256/8 = 32 < 64
