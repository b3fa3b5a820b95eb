"""CAQR / tiled QR: residual + orthogonality + apply_q/apply_qt operators.

The reference's tiled prototype abandons Q ("need fix Q",
``python/ca_qr.py:73-75``); these tests pin the completed behavior.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.parallel.caqr import (
    apply_q,
    apply_qt,
    caqr,
    caqr_factor,
)


@pytest.mark.parametrize("m,n,r,L", [(96, 24, 8, 2), (192, 48, 16, 4), (144, 36, 12, 2)])
def test_caqr_residual(m, n, r, L):
    A = np.random.default_rng(m + n).random((m, n)).astype(np.float32)
    Q, R = caqr(A, block_size=r, row_blocks=L)
    assert Q.shape == (m, n) and R.shape == (n, n)
    assert float(metrics.backward_error(jnp.asarray(A), Q, R)) < 1e-5
    assert float(metrics.orthogonality_error(Q)) < 1e-4
    assert float(metrics.lower_trapezoid_error(R)) == 0.0


def test_caqr_matches_reference_24x6_shape():
    # The prototype's own config: 24x6, 3-wide panels, 4 row blocks
    # (python/ca_qr.py:96-101) — with Q now actually reconstructed.
    A = np.random.default_rng(0).random((24, 6)).astype(np.float32)
    Q, R = caqr(A, block_size=3, row_blocks=4)
    Rn = np.linalg.qr(A)[1]
    np.testing.assert_allclose(np.abs(np.asarray(R)), np.abs(Rn), atol=1e-4)
    assert float(metrics.backward_error(jnp.asarray(A), Q, R)) < 1e-5


def test_apply_q_qt_roundtrip():
    m, n = 128, 32
    A = np.random.default_rng(1).random((m, n)).astype(np.float32)
    factors, R = caqr_factor(A, block_size=16, row_blocks=2)
    X = np.random.default_rng(2).random((m, 5)).astype(np.float32)
    Y = apply_qt(factors, jnp.asarray(X))
    X2 = apply_q(factors, Y)
    np.testing.assert_allclose(np.asarray(X2), X, atol=1e-4)
    # Q^T A == [R; 0]
    QtA = np.asarray(apply_qt(factors, jnp.asarray(A)))
    np.testing.assert_allclose(QtA[:n], np.asarray(R), atol=1e-4)
    np.testing.assert_allclose(QtA[n:], 0.0, atol=1e-3)


def test_caqr_row_block_clamp():
    """An explicit row_blocks is a per-panel UPPER bound, clamped so every
    leaf stays at least r tall (review finding: the unclamped request was
    applied to the SHRINKING trailing panels too, so row_blocks > 1
    raised on the last panel of every m ~= n input even though auto mode
    handled the same matrix)."""
    rng = np.random.default_rng(3)
    # Over-requested L on a short matrix: clamped, not rejected.
    A = rng.random((64, 32)).astype(np.float32)
    Q, R = caqr(A, block_size=32, row_blocks=8)
    err = np.linalg.norm(A - np.asarray(Q) @ np.asarray(R))
    assert err / np.linalg.norm(A) < 1e-5
    # SQUARE matrix with row_blocks > 1: the trailing 16x16 panel forced
    # L -> 1 (pre-fix: ValueError on every square input).
    B = rng.random((64, 64)).astype(np.float32)
    Qb, Rb = caqr(B, block_size=16, row_blocks=2)
    err = np.linalg.norm(B - np.asarray(Qb) @ np.asarray(Rb))
    assert err / np.linalg.norm(B) < 1e-5


def test_caqr_flagship_scale_compiles_fast():
    """Round-2 VERDICT item 4 'done' bar: 2048x1024 CAQR traces/compiles in
    seconds (the round-1 per-pair Python loops were compile-bound here) and
    iterative-refinement lstsq at n>=1024 works through it."""
    import time

    import jax

    from mixedprecisionblockqr_tpu.models.lstsq import lstsq
    from mixedprecisionblockqr_tpu.parallel.caqr import apply_qt, caqr_factor

    rng = np.random.default_rng(42)
    A = rng.standard_normal((2048, 1024)).astype(np.float32)
    t0 = time.time()
    factors, R = caqr_factor(A, block_size=128)
    jax.block_until_ready(R)
    elapsed = time.time() - t0
    assert elapsed < 120, f"caqr_factor trace+compile+run took {elapsed:.0f}s"
    Rn = np.asarray(R, np.float64)
    dref = np.abs(np.diag(np.linalg.qr(A.astype(np.float64), mode="r")))
    np.testing.assert_allclose(np.abs(np.diag(Rn)), dref, rtol=1e-3)
    # refinement solve at scale (routes through caqr_factor/apply_qt)
    xt = rng.standard_normal(1024).astype(np.float32)
    b = A @ xt
    x = np.asarray(lstsq(A, b, block_size=128, refine_steps=1))
    np.testing.assert_allclose(x, xt, atol=2e-3)
