"""Differentiable QR (ops/autodiff.py) — gradient oracle tests.

Two oracles, mirroring the reference's CPU-twin pattern (SURVEY.md section 4):
  1. ``jnp.linalg.qr``'s autodiff on SIGN-CANONICALIZED factors: with both
     implementations normalized to diag(R) > 0 they compute the same
     function, so their gradients must agree to fp32 roundoff.
  2. Central finite differences on the raw (un-canonicalized) map — the
     sign convention is locally constant for generic A, so FD applies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixedprecisionblockqr_tpu.ops.autodiff import copyltu, qr_autodiff
from mixedprecisionblockqr_tpu.ops.policy import POLICY_FP32


def _canon(qr_fn):
    """Sign-canonicalize a QR implementation to diag(R) > 0.  sign() has
    zero gradient a.e., so the flip acts as a locally-constant matrix and
    gradients of the canonicalized map are well-defined."""

    def f(A):
        Q, R = qr_fn(A)
        d = jnp.sign(jnp.diag(R))
        d = jnp.where(d == 0, 1.0, d)
        return Q * d[None, :], R * d[:, None]

    return f


def _weighted_loss(qr_fn, wq, wr):
    def loss(A):
        Q, R = qr_fn(A)
        return jnp.sum(wq * Q) + jnp.sum(wr * R)

    return loss


@pytest.mark.parametrize("shape", [(48, 48), (96, 64)])
def test_grad_matches_lapack_oracle(shape):
    m, n = shape
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    wq = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    wr = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))

    ours = _canon(lambda X: qr_autodiff(X, block_size=16, policy=POLICY_FP32))
    ref = _canon(lambda X: jnp.linalg.qr(X, mode="reduced"))

    g_ours = jax.grad(_weighted_loss(ours, wq, wr))(A)
    g_ref = jax.grad(_weighted_loss(ref, wq, wr))(A)
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), rtol=2e-4, atol=2e-4
    )


def test_grad_matches_finite_differences():
    rng = np.random.default_rng(5)
    A0 = rng.standard_normal((24, 16)).astype(np.float64)
    wq = rng.standard_normal((24, 16))
    wr = rng.standard_normal((16, 16))

    loss = _weighted_loss(
        lambda X: qr_autodiff(X, block_size=8, policy=POLICY_FP32),
        jnp.asarray(wq), jnp.asarray(wr),
    )
    g = np.asarray(jax.grad(loss)(jnp.asarray(A0)))

    # The primal computes in fp32 (policy.panel), so the loss carries
    # ~1e-6-relative evaluation noise; eps must be large enough that the
    # difference signal dominates it (noise/2eps ~ 5e-3 at eps=1e-3)
    # while truncation O(eps^2) stays below tolerance.
    eps = 1e-3
    idx = [(0, 0), (3, 7), (11, 2), (23, 15), (17, 9)]
    for i, j in idx:
        Ap, Am = A0.copy(), A0.copy()
        Ap[i, j] += eps
        Am[i, j] -= eps
        fd = (float(loss(jnp.asarray(Ap))) - float(loss(jnp.asarray(Am)))) / (
            2 * eps
        )
        assert abs(fd - g[i, j]) < 3e-2 * max(1.0, abs(fd)), (
            f"grad[{i},{j}]={g[i, j]:.6f} vs FD {fd:.6f}"
        )


def test_lstsq_composition_grad():
    """Differentiable least squares: grad flows through QR + triangular
    solve, matching the same composition built on jnp.linalg.qr."""
    rng = np.random.default_rng(7)
    A = jnp.asarray(rng.standard_normal((40, 24)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((40,)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((24,)).astype(np.float32))

    def make_loss(qr_fn):
        def loss(A, b):
            Q, R = qr_fn(A)
            x = jax.scipy.linalg.solve_triangular(R, Q.T @ b, lower=False)
            return jnp.sum((x - t) ** 2)

        return loss

    ours = make_loss(lambda X: qr_autodiff(X, block_size=8))
    ref = make_loss(lambda X: jnp.linalg.qr(X, mode="reduced"))
    gA_o, gb_o = jax.grad(ours, argnums=(0, 1))(A, b)
    gA_r, gb_r = jax.grad(ref, argnums=(0, 1))(A, b)
    # The solve's x is convention-invariant (Q d)(d R)^{-1}... cancels, so
    # no canonicalization is needed here.
    np.testing.assert_allclose(np.asarray(gA_o), np.asarray(gA_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gb_o), np.asarray(gb_r),
                               rtol=2e-4, atol=2e-4)


def test_copyltu():
    M = jnp.asarray(np.arange(9.0).reshape(3, 3).astype(np.float32))
    C = np.asarray(copyltu(M))
    expect = np.tril(np.asarray(M), -1)
    expect = expect + expect.T + np.diag(np.diag(np.asarray(M)))
    np.testing.assert_array_equal(C, expect)
    assert np.allclose(C, C.T)


def test_grad_under_jit_and_mixed_policy():
    """The VJP composes with jit; a bf16-trailing policy's primal still
    yields finite, usable fp32 gradients (backward runs at HIGHEST)."""
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED

    rng = np.random.default_rng(11)
    A = jnp.asarray(rng.standard_normal((32, 32)).astype(np.float32))

    @jax.jit
    def loss(A):
        Q, R = qr_autodiff(A, block_size=16, policy=POLICY_MIXED)
        return jnp.sum(R * R)

    g = jax.grad(loss)(A)
    assert np.all(np.isfinite(np.asarray(g)))
    # sum(R^2) = ||A||_F^2 exactly (orthogonal invariance), so gA = 2A —
    # an analytic oracle that holds for ANY sign convention.
    np.testing.assert_allclose(
        np.asarray(g), 2 * np.asarray(A), rtol=5e-2, atol=5e-2
    )


def test_lstsq_autodiff_end_to_end():
    """mpq.lstsq_autodiff: gradients in (A, b) match the jnp.linalg.qr
    composition, and the solution matches the forward-only lstsq."""
    import mixedprecisionblockqr_tpu as mpq

    rng = np.random.default_rng(13)
    A = jnp.asarray(rng.standard_normal((48, 32)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((48,)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((32,)).astype(np.float32))

    x = mpq.lstsq_autodiff(A, b, block_size=16)
    x_ref = np.linalg.lstsq(np.asarray(A, np.float64),
                            np.asarray(b, np.float64), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-3, atol=1e-3)

    def loss(A, b):
        return jnp.sum((mpq.lstsq_autodiff(A, b, block_size=16) - t) ** 2)

    def loss_ref(A, b):
        Q, R = jnp.linalg.qr(A, mode="reduced")
        x = jax.scipy.linalg.solve_triangular(R, Q.T @ b, lower=False)
        return jnp.sum((x - t) ** 2)

    gA, gb = jax.grad(loss, argnums=(0, 1))(A, b)
    gA_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(A, b)
    np.testing.assert_allclose(np.asarray(gA), np.asarray(gA_r),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r),
                               rtol=2e-3, atol=2e-3)
