"""NaN/Inf guards (utils/checks.py)."""

import numpy as np
import pytest

from mixedprecisionblockqr_tpu.utils.checks import (
    NonFiniteError,
    assert_all_finite,
    checked_qr,
    default_key,
)


def test_assert_all_finite_passes():
    assert_all_finite(np.ones((3, 3)), np.zeros(4))


def test_assert_all_finite_raises_with_name():
    bad = np.ones((2, 2))
    bad[0, 0] = np.nan
    with pytest.raises(NonFiniteError, match="J"):
        assert_all_finite(np.ones(3), bad, names=["x", "J"])


def test_checked_qr_rejects_nan_input():
    A = np.ones((8, 4), np.float32)
    A[3, 1] = np.inf
    with pytest.raises(NonFiniteError, match="A"):
        checked_qr(A, block_size=2)


def test_checked_qr_ok():
    A = np.random.default_rng(0).random((16, 8)).astype(np.float32)
    Q, R = checked_qr(A, block_size=4)
    assert Q.shape == (16, 8)


def test_default_key_deterministic():
    import jax

    a = jax.random.uniform(default_key(7), (3,))
    b = jax.random.uniform(default_key(7), (3,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
