"""Numerical health guards.

The reference has no failure detection beyond abort-on-CUDA-error
(``checkCudaErrors``) and its fp16 study silently produces NaN results
(``performance_test_result/error.md:15-16``).  These guards make
non-finite results loud, and centralize deterministic seeding.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np


class NonFiniteError(FloatingPointError):
    pass


def assert_all_finite(*arrays, names: Iterable[str] | None = None) -> None:
    """Raise :class:`NonFiniteError` naming the first non-finite array."""
    names = list(names or [f"array{i}" for i in range(len(arrays))])
    for name, a in zip(names, arrays):
        a = jnp.asarray(a)
        if not bool(jnp.all(jnp.isfinite(a.astype(jnp.float32)))):
            raise NonFiniteError(
                f"{name} contains NaN/Inf (shape {a.shape}, dtype {a.dtype}) — "
                "for ill-conditioned inputs use POLICY_FP32 or "
                "panel_method='cholqr2s'"
            )


def checked_qr(A, **kwargs):
    """``block_qr`` with input/output finiteness guards."""
    from mixedprecisionblockqr_tpu.ops.blockqr import block_qr

    assert_all_finite(A, names=["A"])
    out = block_qr(A, **kwargs)
    if isinstance(out, tuple):
        assert_all_finite(*out, names=["Q", "R"])
    else:
        assert_all_finite(out, names=["R"])
    return out


def default_key(seed: int = 0) -> jax.Array:
    """Central deterministic seed source for reproducible runs."""
    return jax.random.PRNGKey(seed)
