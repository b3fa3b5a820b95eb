"""Test/benchmark matrix generation.

Mirrors the reference's generators:
  * uniform random matrices (``h_generate_random_matrix``,
    ``Cuda/mmult.cuh:38-68``),
  * Bierlaire-style matrices with an exact target condition number
    (``generate_matrix``, ``python/utils.py:13-24``),
  * the edge-case fixtures (``python/test_data.py:4-57``),
  * synthetic SLAM-Jacobian-like sparse tall matrices standing in for the
    Euroc-MAV dataset (whose 103 MB git-LFS archive is not materialized in
    the reference checkout; see ``utils/euroc.py`` for the file format).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def random_matrix(key, m: int, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniform [0, 1) random matrix — the reference's default test input
    (``h_generate_random_matrix``, ``Cuda/mmult.cuh:38-68``)."""
    return jax.random.uniform(key, (m, n), dtype=jnp.float32).astype(dtype)


def conditioned_matrix(
    n: int, condition_number: float = 100.0, seed: int = 0
) -> np.ndarray:
    """Random SPD matrix with cond(P) == condition_number exactly
    (Bierlaire, Toint & Tuyttens 1991), behavioral port of
    ``python/utils.py:13-24``: the diagonal spectrum spans
    sqrt(condition_number) and the final ``P = P P^T`` squares it back to
    the requested target (verified in tests).
    """
    rng = np.random.default_rng(seed)
    cond_p = float(condition_number)
    log_cond = np.log(cond_p)
    exp_vec = np.arange(
        -log_cond / 4.0,
        log_cond * (n + 1) / (4.0 * (n - 1)),
        log_cond / (2.0 * (n - 1)),
    )[:n]
    s = np.exp(exp_vec)
    u, _ = np.linalg.qr((rng.random((n, n)) - 5.0) * 200.0)
    v, _ = np.linalg.qr((rng.random((n, n)) - 5.0) * 200.0)
    p = u @ np.diag(s) @ v.T
    return (p @ p.T).astype(np.float64)


def general_fixtures() -> List[np.ndarray]:
    """The reference's general test matrices (``python/test_data.py:4-36``)."""
    rng = np.random.default_rng(0)
    fixed = [
        np.array([[1, 2, 3], [4, 5, 6], [7, 8, 7], [4, 2, 3], [4, 2, 2]], float),
        np.array([[0, 3, 1], [0, 4, -2], [2, 1, 1]], float),
        np.array([[12, -51, 4], [6, 167, -68], [-4, 24, -41]], float),
        np.array(
            [
                [10, 20, 30, 40, 50, 60],
                [32, 32, 44, 55, 66, 35],
                [23, 66, 74, 64, 45, 65],
                [67, 28, 46, 26, 46, 42],
                [95, 95, 52, 88, 65, 11],
                [75, 53, 96, 47, 32, 32],
            ],
            float,
        ),
        rng.random((10, 10)),
        rng.random((100, 100)),
        rng.random((200, 100)),
        rng.random((300, 100)),
        conditioned_matrix(100, 100.0),
    ]
    return fixed


def strange_fixtures() -> List[np.ndarray]:
    """Edge cases: rank-deficient, diagonal, zero-rows
    (``python/test_data.py:38-57``)."""
    return [
        np.array([[1, 2, 3], [1, 2, 3], [1, 2, 3]], float),
        np.array([[1, 0, 0], [0, 2, 0], [0, 0, 3]], float),
        np.array([[1, 2, 3], [0, 0, 0], [0, 0, 0]], float),
    ]


# The reference's static QR problem-size table: (m, n, block_size)
# (``test_qr_by_random_matrix``, ``Cuda/qr.cu:1762-1787``).
STATIC_QR_SIZES: List[Tuple[int, int, int]] = [
    (6, 4, 2),
    (6, 4, 1),
    (6, 4, 3),
    (12, 8, 4),
    (12, 8, 5),
    (12, 8, 6),
    (12, 8, 2),
    (12, 8, 8),
    (12, 8, 3),
    (24, 16, 8),
    (24, 16, 12),
    (60, 40, 8),
    (60, 40, 16),
    (80, 80, 16),
    (97, 90, 16),
    (100, 80, 16),
    (128, 80, 16),
    (129, 80, 16),
    (240, 160, 16),
    (600, 400, 16),
]


def slam_jacobian(
    m: int, n: int, seed: int = 0, density: float = 0.05
) -> np.ndarray:
    """Synthetic bundle-adjustment-style Jacobian: block-sparse tall matrix
    with a dense column strip (camera poses) and scattered landmark blocks —
    the workload class the reference targets (``README.md:11-12``)."""
    rng = np.random.default_rng(seed)
    a = np.zeros((m, n), np.float32)
    pose_cols = max(1, n // 8)
    a[:, :pose_cols] = rng.standard_normal((m, pose_cols)).astype(np.float32)
    nnz_per_row = max(1, int(density * (n - pose_cols)))
    for i in range(m):
        cols = rng.choice(n - pose_cols, size=nnz_per_row, replace=False) + pose_cols
        a[i, cols] = rng.standard_normal(nnz_per_row).astype(np.float32)
    return a


def size_sweep(start: int = 64, stop: int = 2048, factor: int = 2) -> Iterator[int]:
    """Geometric size sweep (the reference sweeps sizes in its test iterators,
    ``Cuda/qr.cu:1910-1959``)."""
    s = start
    while s <= stop:
        yield s
        s *= factor
