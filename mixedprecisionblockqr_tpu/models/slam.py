"""SLAM / bundle-adjustment least-squares workflow.

The reference's intended workload: QR-solve normal equations arising from
Euroc-MAV visual-inertial SLAM Jacobians up to ~2000x2000 (``README.md:11-12``),
driven by a dataset sweep (``get_jacobians_test_matrixs``,
``Cuda/qr.cu:1721-1759``).  This module provides the end-to-end drive:
enumerate Jacobians (real files via ``utils.euroc`` or synthetic stand-ins),
factor, solve a Gauss-Newton step, and report the reference's metric triple.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mixedprecisionblockqr_tpu.models.lstsq import lstsq
from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import block_qr
from mixedprecisionblockqr_tpu.ops.policy import DTypePolicy, POLICY_MIXED
from mixedprecisionblockqr_tpu.utils import euroc
from mixedprecisionblockqr_tpu.utils.datagen import slam_jacobian


@dataclasses.dataclass
class JacobianCase:
    name: str
    m: int
    n: int
    path: Optional[str] = None
    seed: int = 0

    def load(self) -> np.ndarray:
        if self.path is not None:
            m, n, a = euroc.read_euroc_jacobian(self.path)
            return a
        return slam_jacobian(self.m, self.n, seed=self.seed)


def enumerate_jacobians(
    data_dir: Optional[str] = None,
    max_matrices: int = 30,
    synthetic_sizes: Optional[List[Tuple[int, int]]] = None,
) -> List[JacobianCase]:
    """Mirror of the reference's dataset enumeration
    (``get_jacobians_test_matrixs``, ``Cuda/qr.cu:1721-1759``): files
    ``A_%09d.txt`` for i in 100..22500 step 100, sorted by row count, every
    2nd taken, capped at 30.  Falls back to synthetic Jacobians when the
    dataset directory is absent (the reference ships it as a git-LFS archive
    that is not materialized here)."""
    if data_dir and os.path.isdir(data_dir):
        cases = []
        for i in range(100, 22501, 100):
            path = os.path.join(data_dir, f"A_{i:09d}.txt")
            if os.path.exists(path):
                m, n = euroc.read_dims(path)
                cases.append(JacobianCase(os.path.basename(path), m, n, path))
        cases.sort(key=lambda c: c.m)
        return cases[::2][:max_matrices]
    sizes = synthetic_sizes or [
        (256, 128), (384, 192), (512, 256), (768, 384), (1024, 512),
        (1536, 768), (2000, 1000), (2048, 2048),
    ]
    return [
        JacobianCase(f"synthetic_{m}x{n}", m, n, seed=i)
        for i, (m, n) in enumerate(sizes)
    ]


def gauss_newton_step(
    J: jax.Array,
    residual: jax.Array,
    policy: DTypePolicy = POLICY_MIXED,
    damping: float = 0.0,
) -> jax.Array:
    """One Gauss-Newton/Levenberg pose update: solve J dx = -residual.

    With damping > 0 solves the stacked Tikhonov system
    [J; sqrt(damping) I] dx = [-r; 0] — still one tall QR solve.
    """
    J = jnp.asarray(J, jnp.float32)
    residual = jnp.asarray(residual, jnp.float32)
    m, n = J.shape
    if damping > 0.0:
        lam = jnp.sqrt(jnp.asarray(damping, jnp.float32))
        J = jnp.concatenate([J, lam * jnp.eye(n, dtype=jnp.float32)], axis=0)
        residual = jnp.concatenate([residual, jnp.zeros((n,), jnp.float32)])
    return lstsq(J, -residual, policy=policy)


def factor_and_report(
    A: np.ndarray, policy: DTypePolicy, block_size: int = 128
) -> metrics.QRReport:
    """Factor one Jacobian and produce the reference's metric triple."""
    Q, R = block_qr(jnp.asarray(A), block_size=block_size, policy=policy)
    return metrics.evaluate(A, Q, R, precision_bits=policy.precision_bits)
