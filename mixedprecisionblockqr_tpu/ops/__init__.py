"""Core compute ops: Householder/WY primitives, blocked QR drivers, metrics,
dtype policies, and Pallas kernels (in ``ops.pallas``)."""

from mixedprecisionblockqr_tpu.ops import (
    blockqr,
    givens,
    householder,
    metrics,
    policy,
    wy,
)

__all__ = ["householder", "wy", "blockqr", "givens", "metrics", "policy"]
