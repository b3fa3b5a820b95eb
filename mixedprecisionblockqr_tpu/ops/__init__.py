"""Core compute ops: Householder/WY primitives, blocked QR drivers, metrics,
dtype policies, and Pallas kernels (in ``ops.pallas``)."""

from mixedprecisionblockqr_tpu.ops import householder, wy, blockqr, metrics, policy

__all__ = ["householder", "wy", "blockqr", "metrics", "policy"]
