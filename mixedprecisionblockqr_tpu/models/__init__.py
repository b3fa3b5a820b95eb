"""Workload models: QR-based least-squares solving and the SLAM/bundle-
adjustment Jacobian workflow the reference targets (``README.md:11-12``)."""

from mixedprecisionblockqr_tpu.models import lstsq, resumable, slam

__all__ = ["lstsq", "resumable", "slam"]
