"""Utilities: data generation, Euroc Jacobian IO, metric logging, FLOPs model,
timing harness, and configuration."""

from mixedprecisionblockqr_tpu.utils import datagen, flops, logging, timing

__all__ = ["datagen", "flops", "logging", "timing"]
