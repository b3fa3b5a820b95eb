"""Pallas TPU kernels — the hand-controlled analog of the reference's CUDA
kernel layer (L1, ``Cuda/mmult.cu``/``mmult.cuh``; WY kernels in
``Cuda/qr.cu:428-600``).

Kernels run compiled on TPU and in interpreter mode on CPU (tests).
"""

from mixedprecisionblockqr_tpu.ops.pallas.chol import chol_rinv
from mixedprecisionblockqr_tpu.ops.pallas.gemm import tiled_matmul
from mixedprecisionblockqr_tpu.ops.pallas.panel import panel_factor_fused

__all__ = ["chol_rinv", "tiled_matmul", "panel_factor_fused"]
