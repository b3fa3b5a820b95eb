"""Pallas kernels vs their XLA/NumPy oracles (interpret mode on CPU) —
the reference's kernel-vs-host-twin pattern (SURVEY §4.1:
``test_dev_smem_mmult*``, ``test_tensorcore_mmult_tiled``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mixedprecisionblockqr_tpu.ops.householder import panel_factor
from mixedprecisionblockqr_tpu.ops.pallas.gemm import (
    matmul_bf16_accum_f32,
    matmul_int8_accum_i32,
    tiled_matmul,
)
from mixedprecisionblockqr_tpu.ops.pallas.panel import panel_factor_fused

# GEMM size table including non-multiples of the tile (the reference's
# tables mix multiples and non-multiples, Cuda/mmult.cu:708-724).
GEMM_SIZES = [(32, 32, 32), (64, 96, 32), (100, 70, 50), (129, 65, 33), (16, 256, 16)]


@pytest.mark.parametrize("m,k,n", GEMM_SIZES)
def test_tiled_matmul_fp32(m, k, n):
    rng = np.random.default_rng(m * k + n)
    a = rng.random((m, k)).astype(np.float32)
    b = rng.random((k, n)).astype(np.float32)
    c = tiled_matmul(jnp.asarray(a), jnp.asarray(b), bm=32, bn=32, bk=32,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(c), a @ b, rtol=1e-5, atol=1e-4)


def test_tiled_matmul_bf16_accum_f32():
    # bf16 x bf16 -> fp32: tolerance class of the reference's fp16 TC test
    # (5e-4 elementwise, Cuda/mmult.cuh:411-416), loosened for bf16's
    # 8-bit mantissa.
    rng = np.random.default_rng(0)
    a = rng.random((64, 64)).astype(np.float32)
    b = rng.random((64, 64)).astype(np.float32)
    c = matmul_bf16_accum_f32(jnp.asarray(a), jnp.asarray(b), bm=32, bn=32,
                              bk=32, interpret=True)
    ref = a @ b
    assert np.max(np.abs(np.asarray(c) - ref) / np.abs(ref).max()) < 4e-3


def test_tiled_matmul_int8_exact():
    rng = np.random.default_rng(1)
    a = rng.integers(-16, 16, (48, 40)).astype(np.int8)
    b = rng.integers(-16, 16, (40, 24)).astype(np.int8)
    c = matmul_int8_accum_i32(jnp.asarray(a), jnp.asarray(b), bm=16, bn=16,
                              bk=16, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(c), a.astype(np.int32) @ b.astype(np.int32)
    )


def test_panel_factor_fused_matches_xla():
    rng = np.random.default_rng(2)
    P = rng.random((256, 32)).astype(np.float32)
    V1, T1, R1 = panel_factor(jnp.asarray(P))
    V2, T2, R2 = panel_factor_fused(jnp.asarray(P), interpret=True)
    np.testing.assert_allclose(np.asarray(V1), np.asarray(V2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-4)


def test_panel_factor_fused_zero_column():
    P = np.zeros((64, 8), np.float32)
    P[:, ::2] = np.random.default_rng(3).random((64, 4))
    V, T, R = panel_factor_fused(jnp.asarray(P), interpret=True)
    assert np.isfinite(np.asarray(V)).all()
    Vn, Tn = np.asarray(V, np.float64), np.asarray(T, np.float64)
    Qp = np.eye(64) - Vn @ Tn @ Vn.T
    np.testing.assert_allclose(Qp.T @ P, np.asarray(R), atol=1e-5)


def test_tiled_matmul_uint8_exact():
    # The reference's unsigned wmma combo (u8 x u8 -> i32,
    # Cuda/mmult.cuh:287-299): lifted to the MXU's s8 path with rank-1
    # corrections — must stay EXACT integer arithmetic.
    from mixedprecisionblockqr_tpu.ops.pallas.gemm import (
        matmul_uint8_accum_i32,
    )

    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, (48, 40)).astype(np.uint8)
    b = rng.integers(0, 256, (40, 24)).astype(np.uint8)
    c = matmul_uint8_accum_i32(jnp.asarray(a), jnp.asarray(b), bm=16, bn=16,
                               bk=16, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(c), a.astype(np.int32) @ b.astype(np.int32)
    )
