"""Tiled mixed-dtype GEMM as a Pallas TPU kernel.

Functional parity with the reference's device GEMM family
(``shared_mem_mmult`` ``Cuda/mmult.cu:102-144``, the templated TensorCore
GEMM ``dev_tensorcore_mmult_tiled<T_A,T_B,T_C>`` ``Cuda/mmult.cuh:252-300``,
and its pad-to-tile launcher ``Cuda/mmult.cuh:314-385``), designed for the
MXU instead of translated:

  * grid over (M/bm, N/bn) output tiles; the K reduction is the innermost
    grid dimension so each output tile accumulates across K steps in a VMEM
    scratch accumulator (fp32/int32) — the wmma-fragment accumulation
    pattern, expressed as a reduction grid,
  * dtype combos mirror the reference's template instantiations:
    bf16xbf16->fp32 (for fp16xfp16->fp32), bf16->bf16, fp32->fp32,
    int8xint8->int32,
  * inputs are padded to tile multiples by the wrapper (the reference pads
    to 16-multiples on device, ``Cuda/qr.cu:1115-1133``); XLA slices the
    result back.

In production code XLA's own dot_general is normally at least as good —
this kernel exists for the L1 capability (hand-scheduled GEMM + the pad /
cast boundary) and as the template for fused variants.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _accum_dtype(out_dtype) -> Any:
    return jnp.int32 if jnp.issubdtype(out_dtype, jnp.integer) else jnp.float32


def _gemm_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k: int, out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # fp32 inputs need HIGHEST or Mosaic lowers the dot to a single bf16 MXU
    # pass (~2^-8 accuracy), silently breaking the fp32 combos (same rule as
    # ops/pallas/chol.py::_dot; bf16/int8 combos keep DEFAULT).
    precision = (
        jax.lax.Precision.HIGHEST
        if a_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=acc_ref.dtype,
        precision=precision,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _pad_to(x: jax.Array, mult_rows: int, mult_cols: int) -> jax.Array:
    m, n = x.shape
    pm = (-m) % mult_rows
    pn = (-n) % mult_cols
    if pm or pn:
        x = jnp.pad(x, ((0, pm), (0, pn)))
    return x


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "bm", "bn", "bk", "interpret"),
)
def tiled_matmul(
    a: jax.Array,
    b: jax.Array,
    out_dtype=jnp.float32,
    bm: int = 256,
    bn: int = 256,
    bk: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """C = A @ B with per-tile fp32/int32 accumulation.

    Shapes need not be tile multiples — pad/slice handled here (the
    reference's ``h_launch_dev_tensorcore_mmult_tiled`` pad path).
    """
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    a_p = _pad_to(a, bm, bk)
    b_p = _pad_to(b, bk, bn)
    mp, kp = a_p.shape
    _, np_ = b_p.shape
    n_k = kp // bk
    acc_dtype = _accum_dtype(out_dtype)

    grid = (mp // bm, np_ // bn, n_k)
    out = pl.pallas_call(
        functools.partial(_gemm_kernel, n_k=n_k, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(
                mp * kp * a_p.dtype.itemsize
                + kp * np_ * b_p.dtype.itemsize
                + mp * np_ * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_p, b_p)
    return out[:m, :n]


def matmul_bf16_accum_f32(a, b, **kw):
    """bf16 x bf16 -> fp32: the MXU analog of the reference's
    half x half -> float TensorCore instantiation (``Cuda/mmult.cuh:276``)."""
    return tiled_matmul(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        out_dtype=jnp.float32, **kw,
    )


def matmul_int8_accum_i32(a, b, **kw):
    """int8 x int8 -> int32 (reference: s8 wmma combo,
    ``Cuda/mmult.cuh:287-299``)."""
    return tiled_matmul(
        a.astype(jnp.int8), b.astype(jnp.int8), out_dtype=jnp.int32, **kw
    )


def matmul_uint8_accum_i32(a, b, **kw):
    """uint8 x uint8 -> int32 — the reference's unsigned wmma instantiation
    (``test_template_tensorcore_mmult_tiled<unsigned char, ...>``,
    ``Cuda/mmult.cuh:287-299``).  The MXU consumes s8; u8 operands are
    lifted losslessly: with a' = a - 128 (s8) the product is
    a b = (a' + 128)(b' + 128) = a'b' + 128(a'1 + 1b') + 128^2 k,
    i.e. one s8 Pallas GEMM plus rank-1 row/column-sum corrections."""
    a = jnp.asarray(a, jnp.uint8)
    b = jnp.asarray(b, jnp.uint8)
    k = a.shape[1]
    a_s = (a.astype(jnp.int32) - 128).astype(jnp.int8)
    b_s = (b.astype(jnp.int32) - 128).astype(jnp.int8)
    core = tiled_matmul(a_s, b_s, out_dtype=jnp.int32, **kw)
    row = jnp.sum(a_s.astype(jnp.int32), axis=1, keepdims=True)   # (m, 1)
    col = jnp.sum(b_s.astype(jnp.int32), axis=0, keepdims=True)   # (1, n)
    return core + 128 * (row + col) + 128 * 128 * k
