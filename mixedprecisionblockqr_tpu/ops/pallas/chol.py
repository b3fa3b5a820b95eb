"""Fused blocked Cholesky + triangular inverse — one Pallas kernel in VMEM.

Why: the CholeskyQR2 panel path (``ops/cholqr.py``) reduces blocked QR to
GEMMs plus one small Cholesky + triangular solve per pass.  XLA's generic
``cholesky``/``solve_triangular`` on a 256x256 operand cost ~140us + ~35us
each on TPU (loop/dispatch overhead, not FLOPs) — multiplied by 2 passes x
n/r panels that dominates the whole factorization.  This kernel computes
BOTH the upper Cholesky factor R (G = R^T R) and its explicit inverse
R^{-1} in a single VMEM-resident pass:

  * right-looking blocked Cholesky, diagonal blocks of size 32: the
    unblocked 32-step column loop also accumulates the diagonal block's
    inverse row-by-row (bordered-form update — one matvec per column),
  * per block: row-panel solve and trailing Schur update are MXU GEMMs,
  * the off-diagonal blocks of R^{-1} are back-filled with the blocked
    upper-triangular inversion recurrence
        Rinv[k,j] = -Rkk^{-1} ( sum_{l>k} R[k,l] Rinv[l,j] )
    — all (32 x 32)(32 x ...) GEMMs inside the same kernel.

With R^{-1} explicit, ``Q = P @ R^{-1}`` is a plain MXU GEMM, so the entire
CholeskyQR2 panel becomes: GEMM, this kernel, GEMM (x2 passes).

Requires r % 32 == 0 (the blocked drivers use r in {32..512}); callers fall
back to the XLA path otherwise (and in interpret mode the kernel runs on
CPU for tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B = 32  # diagonal block size
_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    # True-fp32 matmul: without HIGHEST, fp32 dots inside Mosaic lower to a
    # single bf16 MXU pass and the factorization degrades to ~2^-8 accuracy.
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_HI)


def _chol_inv_kernel(g_ref, r_ref, rinv_ref, a_ref, *, r: int):
    nb = r // _B
    a_ref[:] = g_ref[:]
    r_ref[:] = jnp.zeros_like(r_ref)
    rinv_ref[:] = jnp.zeros_like(rinv_ref)

    rows_b = jax.lax.broadcasted_iota(jnp.int32, (_B, _B), 0)
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (_B, _B), 1)

    for k in range(nb):
        base = k * _B
        Ablk0 = a_ref[base : base + _B, base : base + _B]

        def col_step(i, carry):
            # No dynamic indexing (Mosaic TC has no dynamic_slice on values):
            # column/row/diagonal extraction is via masked reductions.
            Ablk, L, Linv = carry
            d = jnp.sqrt(
                jnp.sum(jnp.where((rows_b == i) & (cols_b == i), Ablk, 0.0))
            )
            col = jnp.sum(jnp.where(cols_b == i, Ablk, 0.0), axis=1) / d
            l = jnp.where(rows_b[:, 0] >= i, col, 0.0)          # (B,)
            Ablk = Ablk - l[:, None] * l[None, :]
            L = jnp.where(cols_b == i, l[:, None], L)
            # Inverse row i (bordered form): row = (e_i - L[i,:i] Linv) / d
            lrow_full = jnp.sum(jnp.where(rows_b == i, L, 0.0), axis=0)
            lrow = jnp.where(rows_b[:, 0] < i, lrow_full, 0.0)  # (B,)
            # VPU multiply-reduce (exact fp32) — a HIGHEST-precision MXU
            # matvec here costs ~1us/column in Mosaic's fallback path.
            prod = jnp.sum(lrow[:, None] * Linv, axis=0)
            e_i = (rows_b[:, 0] == i).astype(jnp.float32)
            rowv = (e_i - prod) / d
            Linv = jnp.where(rows_b == i, rowv[None, :], Linv)
            return Ablk, L, Linv

        zero = jnp.zeros((_B, _B), jnp.float32)
        _, L, Linv = jax.lax.fori_loop(0, _B, col_step, (Ablk0, zero, zero))

        r_ref[base : base + _B, base : base + _B] = L.T
        rinv_ref[base : base + _B, base : base + _B] = Linv.T

        if base + _B < r:
            T = a_ref[base : base + _B, base + _B :]
            Rrow = _dot(Linv, T)
            r_ref[base : base + _B, base + _B :] = Rrow
            trail = a_ref[base + _B :, base + _B :]
            a_ref[base + _B :, base + _B :] = trail - _dot(Rrow.T, Rrow)

    # Off-diagonal blocks of R^{-1}: block-row backward recurrence —
    # ONE (B x rest)(rest x rest) GEMM per block row (k descending), instead
    # of nb^2/2 tiny ones:  Rinv[k, k+1:] = -Rkk^{-1} R[k, k+1:] Rinv[k+1:, k+1:].
    for k in range(nb - 2, -1, -1):
        kb = k * _B
        Rrow = r_ref[kb : kb + _B, kb + _B :]
        Xlow = rinv_ref[kb + _B :, kb + _B :]
        S = _dot(Rrow, Xlow)
        Rkkinv = rinv_ref[kb : kb + _B, kb : kb + _B]
        rinv_ref[kb : kb + _B, kb + _B :] = -_dot(Rkkinv, S)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_rinv(G: jax.Array, interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Upper Cholesky factor and its inverse: G = R^T R, returns (R, R^{-1}).

    G must be symmetric positive definite with size a multiple of 32.
    """
    r = G.shape[0]
    if r % _B != 0:
        raise ValueError(f"chol_rinv requires size % {_B} == 0, got {r}")
    G = G.astype(jnp.float32)
    kernel = functools.partial(_chol_inv_kernel, r=r)
    R, Rinv = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, r), jnp.float32),
            jax.ShapeDtypeStruct((r, r), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((r, r), jnp.float32)],
        interpret=interpret,
    )(G)
    return R, Rinv
