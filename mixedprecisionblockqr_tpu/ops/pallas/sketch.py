"""Greedy QRCP pivot selection on a VMEM-resident sketch — one kernel.

The RQRCP tier (``ops/pivoted.py::_rqrcp_impl``) spends ~2/3 of its time
in the XLA ``fori_loop`` of ``_sketch_qrcp`` (measured 7.4 of 11.1 ms at
2048^2: r sequential steps per panel, each a handful of small ops at the
in-context XLA op floor).  The whole selection state is tiny — the
(r + oversample) x w sketch is ~1 MB — so this kernel keeps it VMEM-
resident and runs all r steps in one dispatch, the same fusion answer as
``bgs_group_fused``.

In-kernel pivoting obeys the Mosaic rules (CLAUDE.md): no
``dynamic_slice`` on values — the pivot column is extracted with a
one-hot MXU matvec, the argmax is a max + masked-iota-min reduction
(first-index tie semantics, matching ``jnp.argmax``), and every
intermediate stays 2-D.

Width bucketing: the trailing carry shrinks every panel; compiling one
Mosaic program per width would cost nb relay compiles per problem size.
``sketch_qrcp_ranks`` pads the sketch to the next power-of-two bucket
(>= 256) and passes the REAL width as a dynamic SMEM scalar — ~log2(nb)
compiles total, and padded columns carry -inf norms so they are never
picked while any real column (even an exactly-zero one) remains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _sketch_qrcp_kernel(valid_ref, b_ref, rank_ref, work_ref, norms_ref,
                        *, r: int, d: int, wb: int):
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, wb), 1)
    valid = cols < valid_ref[0, 0]
    work_ref[:] = jnp.where(valid, b_ref[:], 0.0)
    B0 = work_ref[:]
    norms_ref[:] = jnp.where(
        valid, jnp.sum(B0 * B0, axis=0, keepdims=True), -jnp.inf
    )
    # rank w for "never selected": the caller argsorts ranks so selected
    # columns (ranks 0..r-1) lead and the rest keep their relative order.
    rank_ref[:] = jnp.where(valid, wb, 2 * wb).astype(jnp.int32)
    tiny = jnp.finfo(jnp.float32).tiny

    def step(s, _):
        norms = norms_ref[:]
        mx = jnp.max(norms)
        # first-index argmax (jnp.argmax tie semantics)
        j = jnp.min(jnp.where(norms == mx, cols, wb))
        onehot = (cols == j).astype(jnp.float32)        # (1, wb)
        # pivot column via MXU matvec — no dynamic_slice on values
        q = jax.lax.dot_general(
            work_ref[:], onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )                                               # (d, 1)
        q2 = jnp.sum(q * q)
        qn = jnp.where(q2 > tiny, q * jax.lax.rsqrt(jnp.maximum(q2, tiny)),
                       jnp.zeros_like(q))
        coef = jax.lax.dot_general(
            qn, work_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )                                               # (1, wb)
        # rank-1 downdate as a VPU broadcast multiply (not a matmul)
        work_ref[:] = work_ref[:] - qn * coef
        # CGS norm downdate; selected and invalid columns stay at -inf
        dead = (onehot > 0) | (norms_ref[:] == -jnp.inf)
        norms_ref[:] = jnp.where(
            dead, -jnp.inf, jnp.maximum(norms_ref[:] - coef * coef, 0.0)
        )
        rank_ref[:] = jnp.where(onehot > 0, s, rank_ref[:]).astype(
            jnp.int32
        )
        return 0

    jax.lax.fori_loop(0, r, step, 0)


@functools.partial(jax.jit, static_argnames=("r", "wb", "interpret"))
def _sketch_qrcp_ranks_padded(Bp, valid, r, wb, interpret):
    d = Bp.shape[0]
    kernel = functools.partial(_sketch_qrcp_kernel, r=r, d=d, wb=wb)
    rank = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, wb), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((d, wb), jnp.float32),
            pltpu.VMEM((1, wb), jnp.float32),
        ],
        interpret=interpret,
    )(valid, Bp)
    return rank


def sketch_qrcp_ranks(Bsk: jax.Array, r: int,
                      interpret: bool = False) -> jax.Array:
    """Selection ranks for greedy QRCP on the (d, w) sketch ``Bsk``:
    returns ``rank_of`` (w,) int32 where the s-th pivot column holds s
    (s < r) and unselected columns hold >= w; ``argsort(rank_of)`` is the
    panel's column order.  Same selection as
    ``ops/pivoted.py::_sketch_qrcp`` (oracle-tested), one dispatch."""
    d, w = Bsk.shape
    wb = max(256, 1 << (w - 1).bit_length())
    Bp = (
        Bsk
        if w == wb
        else jnp.concatenate(
            [Bsk, jnp.zeros((d, wb - w), Bsk.dtype)], axis=1
        )
    )
    valid = jnp.full((1, 1), w, jnp.int32)
    rank = _sketch_qrcp_ranks_padded(
        Bp.astype(jnp.float32), valid, r, wb, interpret
    )
    return rank[0, :w]
