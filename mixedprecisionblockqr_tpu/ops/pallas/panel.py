"""Fused Householder panel factorization — one Pallas kernel, panel in VMEM.

Replaces the reference's panel pipeline — host ``h_householder_qr``
(``Cuda/qr.cu:198``) + device WY loop with 3 kernel launches and syncs per
column (``dev_wy_transform``, ``Cuda/qr.cu:535-600``) — with a single kernel
that keeps the panel, the reflectors V, and the T factor resident in VMEM
for the entire column loop: zero HBM round trips between columns, no launch
overhead, no host involvement.

Outputs match :func:`ops.householder.panel_factor` exactly in semantics:
(V, T, R_panel) with ``Q_panel = I - V T V^T`` (beta = 2 unit reflectors).

VMEM budget: panel + V + P' (m x r fp32 each) + T (r x r); for r = 128 the
kernel handles m up to ~8k per call.  The blocked driver only hands it
panels (the trailing GEMMs stay in XLA where the compiler already tiles
them optimally).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1e-30


_HI = jax.lax.Precision.HIGHEST


def _dotf(a, b):
    # fp32-true dot: Mosaic lowers default-precision fp32 dots to one bf16
    # MXU pass, which would degrade the panel to bf16 accuracy.
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_HI)


def _panel_kernel(p_ref, v_ref, t_ref, r_ref, *, ncols: int):
    m, r = p_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    cols_m = jax.lax.broadcasted_iota(jnp.int32, (m, r), 1)

    v_ref[:] = jnp.zeros_like(v_ref)
    t_ref[:] = jnp.zeros_like(t_ref)

    def body(j, _):
        P = p_ref[:]
        # Column j via masked reduction (Mosaic TC has no dynamic_slice).
        x = jnp.sum(jnp.where(cols_m == j, P, 0.0), axis=1, keepdims=True)
        mask = rows >= j
        xm = jnp.where(mask, x, 0.0)
        sigma2 = jnp.sum(xm * xm)
        sigma = jnp.sqrt(sigma2)
        alpha = jnp.sum(jnp.where(rows == j, x, 0.0))
        sign = jnp.where(alpha >= 0, 1.0, -1.0).astype(x.dtype)
        e = (rows == j).astype(x.dtype)
        u = xm + sign * sigma * e
        unorm = jnp.sqrt(jnp.sum(u * u))
        live = sigma > _TINY
        w = jnp.where(live, u / jnp.where(live, unorm, 1.0), 0.0)  # (m, 1)
        beta = jnp.where(live, 2.0, 0.0).astype(x.dtype)

        # Rank-1 update of the whole panel: P -= beta * w (w^T P).
        # Outer product as a VPU broadcast multiply (a matmul here would
        # round the operands to bf16 on the MXU).
        wtP = _dotf(w.T, P)                        # (1, r)
        p_ref[:] = P - beta * (w * wtP)

        # T column: t = -beta * T @ (V^T w); T[j, j] = beta.
        V = v_ref[:]
        T = t_ref[:]
        vtw = _dotf(V.T, w)                        # (r, 1)
        tcol = -beta * _dotf(T, vtw)
        cols_r = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        tcol = jnp.where(cols_r < j, tcol, 0.0)
        tcol = jnp.where(cols_r == j, beta, tcol)

        v_ref[:] = jnp.where(cols_m == j, w, V)
        tcol_b = jnp.broadcast_to(tcol, (r, r))  # column vector down rows
        t_ref[:] = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) == j, tcol_b, T
        )
        return 0

    jax.lax.fori_loop(0, ncols, body, 0)
    r_ref[:] = p_ref[:]


def panel_factor_fused(panel, interpret=None):
    """Pallas-fused equivalent of ``ops.householder.panel_factor``.

    Returns (V (m x r), T (r x r), R_panel (m x r)).  ``interpret`` defaults
    to True on CPU backends (tests) and False on TPU.
    """
    if interpret is None:
        import jax.extend.backend as jxb

        try:
            interpret = jxb.get_backend().platform == "cpu"
        except Exception:
            interpret = True
    return _panel_factor_fused(panel, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _panel_factor_fused(
    panel: jax.Array, interpret: bool = False
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    m, r = panel.shape
    panel = panel.astype(jnp.float32)
    kernel = functools.partial(_panel_kernel, ncols=r)
    V, T, R = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, r), jnp.float32),
            jax.ShapeDtypeStruct((r, r), jnp.float32),
            jax.ShapeDtypeStruct((m, r), jnp.float32),
        ),
        input_output_aliases={0: 2},  # panel buffer becomes R in place
        interpret=interpret,
    )(panel)
    return V, T, R
