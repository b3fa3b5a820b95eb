"""Batched (data-parallel) factorizations over a device mesh.

The DP analog for this framework: independent QR/least-squares problems
sharded over a ``batch`` mesh axis, optionally combined with row sharding
(``rows``) inside each problem — a 2-D (dp x sp) mesh, the closest analog
of dp/tp/sp layouts for a linear-algebra workload (SURVEY §2.5).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mixedprecisionblockqr_tpu.ops.blockqr import (
    _jitted_driver,
    resolve_panel_config,
)
from mixedprecisionblockqr_tpu.ops.policy import DTypePolicy, POLICY_FP32
from mixedprecisionblockqr_tpu.parallel.mesh import BATCH_AXIS, ROWS_AXIS
from mixedprecisionblockqr_tpu.parallel.tsqr import _leaf_qr, reduction_tree

_HI = jax.lax.Precision.HIGHEST


def block_qr_batched_sharded(
    A_batch,
    mesh: Mesh,
    block_size: int = 128,
    policy: DTypePolicy = POLICY_FP32,
    panel_method: str = "cholqr2",
    axis: str = BATCH_AXIS,
) -> Tuple[jax.Array, jax.Array]:
    """Independent QRs, batch axis sharded over ``mesh[axis]`` (pure DP:
    zero communication).  Returns (Q (b, m, n), R (b, n, n))."""
    A_batch = jnp.asarray(A_batch, dtype=policy.panel)
    b, m, n = A_batch.shape
    if b % mesh.shape[axis]:
        raise ValueError(f"batch {b} must divide over {axis}")
    sharding = NamedSharding(mesh, P(axis, None, None))
    A_batch = jax.device_put(A_batch, sharding)
    # Shared dispatch table (the same shape-fallback chain + policy/method
    # validation every other entry point uses) — going straight to
    # _jitted_driver let hostile shapes die on the driver's bare assert
    # and skipped the fp64/NS-tier check (review finding).
    panel_method, _, group_panels = resolve_panel_config(
        m, n, block_size, policy, panel_method, "unroll", 4,
        mode="reduced",
    )
    fn = _jitted_driver(block_size, policy, True, False, panel_method,
                        group_panels=group_panels)

    def local(x):  # (b/d, m, n) — embarrassingly parallel
        R_full, Q, _ = jax.vmap(fn)(x)
        return Q[:, :, :n], jnp.triu(R_full[:, :n, :])

    run = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis, None, None),
        out_specs=(P(axis, None, None), P(axis, None, None)),
        check_vma=False,
    )
    return jax.jit(run)(A_batch)


def tsqr_batched_sharded_2d(
    A_batch,
    mesh: Mesh,
    batch_axis: str = BATCH_AXIS,
    rows_axis: str = ROWS_AXIS,
    leaf_method: str = "cholqr2",
) -> Tuple[jax.Array, jax.Array]:
    """Batched TSQR on a 2-D (batch x rows) mesh: each problem's rows are
    sharded over ``rows`` (sequence-parallel analog; one all_gather of the
    (n x n) R factors rides that axis) while independent problems split
    over ``batch`` (data-parallel analog; no cross-batch communication).

    A_batch: (b, m, n) with b divisible by mesh[batch] and m by mesh[rows].
    Returns (Q sharded like A, R (b, n, n) sharded over batch only).
    """
    A_batch = jnp.asarray(A_batch, dtype=jnp.float32)
    b, m, n = A_batch.shape
    db = mesh.shape[batch_axis]
    dr = mesh.shape[rows_axis]
    if b % db or m % dr:
        raise ValueError(
            f"batch {b} must divide over {batch_axis}({db}) and rows {m} "
            f"over {rows_axis}({dr})"
        )

    def local_fn(Ablk):  # (b/db, m/dr, n)
        def one(Ab):
            Qloc, Rloc = _leaf_qr(Ab, leaf_method)
            Rall = jax.lax.all_gather(Rloc, rows_axis)  # (dr, n, n)
            F, R = reduction_tree(Rall)
            my = jax.lax.axis_index(rows_axis)
            myF = jax.lax.dynamic_index_in_dim(F, my, 0, keepdims=False)
            return jnp.matmul(Qloc, myF, precision=_HI), R

        return jax.vmap(one)(Ablk)

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(batch_axis, rows_axis, None),
        out_specs=(P(batch_axis, rows_axis, None), P(batch_axis, None, None)),
        check_vma=False,
    )
    sharding = NamedSharding(mesh, P(batch_axis, rows_axis, None))
    return jax.jit(fn)(jax.device_put(A_batch, sharding))
