"""2-D sharded blocked QR: rows x cols device mesh (SURVEY §7.7).

Extends the 1-D row-sharded driver (``dist_qr.py``) to matrices sharded over
BOTH dimensions — ``P('rows', 'cols')`` — the layout for problems whose
columns don't fit one device's HBM or whose trailing updates should scale
over a second ICI axis (tensor-parallel analog):

  * the panel lives on ONE column shard; its owner column factors it by
    row-sharded TSQR exactly as in 1-D (one (r x r)-blocks ``all_gather``
    over ``rows``),
  * the resulting block-reflector pieces (Y rows, S^-1, R_panel) are
    **broadcast along ``cols``** with a masked ``psum`` — the
    "column-broadcast of (W/T)" step of the survey's plan,
  * every device then updates its own trailing block with ONE ``psum`` over
    ``rows`` of the (r x n_loc) partial products — communication never
    leaves the two mesh axes.

Q accumulation stores Q^T sharded ``P('rows', 'cols')``: its update
``Q^T <- Q^T - Y S^-T (Y^T Q^T)`` has exactly the trailing-update pattern
(one ``psum`` over ``rows`` per panel), so full Q costs the same collective
structure as R.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mixedprecisionblockqr_tpu.ops.policy import DTypePolicy, POLICY_FP32, matmul
from mixedprecisionblockqr_tpu.parallel.dist_qr import (
    _MESHES,
    _mesh_key,
    _panel_reflector_cols,
)
from mixedprecisionblockqr_tpu.parallel.mesh import ROWS_AXIS

_HI = jax.lax.Precision.HIGHEST

COLS_AXIS = "cols"


def _dist2d_local(
    A_loc: jax.Array,
    B_loc,
    Qt_loc,
    *,
    m: int,
    n: int,
    block_size: int,
    rows_axis: str,
    cols_axis: str,
    policy: DTypePolicy,
    panel_method: str,
    loop_mode: str = "unroll",
    on_tpu: bool = False,
):
    h, wc = A_loc.shape                       # local (m/dr, n/dc) block
    r = min(block_size, n)
    if wc % r != 0:
        raise ValueError(
            f"block_size {r} must divide per-device columns {wc}"
        )
    my_col = jax.lax.axis_index(cols_axis)
    glob_rows = (
        jax.lax.axis_index(rows_axis) * h
        + jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)[:, 0]
    )
    mm_t = lambda a, b: matmul(a, b, in_dtype=policy.trailing,
                               accum_dtype=policy.accum)
    # Q^T accumulation honors the policy's q_update stage (the reference's
    # TensorCore stage, independently settable) — review finding: it ran
    # at policy.trailing, diverging from the 1-D driver's mm_q.
    mm_q = lambda a, b: matmul(a, b, in_dtype=policy.q_update,
                               accum_dtype=policy.accum)

    if loop_mode == "scan":
        # ONE compiled panel step iterated by fori_loop (round-2 VERDICT
        # item 2) — the unrolled path traces n/r distinct panel programs,
        # compile-bound at flagship scale (16384^2 / r=128 = 128 panels).
        # Mirrors dist_qr.py's 1-D scan: the reflector is applied FULL
        # WIDTH — finished columns are invariant (Y has no support on their
        # nonzero rows) and the panel columns become [R; 0] exactly — so no
        # owner-column writeback/bookkeeping exists; the trailing triu mask
        # (below) clears the roundoff residue.  lam is traced:
        # _panel_reflector_cols and the owner-column arithmetic are
        # dynamic-index safe.
        if n % r != 0:
            raise ValueError(f"scan mode needs block_size | n ({r} vs {n})")

        def panel_step(lam, A_loc, B_loc, Qt_loc, pm, square_final=False):
            j0 = lam // wc
            loc_col = lam % wc
            P_cols = jax.lax.dynamic_slice(A_loc, (0, loc_col), (h, r))
            P_cols = jnp.where(my_col == j0, P_cols, 0.0)
            Y, Sinv, _ = _panel_reflector_cols(
                P_cols, lam, r, h, rows_axis, pm, square_final,
                on_tpu=on_tpu,
            )
            Y = jax.lax.psum(
                jnp.where(my_col == j0, Y, jnp.zeros_like(Y)), cols_axis
            )
            Sinv = jax.lax.psum(
                jnp.where(my_col == j0, Sinv, jnp.zeros_like(Sinv)),
                cols_axis,
            )
            G = jax.lax.psum(mm_t(Y.T, A_loc), rows_axis)
            M = jnp.matmul(Sinv.T, G, precision=_HI)
            A_loc = (A_loc - mm_t(Y, M)).astype(A_loc.dtype)
            if B_loc is not None:
                Gb = jax.lax.psum(mm_t(Y.T, B_loc), rows_axis)
                B_loc = B_loc - mm_t(
                    Y, jnp.matmul(Sinv.T, Gb, precision=_HI)
                )
            if Qt_loc is not None:
                Gq = jax.lax.psum(mm_q(Y.T, Qt_loc), rows_axis)
                Qt_loc = Qt_loc - mm_q(
                    Y, jnp.matmul(Sinv.T, Gq, precision=_HI)
                )
            return A_loc, B_loc, Qt_loc

        dummy = jnp.zeros((1, 1), A_loc.dtype)
        carry0 = (
            A_loc,
            B_loc if B_loc is not None else dummy,
            Qt_loc if Qt_loc is not None else dummy,
        )

        def wrapped(k, carry):
            a, b_, qt = carry
            a, b2, q2 = panel_step(
                k * r, a,
                b_ if B_loc is not None else None,
                qt if Qt_loc is not None else None,
                panel_method,
            )
            return (
                a,
                b2 if B_loc is not None else b_,
                q2 if Qt_loc is not None else qt,
            )

        # All but the final panel via the scan; the final (square,
        # CholeskyQR-hostile) panel runs one static Householder step.
        A_loc, B_out, Qt_out = jax.lax.fori_loop(
            0, n // r - 1, wrapped, carry0
        )
        B_loc = B_out if B_loc is not None else None
        Qt_loc = Qt_out if Qt_loc is not None else None
        A_loc, B_loc, Qt_loc = panel_step(
            n - r, A_loc, B_loc, Qt_loc, "householder",
            square_final=(m - (n - r) == r),
        )
        gc = my_col * wc + jax.lax.broadcasted_iota(jnp.int32, (h, wc), 1)
        A_loc = jnp.where(gc >= glob_rows[:, None], A_loc, 0.0)
        return A_loc, B_loc, Qt_loc

    for lam in range(0, n, r):
        w = min(r, n - lam)
        j0, loc_col = lam // wc, lam % wc     # owner column shard + offset

        # --- panel factorization on the owner column (row-sharded TSQR),
        # other columns contribute zeros; results are broadcast over `cols`
        # by a masked psum.
        pm = panel_method
        if pm in ("cholqr2", "cholqr2s") and (m - lam) < 2 * w:
            pm = "householder"
        P_cols = jax.lax.dynamic_slice(A_loc, (0, loc_col), (h, w))
        P_cols = jnp.where(my_col == j0, P_cols, 0.0)
        Y, Sinv, R_pan = _panel_reflector_cols(
            P_cols, lam, w, h, rows_axis, pm, square_final=(m - lam == w),
            on_tpu=on_tpu,
        )
        Y = jax.lax.psum(
            jnp.where(my_col == j0, Y, jnp.zeros_like(Y)), cols_axis
        )
        Sinv = jax.lax.psum(
            jnp.where(my_col == j0, Sinv, jnp.zeros_like(Sinv)), cols_axis
        )
        R_pan = jax.lax.psum(
            jnp.where(my_col == j0, R_pan, jnp.zeros_like(R_pan)), cols_axis
        )

        # --- write the panel result into the owner column's shard.
        idx = jnp.clip(glob_rows - lam, 0, w - 1)
        rvals = R_pan[idx, :]
        in_band = (glob_rows >= lam) & (glob_rows < lam + w)
        pan_new = jnp.where(
            in_band[:, None],
            rvals,
            jnp.where((glob_rows >= lam + w)[:, None], 0.0, P_cols),
        )
        owner_write = jnp.where(
            my_col == j0,
            pan_new,
            jax.lax.dynamic_slice(A_loc, (0, loc_col), (h, w)),
        )
        A_loc = jax.lax.dynamic_update_slice(
            A_loc, owner_write.astype(A_loc.dtype), (0, loc_col)
        )

        # --- trailing update on EVERY column shard: columns right of the
        # panel only (masked locally by global column index).  Static
        # skip for the FINAL panel — its trail_mask is all-False on every
        # shard, so the psum + two GEMMs were pure dead work (review
        # finding; the 1-D driver has the same guard).
        if lam + w < n:
            glob_cols = my_col * wc + jax.lax.broadcasted_iota(
                jnp.int32, (1, wc), 1
            )[0]
            trail_mask = (glob_cols >= lam + w)[None, :]
            C = jnp.where(trail_mask, A_loc, 0.0)
            G = jax.lax.psum(mm_t(Y.T, C), rows_axis)  # (w, wc) per shard
            M = jnp.matmul(Sinv.T, G, precision=_HI)
            A_loc = jnp.where(
                trail_mask, (A_loc - mm_t(Y, M)).astype(A_loc.dtype), A_loc
            )

        if B_loc is not None:
            Gb = jax.lax.psum(mm_t(Y.T, B_loc), rows_axis)
            B_loc = B_loc - mm_t(Y, jnp.matmul(Sinv.T, Gb, precision=_HI))

        if Qt_loc is not None:
            # Q^T <- H^T Q^T: same one-psum pattern as the trailing update.
            Gq = jax.lax.psum(mm_q(Y.T, Qt_loc), rows_axis)
            Qt_loc = Qt_loc - mm_q(
                Y, jnp.matmul(Sinv.T, Gq, precision=_HI)
            )

    # Zero sub-diagonal residue using global indices.
    gc = jax.lax.axis_index(cols_axis) * wc + jax.lax.broadcasted_iota(
        jnp.int32, (h, wc), 1
    )
    A_loc = jnp.where(gc >= glob_rows[:, None], A_loc, 0.0)
    return A_loc, B_loc, Qt_loc


@lru_cache(maxsize=None)
def _jitted_2d(m, n, block_size, policy, with_b, want_q, rows_axis,
               cols_axis, key, panel_method, loop_mode="unroll",
               on_tpu=False):
    # Mesh interning shared with the 1-D driver (_mesh_key/_MESHES —
    # review finding: this module kept a duplicate copy of both).
    mesh = _MESHES[key]

    def fn(A, B, Qt):
        A_out, B_out, Qt_out = _dist2d_local(
            A,
            B if with_b else None,
            Qt if want_q else None,
            m=m, n=n, block_size=block_size, rows_axis=rows_axis,
            cols_axis=cols_axis, policy=policy, panel_method=panel_method,
            loop_mode=loop_mode, on_tpu=on_tpu,
        )
        return (
            A_out,
            B_out if with_b else jnp.zeros((1, 1), A_out.dtype),
            Qt_out if want_q else jnp.zeros((1, 1), A_out.dtype),
        )

    sm = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(rows_axis, cols_axis), P(rows_axis, None),
                  P(rows_axis, cols_axis)),
        out_specs=(P(rows_axis, cols_axis),
                   P(rows_axis, None) if with_b else P(None, None),
                   P(rows_axis, cols_axis) if want_q else P(None, None)),
        check_vma=False,
    )
    return jax.jit(sm)


def dist_block_qr_2d(
    A,
    mesh: Mesh,
    block_size: int = 128,
    policy: DTypePolicy = POLICY_FP32,
    rows_axis: str = ROWS_AXIS,
    cols_axis: str = COLS_AXIS,
    b=None,
    panel_method: str = "householder",
    mode: str = "r",
    loop_mode: str = "unroll",
):
    """2-D sharded blocked QR.

    A is sharded ``P(rows_axis, cols_axis)`` over the 2-D mesh.
    mode='r' returns R (n x n, replicated)[, Q^T b]; mode='complete'
    returns (Qt, R)[, Q^T b] where Qt = Q^T stays 2-D sharded (transpose
    locally or reshard as needed).
    loop_mode='scan' compiles ONE panel step and iterates it (needed at
    flagship scale where the unrolled trace is compile-bound; requires
    block_size | n).
    """
    A = jnp.asarray(A, dtype=policy.panel)
    m, n = A.shape
    dr, dc = mesh.shape[rows_axis], mesh.shape[cols_axis]
    if m % dr or n % dc:
        raise ValueError(f"shape {A.shape} must divide over mesh ({dr},{dc})")
    if (m // dr) % min(block_size, n):
        # Same invariant the 1-D driver enforces (dist_qr.py): a panel
        # whose diagonal block straddles two row shards would be CLAMPED
        # by _panel_reflector_cols' dynamic slice — the Yamamoto S and
        # sign fix would build from the wrong rows and the factorization
        # would be silently wrong (review finding: the 2-D driver dropped
        # this check).
        raise ValueError(
            f"block_size {min(block_size, n)} must divide per-device rows "
            f"{m // dr} (panel diagonal blocks may not straddle row shards)"
        )
    if mode == "complete" and m % dc:
        # Q^T starts as eye(m) sharded P(rows, cols): m must divide over
        # BOTH axes (review finding: failed deep inside shard_map with an
        # obscure divisibility error otherwise).
        raise ValueError(
            f"mode='complete' shards Q^T (m x m) over both axes: m = {m} "
            f"must divide over {cols_axis} ({dc})"
        )
    if panel_method.startswith("cholqr") and (m // dr) < 2 * min(block_size, n):
        # Same square-leaf hazard as the 1-D driver (dist_qr.py): a
        # CholeskyQR leaf with per-device aspect < 2 goes rank-deficient
        # in fp32 on the trailing corner — refuse rather than degrade.
        raise ValueError(
            f"cholqr leaves need per-device aspect >= 2: {m // dr} "
            f"rows/device vs block_size {block_size}; use block_size <= "
            f"{m // dr // 2} or panel_method='householder'"
        )
    with_b = b is not None
    A = jax.device_put(A, NamedSharding(mesh, P(rows_axis, cols_axis)))
    B = (
        jnp.asarray(b, policy.accum).reshape(m, -1)
        if with_b
        else jnp.zeros((m, 1), policy.accum)
    )
    B = jax.device_put(B, NamedSharding(mesh, P(rows_axis, None)))
    want_q = mode == "complete"
    # Q^T starts as the identity (want_q) or a minimal placeholder that
    # still satisfies the in_spec's divisibility over the mesh.
    Qt0 = jax.device_put(
        jnp.eye(m, dtype=policy.accum)
        if want_q
        else jnp.zeros((dr, dc), policy.accum),
        NamedSharding(mesh, P(rows_axis, cols_axis)),
    )
    from mixedprecisionblockqr_tpu.ops.blockqr import _on_tpu

    fn = _jitted_2d(
        m, n, block_size, policy, with_b, want_q, rows_axis, cols_axis,
        _mesh_key(mesh), panel_method, loop_mode, _on_tpu(),
    )
    A_out, B_out, Qt_out = fn(A, B, Qt0)
    rep = NamedSharding(mesh, P())
    R = jax.jit(lambda x: jnp.triu(x[:n, :]), out_shardings=rep)(A_out)
    outs = [R]
    if want_q:
        outs.insert(0, Qt_out)
    if with_b:
        outs.append(jax.device_put(B_out, rep))
    return tuple(outs) if len(outs) > 1 else outs[0]
