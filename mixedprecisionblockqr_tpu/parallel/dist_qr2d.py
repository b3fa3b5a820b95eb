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
    _robust_panel_dist,
    _tri_chain_dist,
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


def _dist2d_bgs_local(
    A_loc: jax.Array,
    B_loc,
    *,
    m: int,
    n: int,
    block_size: int,
    rows_axis: str,
    cols_axis: str,
    policy: DTypePolicy,
    reorth: bool = True,
    on_tpu: bool = False,
):
    """2-D sharded Block Gram-Schmidt — the throughput-flagship panel
    structure (``ops/blockqr.py::_block_qr_bgs`` / 1-D
    ``_dist_bgs_local``) on a rows x cols mesh (round-4 VERDICT item 6).

    The BGS shape survives 2-D sharding with ONE extra broadcast per
    panel:

      * the panel's (h x r) row-shard piece is broadcast along ``cols``
        (masked psum — the same motion as the reflector path's Y/Sinv
        broadcast, ``_dist2d_local``), after which every device holds it
        and all chain math is replicated over ``cols``/sharded over
        ``rows`` exactly like the 1-D driver,
      * the full-height panel Gram is one psum over ``rows`` (replicated
        everywhere since the operands are cols-replicated),
      * the trailing projection is local per column shard: one psum over
        ``rows`` of the (r x wc) coefficient block, subtract in place —
        communication never leaves the two mesh axes,
      * Q materializes by CONCATENATION into the A buffer itself (the
        owner column shard overwrites the panel's columns with Q_k), so
        Q comes out sharded ``P(rows, cols)`` like A — zero Q-update
        GEMMs, the defining BGS property,
      * R stays replicated (n x n, as in the 1-D driver); the
        cols-scattered coefficient blocks fold in via one masked psum
        over ``cols`` per panel.

    ``reorth=True`` ('bgs'/'bgs2') scrubs each panel against all previous
    Q before factoring (BCGS2) at fp32 HIGHEST — any bf16 single-pass
    projection pins the orth floor at ~0.1 (round-4 single-chip
    isolation) — and rescrubs robust tail panels post-factorization
    (docs/ALGORITHMS.md D9, two-axis form).  Tail panels (last
    max(2, nb//8)) run the shifted three-pass chain.  Returns
    (Q_loc (h, wc), R (n, n) replicated, QtB (n, kB) replicated,
    poisoned per ``_poison_if_unconverged``).
    """
    h, wc = A_loc.shape
    r = block_size
    nb = n // r
    assert n % r == 0
    my_col = jax.lax.axis_index(cols_axis)
    glob_cols = my_col * wc + jax.lax.broadcasted_iota(
        jnp.int32, (1, wc), 1
    )[0]
    mm_t = lambda a, b: matmul(a, b, in_dtype=policy.trailing,
                               accum_dtype=policy.accum)
    mm_p = (
        (lambda a, b: jnp.matmul(
            a.astype(jnp.float32), b.astype(jnp.float32), precision=_HI))
        if reorth else mm_t
    )

    def psum_gram(Xl, Yl):
        return jax.lax.psum(
            jnp.matmul(Xl.T, Yl, precision=_HI), rows_axis
        )

    def bcast_cols(x, owner):
        # Broadcast an owner-column-shard block along `cols` (masked psum
        # — the reflector path's Y/Sinv motion).
        return jax.lax.psum(jnp.where(owner, x, jnp.zeros_like(x)),
                            cols_axis)

    def scatter_rows(W, lam, width):
        # Fold a per-column-shard (wc x width) coefficient block into the
        # replicated R's rows: place at this shard's global column rows,
        # then one psum over `cols`.  W rows for columns outside
        # [0, lam) are zero by construction (masked Qfin).
        Wfull = jnp.zeros((n, width), jnp.float32)
        Wfull = jax.lax.dynamic_update_slice(
            Wfull, W, (my_col * wc, jnp.int32(0))
        )
        return jax.lax.psum(Wfull, cols_axis)

    from mixedprecisionblockqr_tpu.ops.polar import (
        tri_head_iters,
        tri_iters_for_aspect,
    )

    base_iters = tri_iters_for_aspect(m / r)
    worst_resid = jnp.float32(0.0)
    # Q by concatenation INTO the working buffer: finished columns of
    # A_loc hold Q, unfinished columns still hold (projected) data.
    A_loc = A_loc.astype(jnp.float32)
    R = jnp.zeros((n, n), jnp.float32)
    kB = B_loc.shape[1] if B_loc is not None else 1
    QtB = jnp.zeros((n, kB), jnp.float32)

    for j in range(nb):
        lam = j * r
        j0, loc_col = lam // wc, lam % wc
        owner = my_col == j0
        P_own = jax.lax.dynamic_slice(A_loc, (0, loc_col), (h, r))
        P_loc = bcast_cols(P_own, owner)
        fin_mask = (glob_cols < lam)[None, :]
        if reorth and lam > 0:
            # BCGS2 scrub at fp32 HIGHEST: finished Q columns live
            # scattered over the column shards — each shard projects with
            # its own piece, the corrections sum over `cols`.
            Qfin = jnp.where(fin_mask, A_loc, 0.0)
            W = psum_gram(Qfin, P_loc)                  # (wc, r)
            P_loc = P_loc - jax.lax.psum(
                jnp.matmul(Qfin, W, precision=_HI), cols_axis
            )
            R = R.at[:, lam : lam + r].add(scatter_rows(W, lam, r))
        if j >= nb - max(2, nb // 8):
            Qk, t, rresid = _robust_panel_dist(P_loc, psum_gram, r,
                                               on_tpu=on_tpu)
            worst_resid = jnp.maximum(worst_resid, rresid)
            if reorth and lam > 0:
                # Post-factorization rescrub (docs/ALGORITHMS.md D9,
                # two-axis form — same fold as ops/blockqr.py::
                # _rescrub_panel: qk t = q2 (s t) + Qpre (W t), with the
                # Qpre projection summed over BOTH mesh axes).
                Qfin = jnp.where(fin_mask, A_loc, 0.0)
                W = psum_gram(Qfin, Qk)                 # (wc, r)
                q2 = Qk - jax.lax.psum(
                    jnp.matmul(Qfin, W, precision=_HI), cols_axis
                )
                Gq = psum_gram(q2, q2)
                X3, s, rs = _tri_chain_dist(Gq, 4, omega=False,
                                            on_tpu=on_tpu)
                q2 = jnp.matmul(q2, X3, precision=_HI)
                worst_resid = jnp.maximum(worst_resid, rs * rs)
                R = R.at[:, lam : lam + r].add(
                    scatter_rows(
                        jnp.matmul(W, t, precision=_HI), lam, r
                    )
                )
                t = jnp.matmul(s, t, precision=_HI)
                Qk = q2
        else:
            iters = (
                tri_head_iters(base_iters) if j == 0
                else base_iters if j < 0.75 * nb else base_iters + 4
            )
            G = psum_gram(P_loc, P_loc)
            X, t, resid = _tri_chain_dist(G, iters, on_tpu=on_tpu)
            Qk = jnp.matmul(P_loc, X, precision=_HI)
            worst_resid = jnp.maximum(worst_resid, resid * resid)
        R = R.at[lam : lam + r, lam : lam + r].set(jnp.triu(t))
        # Concatenate: the owner column shard's panel columns become Q_k.
        cur = jax.lax.dynamic_slice(A_loc, (0, loc_col), (h, r))
        A_loc = jax.lax.dynamic_update_slice(
            A_loc, jnp.where(owner, Qk, cur), (0, loc_col)
        )
        if B_loc is not None:
            QtB = QtB.at[lam : lam + r, :].set(
                jax.lax.psum(mm_t(Qk.T, B_loc), rows_axis)
            )
        if lam + r < n:
            trail_mask = (glob_cols >= lam + r)[None, :]
            C = jnp.where(trail_mask, A_loc, 0.0)
            G1 = jax.lax.psum(mm_p(Qk.T, C), rows_axis)   # (r, wc)
            A_loc = jnp.where(
                trail_mask, (A_loc - mm_p(Qk, G1)).astype(A_loc.dtype),
                A_loc,
            )
            # Fold the trailing coefficient rows into R: (r, wc) per
            # shard -> masked placement at global columns, psum over cols.
            G1m = jnp.where(trail_mask[0][None, :], G1, 0.0)
            Rrow = jnp.zeros((r, n), jnp.float32)
            Rrow = jax.lax.dynamic_update_slice(
                Rrow, G1m, (jnp.int32(0), my_col * wc)
            )
            R = R.at[lam : lam + r, :].add(
                jax.lax.psum(Rrow, cols_axis)
            )

    from mixedprecisionblockqr_tpu.ops.blockqr import _poison_if_unconverged

    R = jnp.triu(R)
    R, A_loc, QtB = _poison_if_unconverged(worst_resid, R, A_loc, QtB)
    return A_loc, R, QtB


@lru_cache(maxsize=None)
def _jitted_2d(m, n, block_size, policy, with_b, want_q, rows_axis,
               cols_axis, key, panel_method, loop_mode="unroll",
               on_tpu=False):
    # Mesh interning shared with the 1-D driver (_mesh_key/_MESHES —
    # review finding: this module kept a duplicate copy of both).
    mesh = _MESHES[key]

    if panel_method in ("bgs", "bgs1", "bgs2"):
        def fn_bgs(A, B):
            Q_out, R_out, QtB = _dist2d_bgs_local(
                A,
                B if with_b else None,
                m=m, n=n, block_size=block_size, rows_axis=rows_axis,
                cols_axis=cols_axis, policy=policy,
                reorth=panel_method in ("bgs", "bgs2"),
                on_tpu=on_tpu,
            )
            return Q_out, R_out, QtB

        sm = jax.shard_map(
            fn_bgs,
            mesh=mesh,
            in_specs=(P(rows_axis, cols_axis), P(rows_axis, None)),
            out_specs=(P(rows_axis, cols_axis), P(None, None),
                       P(None, None)),
            check_vma=False,
        )
        return jax.jit(sm)

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

    ``panel_method in ('bgs', 'bgs1', 'bgs2')`` runs the throughput
    flagship Block Gram-Schmidt structure on the 2-D mesh
    (``_dist2d_bgs_local``): Q by concatenation, full-height psum'd
    Grams, BCGS2 scrub + D9 rescrub on the reorth tiers ('bgs'/'bgs2';
    'bgs1' is the single-pass trailing-precision rung).  BGS materializes
    the REDUCED factor: mode='reduced' returns (Q sharded
    ``P(rows, cols)``, R replicated); mode='r' returns R; 'complete'
    requires m == n (where reduced IS complete).  Needs m >= n,
    block_size | n, and the panel width may not straddle column shards.
    """
    A = jnp.asarray(A, dtype=policy.panel)
    m, n = A.shape
    dr, dc = mesh.shape[rows_axis], mesh.shape[cols_axis]
    if m % dr or n % dc:
        raise ValueError(f"shape {A.shape} must divide over mesh ({dr},{dc})")
    is_bgs = panel_method in ("bgs", "bgs1", "bgs2")
    if not is_bgs and (m // dr) % min(block_size, n):
        # Same invariant the 1-D driver enforces (dist_qr.py): a panel
        # whose diagonal block straddles two row shards would be CLAMPED
        # by _panel_reflector_cols' dynamic slice — the Yamamoto S and
        # sign fix would build from the wrong rows and the factorization
        # would be silently wrong (review finding: the 2-D driver dropped
        # this check).  BGS panels keep full height (no diagonal-block
        # row slicing), so the constraint does not apply there.
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
    if panel_method in ("bgs", "bgs1", "bgs2"):
        if mode not in ("r", "reduced", "complete"):
            raise ValueError(f"unknown mode {mode!r}")
        if m < n:
            raise ValueError(f"BGS needs m >= n, got {A.shape}")
        if n % min(block_size, n):
            raise ValueError(
                f"BGS needs block_size | n ({block_size} vs {n})"
            )
        if (n // dc) % min(block_size, n):
            raise ValueError(
                f"block_size {min(block_size, n)} must divide per-device "
                f"columns {n // dc} (panels may not straddle column shards)"
            )
        if mode == "complete" and m != n:
            raise ValueError(
                "2-D BGS materializes the reduced Q (concatenation); "
                "complete-Q for m > n needs the reflector tiers"
            )
        from mixedprecisionblockqr_tpu.ops.blockqr import _on_tpu as _ot

        fn = _jitted_2d(
            m, n, block_size, policy, with_b, mode != "r", rows_axis,
            cols_axis, _mesh_key(mesh), panel_method, "unroll", _ot(),
        )
        Q_out, R_out, QtB = fn(A, B)
        rep = NamedSharding(mesh, P())
        R = jax.device_put(R_out[:n, :], rep)
        outs = [R]
        if mode in ("reduced", "complete"):
            outs.insert(0, Q_out)
        if with_b:
            outs.append(jax.device_put(QtB, rep))
        return tuple(outs) if len(outs) > 1 else outs[0]
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
