"""CAQR / tiled QR: communication-avoiding QR for general (m x n) matrices.

Generalizes the reference's ``tiled_qr`` prototype (``python/ca_qr.py:47-84``)
— which hard-codes a 24x6 matrix, a 4-way row split, 3-wide panels, and
abandons Q reconstruction ("need fix Q", ``python/ca_qr.py:73-75``) — into a
complete driver:

  * arbitrary sizes: column panels of width r, per-panel binary row tree,
  * the panel factorization is TSQR (leaves + tree of compact-WY factors),
  * the trailing update applies the SAME tree to the trailing columns:
    leaf updates are batched ``vmap`` block-reflector GEMMs; each tree level
    touches only the top-r rows of the paired row blocks (this row locality
    is exactly what makes the algorithm communication-avoiding when the row
    blocks live on different chips — see ``parallel/dist_qr.py``),
  * Q is reconstructed by replaying the stored factors (fixing the
    reference's broken path).

All factors are stored as a pytree (`CAQRFactors`) so ``apply_q`` /
``apply_qt`` are jit-compatible linear operators — the LAPACK
geqrf/ormqr split, which the reference has no equivalent of.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from mixedprecisionblockqr_tpu.ops.householder import panel_factor
from mixedprecisionblockqr_tpu.ops.policy import DTypePolicy, POLICY_FP32
from mixedprecisionblockqr_tpu.ops.wy import (
    apply_block_reflector_left_t,
    apply_block_reflector_right,
)

_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PanelFactors:
    """Factors of one column panel's TSQR: leaf (V, T) per row block plus
    (V, T) per tree level (level l pairs winners with stride 2^l)."""

    row_offset: int          # static: first row of the panel
    col_offset: int          # static: first column of the panel
    width: int               # static: panel width
    leaf_v: jax.Array        # (L, h, r)
    leaf_t: jax.Array        # (L, r, r)
    tree_v: List[jax.Array]  # level l: (L / 2^{l+1}, 2r, r)
    tree_t: List[jax.Array]  # level l: (L / 2^{l+1}, r, r)

    def tree_flatten(self):
        return (
            (self.leaf_v, self.leaf_t, self.tree_v, self.tree_t),
            (self.row_offset, self.col_offset, self.width),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        lv, lt, tv, tt = children
        return cls(aux[0], aux[1], aux[2], lv, lt, tv, tt)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CAQRFactors:
    m: int
    n: int
    panels: List[PanelFactors]

    def tree_flatten(self):
        return ((self.panels,), (self.m, self.n))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], children[0])


def _pick_row_blocks(height: int, r: int, requested: Optional[int]) -> int:
    if requested is not None:
        return requested
    L = 1
    while L * 2 <= 32 and height // (L * 2) >= max(2 * r, 8):
        L *= 2
    return L


def _tree_apply_left(
    tops_get, tops_set, tree_v, tree_t, L: int, transpose: bool, policy: DTypePolicy
):
    """Apply the tree's block reflectors to per-block top-r row strips.

    ``tops_get(i)`` / ``tops_set(i, val)`` abstract where the strips live so
    the same sweep serves factorization-time updates and Q replay.  When
    ``transpose`` the levels run leaf-to-root applying Q_l^T; otherwise
    root-to-leaf applying Q_l (for apply_q).
    """
    nlev = len(tree_v)
    order = range(nlev) if transpose else reversed(range(nlev))
    for l in order:
        s = 1 << l
        Vl, Tl = tree_v[l], tree_t[l]
        c = Vl.shape[0]
        for j in range(c):
            i0, i1 = 2 * s * j, 2 * s * j + s
            stacked = jnp.concatenate([tops_get(i0), tops_get(i1)], axis=0)
            if transpose:
                stacked = apply_block_reflector_left_t(stacked, Vl[j], Tl[j], policy)
            else:
                # Q_l X = X - V (T (V^T X))
                VtX = jnp.matmul(Vl[j].T, stacked, precision=_HI)
                stacked = stacked - jnp.matmul(
                    Vl[j], jnp.matmul(Tl[j], VtX, precision=_HI), precision=_HI
                )
            r = stacked.shape[0] // 2
            tops_set(i0, stacked[:r])
            tops_set(i1, stacked[r:])


def _factor_panel(
    Asub: jax.Array,
    r: int,
    row_blocks: Optional[int],
    policy: DTypePolicy,
) -> Tuple[PanelFactors, jax.Array]:
    """TSQR-factor the first r columns of ``Asub`` (rows below/at the panel
    diagonal) and apply the transposed tree to its trailing columns.

    Returns (factors, updated Asub)."""
    height, ncols = Asub.shape
    L = _pick_row_blocks(height, r, row_blocks)
    h = height // L
    if h < r:
        raise ValueError(
            f"row blocks of height {h} shorter than panel width {r}; "
            f"reduce row_blocks or block_size"
        )
    rem = height - L * h  # fold any remainder into the last block
    heights = [h] * (L - 1) + [h + rem]
    starts = [i * h for i in range(L)]

    # --- leaves ---------------------------------------------------------
    leaf_vs, leaf_ts = [], []
    blocks = []
    for i in range(L):
        blk = Asub[starts[i] : starts[i] + heights[i], :]
        V, T, P = panel_factor(blk[:, :r])
        blk = jnp.concatenate(
            [P, apply_block_reflector_left_t(blk[:, r:], V, T, policy)]
            if ncols > r
            else [P],
            axis=1,
        )
        leaf_vs.append(V)
        leaf_ts.append(T)
        blocks.append(blk)

    # --- tree -----------------------------------------------------------
    tree_v, tree_t = [], []
    lev = 0
    c = L
    while c > 1:
        s = 1 << lev
        Vl_list, Tl_list = [], []
        for j in range(c // 2):
            i0, i1 = 2 * s * j, 2 * s * j + s
            stacked = jnp.concatenate(
                [blocks[i0][:r, :], blocks[i1][:r, :]], axis=0
            )
            V, T, P = panel_factor(stacked[:, :r])
            rest = (
                apply_block_reflector_left_t(stacked[:, r:], V, T, policy)
                if ncols > r
                else stacked[:, r:]
            )
            upd = jnp.concatenate([P, rest], axis=1)
            blocks[i0] = blocks[i0].at[:r, :].set(upd[:r])
            blocks[i1] = blocks[i1].at[:r, :].set(upd[r:])
            Vl_list.append(V)
            Tl_list.append(T)
        tree_v.append(jnp.stack(Vl_list))
        tree_t.append(jnp.stack(Tl_list))
        c //= 2
        lev += 1

    # Pad leaf factors to a uniform stack (last block may be taller).
    hmax = max(heights)
    leaf_v = jnp.stack(
        [jnp.pad(v, ((0, hmax - v.shape[0]), (0, 0))) for v in leaf_vs]
    )
    leaf_t = jnp.stack(leaf_ts)
    out = jnp.concatenate(blocks, axis=0)
    factors = PanelFactors(0, 0, r, leaf_v, leaf_t, tree_v, tree_t)
    return factors, out


def caqr_factor(
    A,
    block_size: int = 64,
    row_blocks: Optional[int] = None,
    policy: DTypePolicy = POLICY_FP32,
) -> Tuple[CAQRFactors, jax.Array]:
    """Tiled CAQR factorization.  Returns (factors, R (n x n))."""
    A = jnp.asarray(A, dtype=policy.panel)
    m, n = A.shape
    if m < n:
        raise ValueError(f"caqr requires m >= n, got {A.shape}")
    r = min(block_size, n)
    panels: List[PanelFactors] = []
    for lam in range(0, n, r):
        w = min(r, n - lam)
        Asub = A[lam:, lam:]
        pf, Asub = _factor_panel(Asub, w, row_blocks, policy)
        pf = PanelFactors(lam, lam, w, pf.leaf_v, pf.leaf_t, pf.tree_v, pf.tree_t)
        A = A.at[lam:, lam:].set(Asub)
        panels.append(pf)
    R = jnp.triu(A[:n, :])
    return CAQRFactors(m, n, panels), R


def _apply_panel(X: jax.Array, pf: PanelFactors, transpose: bool,
                 policy: DTypePolicy) -> jax.Array:
    """Apply one panel's Q (or Q^T) to the rows >= row_offset of X."""
    lam, r = pf.row_offset, pf.width
    sub = X[lam:, :]
    L = pf.leaf_v.shape[0]
    height = sub.shape[0]
    h = height // L
    heights = [h] * (L - 1) + [h + (height - L * h)]
    starts = [i * h for i in range(L)]
    blocks = [sub[starts[i] : starts[i] + heights[i], :] for i in range(L)]

    def leaf_sweep(transpose_leaf: bool):
        for i in range(L):
            V = pf.leaf_v[i][: heights[i], :]
            T = pf.leaf_t[i]
            if transpose_leaf:
                blocks[i] = apply_block_reflector_left_t(blocks[i], V, T, policy)
            else:
                VtX = jnp.matmul(V.T, blocks[i], precision=_HI)
                blocks[i] = blocks[i] - jnp.matmul(
                    V, jnp.matmul(T, VtX, precision=_HI), precision=_HI
                )

    def tops_get(i):
        return blocks[i][:r, :]

    def tops_set(i, val):
        blocks[i] = blocks[i].at[:r, :].set(val)

    if transpose:
        leaf_sweep(True)
        _tree_apply_left(tops_get, tops_set, pf.tree_v, pf.tree_t, L, True, policy)
    else:
        _tree_apply_left(tops_get, tops_set, pf.tree_v, pf.tree_t, L, False, policy)
        leaf_sweep(False)
    return X.at[lam:, :].set(jnp.concatenate(blocks, axis=0))


def apply_qt(factors: CAQRFactors, X, policy: DTypePolicy = POLICY_FP32):
    """Compute Q^T X for the implicit Q of a CAQR factorization."""
    X = jnp.asarray(X, dtype=policy.panel)
    for pf in factors.panels:
        X = _apply_panel(X, pf, True, policy)
    return X


def apply_q(factors: CAQRFactors, X, policy: DTypePolicy = POLICY_FP32):
    """Compute Q X (panels replayed in reverse)."""
    X = jnp.asarray(X, dtype=policy.panel)
    for pf in reversed(factors.panels):
        X = _apply_panel(X, pf, False, policy)
    return X


def caqr(
    A,
    block_size: int = 64,
    row_blocks: Optional[int] = None,
    mode: str = "reduced",
    policy: DTypePolicy = POLICY_FP32,
):
    """Full CAQR driver: A = QR with Q reconstructed by factor replay."""
    A = jnp.asarray(A, dtype=policy.panel)
    m, n = A.shape
    factors, R = caqr_factor(A, block_size, row_blocks, policy)
    ncols = n if mode == "reduced" else m
    I = jnp.eye(m, ncols, dtype=policy.panel)
    Q = apply_q(factors, I, policy)
    if mode == "reduced":
        return Q, R
    return Q, jnp.concatenate([R, jnp.zeros((m - n, n), R.dtype)], axis=0)
