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
from mixedprecisionblockqr_tpu.ops.wy import apply_block_reflector_left_t

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
        # Clamp to the per-panel height like the auto rule: panels shrink
        # toward the trailing corner, so an unclamped explicit L failed on
        # the LAST panel of every m ~= n input (review finding: caqr at
        # 64^2 / row_blocks=2 raised on its final 16x16 panel).  The
        # request is a per-panel UPPER bound, halved until leaves are at
        # least r tall.
        L = max(1, requested)
        while L > 1 and height // L < r:
            L //= 2
        return L
    L = 1
    while L * 2 <= 32 and height // (L * 2) >= max(2 * r, 8):
        L *= 2
    return L


def _tree_apply_left(
    blocks: jax.Array,
    tree_v,
    tree_t,
    r: int,
    transpose: bool,
    policy: DTypePolicy,
) -> jax.Array:
    """Apply the tree's block reflectors to the per-block top-r row strips
    of ``blocks`` (L, h, k) — ONE vmapped application per level (round-2
    VERDICT item 4: the per-pair Python loops made CAQR compile-bound).

    When ``transpose`` the levels run leaf-to-root applying Q_l^T; otherwise
    root-to-leaf applying Q_l (for apply_q).
    """
    nlev = len(tree_v)
    order = range(nlev) if transpose else reversed(range(nlev))
    for l in order:
        s = 1 << l
        Vl, Tl = tree_v[l], tree_t[l]
        j = jnp.arange(Vl.shape[0])
        i0, i1 = 2 * s * j, 2 * s * j + s
        st = jnp.concatenate(
            [blocks[i0, :r, :], blocks[i1, :r, :]], axis=1
        )  # (c/2, 2r, k)
        if transpose:
            st = jax.vmap(
                lambda x, V, T: apply_block_reflector_left_t(x, V, T, policy)
            )(st, Vl, Tl)
        else:
            def _app(x, V, T):
                # Q_l X = X - V (T (V^T X))
                VtX = jnp.matmul(V.T, x, precision=_HI)
                return x - jnp.matmul(
                    V, jnp.matmul(T, VtX, precision=_HI), precision=_HI
                )

            st = jax.vmap(_app)(st, Vl, Tl)
        blocks = blocks.at[i0, :r, :].set(st[:, :r, :])
        blocks = blocks.at[i1, :r, :].set(st[:, r:, :])
    return blocks


def _factor_panel(
    Asub: jax.Array,
    r: int,
    row_blocks: Optional[int],
    policy: DTypePolicy,
) -> Tuple[PanelFactors, jax.Array]:
    """TSQR-factor the first r columns of ``Asub`` (rows below/at the panel
    diagonal) and apply the transposed tree to its trailing columns.

    Rows are zero-padded to L uniform blocks — QR of [A; 0] has the same R,
    and Householder reflectors have zero support on zero rows, so the pad
    never mixes with data.  Leaves factor as ONE vmapped panel_factor; each
    tree level is one vmapped pair-factorization (mirrors
    ``tsqr.reduction_tree``).

    Returns (factors, updated Asub)."""
    height, ncols = Asub.shape
    L = _pick_row_blocks(height, r, row_blocks)
    if L < 1 or L & (L - 1):
        raise ValueError(f"row_blocks must be a power of two, got {L}")
    h = -(-height // L)  # ceil
    if h < r:
        raise ValueError(
            f"row blocks of height {h} shorter than panel width {r}; "
            f"reduce row_blocks or block_size"
        )
    pad = L * h - height
    Apad = jnp.pad(Asub, ((0, pad), (0, 0))) if pad else Asub
    blocks = Apad.reshape(L, h, ncols)

    # --- leaves: one vmapped factor + trailing update --------------------
    def leaf(blk):
        V, T, Rp = panel_factor(blk[:, :r])
        if ncols > r:
            rest = apply_block_reflector_left_t(blk[:, r:], V, T, policy)
            return V, T, jnp.concatenate([Rp, rest], axis=1)
        return V, T, Rp

    leaf_v, leaf_t, blocks = jax.vmap(leaf)(blocks)

    # --- tree: one vmapped pair-factorization per level -------------------
    tree_v, tree_t = [], []
    lev = 0
    c = L
    while c > 1:
        s = 1 << lev
        j = jnp.arange(c // 2)
        i0, i1 = 2 * s * j, 2 * s * j + s
        st = jnp.concatenate(
            [blocks[i0, :r, :], blocks[i1, :r, :]], axis=1
        )  # (c/2, 2r, ncols)

        def node(x):
            V, T, Rp = panel_factor(x[:, :r])
            if ncols > r:
                rest = apply_block_reflector_left_t(x[:, r:], V, T, policy)
                return V, T, jnp.concatenate([Rp, rest], axis=1)
            return V, T, Rp

        Vl, Tl, upd = jax.vmap(node)(st)
        blocks = blocks.at[i0, :r, :].set(upd[:, :r, :])
        blocks = blocks.at[i1, :r, :].set(upd[:, r:, :])
        tree_v.append(Vl)
        tree_t.append(Tl)
        c //= 2
        lev += 1

    out = blocks.reshape(L * h, ncols)[:height]
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
    """Apply one panel's Q (or Q^T) to the rows >= row_offset of X.
    Leaves are ONE vmapped reflector application; the padded rows carry
    zeros in the stored V factors so they never mix with data."""
    lam, r = pf.row_offset, pf.width
    sub = X[lam:, :]
    L, h, _ = pf.leaf_v.shape
    height = sub.shape[0]
    pad = L * h - height
    subp = jnp.pad(sub, ((0, pad), (0, 0))) if pad else sub
    blocks = subp.reshape(L, h, -1)

    def leaf_t_sweep(blk, V, T):
        return apply_block_reflector_left_t(blk, V, T, policy)

    def leaf_n_sweep(blk, V, T):
        VtX = jnp.matmul(V.T, blk, precision=_HI)
        return blk - jnp.matmul(
            V, jnp.matmul(T, VtX, precision=_HI), precision=_HI
        )

    if transpose:
        blocks = jax.vmap(leaf_t_sweep)(blocks, pf.leaf_v, pf.leaf_t)
        blocks = _tree_apply_left(blocks, pf.tree_v, pf.tree_t, r, True, policy)
    else:
        blocks = _tree_apply_left(blocks, pf.tree_v, pf.tree_t, r, False, policy)
        blocks = jax.vmap(leaf_n_sweep)(blocks, pf.leaf_v, pf.leaf_t)
    return X.at[lam:, :].set(blocks.reshape(L * h, -1)[:height])


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
