"""Distributed blocked QR over a row-sharded device mesh.

The reference has no multi-device execution at all (single GPU, ``cudaMemcpy``
only — SURVEY §2.5); this module is the scale-out the north star asks for:
blocked Householder QR of matrices sharded over an ICI mesh axis, e.g.
16384 x 16384 over 8 chips.

Design (TPU-first, communication-avoiding):

  * A is row-sharded: ``P('rows', None)``.  Each panel is factored by TSQR —
    local panel QR per device (``panel_factor``), one ``all_gather`` of the
    tiny (r x r) leaf R factors, and a replicated reduction tree
    (``parallel.tsqr.reduction_tree``).
  * The panel's *implicit full Q* is reconstructed as a single block
    reflector ``H = I - Y S^-1 Y^T`` from the reduced TSQR Q via the
    basis-kernel (Yamamoto) identity: with ``E1`` the first-r-columns
    identity, ``Y = Q_red - E1`` and ``S = I - Q1^T`` (Q1 = top r x r block
    of Q_red, sign-fixed so diag(Q1) <= 0 keeps S well-conditioned),
    ``H E1 = Q_red`` and ``H`` is exactly orthogonal.  This turns the
    trailing-matrix update into

        C <- H^T C = C - Y (S^-T (psum_i Y_i^T C_i))

    ONE ``psum`` of an (r x n_trail) block per panel — instead of a
    reflector-by-reflector tree walk.  Y is zero on rows above the panel, so
    finished R rows are never touched.
  * Q accumulation keeps Q *column*-sharded (``P(None, 'rows')``), so
    ``Q <- Q H = Q - (psum_i Q_i Y_i) S^-1 Y^T`` is also one ``psum``.

Constraint: block_size must divide the per-device row count so each panel's
diagonal block lives on a single device.

References for behavior parity: the panel loop structure mirrors
``dev_mixed_precision_block_qr`` (``Cuda/qr.cu:1049-1226``) with the host
round trips replaced by collectives; the TSQR panel is the completed form of
``python/ca_qr.py``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mixedprecisionblockqr_tpu.ops.cholqr import newton_inv
from mixedprecisionblockqr_tpu.ops.householder import panel_factor
from mixedprecisionblockqr_tpu.ops.policy import DTypePolicy, POLICY_FP32, matmul
from mixedprecisionblockqr_tpu.ops.wy import reduced_q_from_vt
from mixedprecisionblockqr_tpu.parallel.mesh import ROWS_AXIS
from mixedprecisionblockqr_tpu.parallel.tsqr import reduction_tree

_HI = jax.lax.Precision.HIGHEST


def _panel_reflector(
    A_loc: jax.Array,
    lam: int,
    w: int,
    h: int,
    axis: str,
    panel_method: str = "householder",
    square_final: bool = False,
    on_tpu: bool = False,
):
    return _panel_reflector_cols(
        A_loc[:, lam : lam + w], lam, w, h, axis, panel_method, square_final,
        on_tpu,
    )


def _panel_reflector_cols(
    P_cols: jax.Array,
    lam,
    w: int,
    h: int,
    axis: str,
    panel_method: str = "householder",
    square_final: bool = False,
    on_tpu: bool = False,
):
    """Factor panel columns [lam, lam+w) across devices (``P_cols`` already
    sliced; ``lam`` may be a traced scalar in scan mode).

    Returns (Y_loc (h x w), Sinv (w x w, replicated), R_panel (w x w,
    replicated, sign-fixed)).

    panel_method='cholqr2' runs the all-GEMM CholeskyQR2 leaf per device
    (ops/cholqr.py); devices whose rows are entirely above the panel get a
    regularized Gram so the Cholesky stays defined, and their (meaningless)
    leaf factors are masked back to zero before the gather.
    """
    my = jax.lax.axis_index(axis)
    glob = my * h + jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)[:, 0]
    active = glob >= lam

    P_loc = jnp.where(active[:, None], P_cols, 0.0)

    if square_final:
        # SQUARE final panel (m - lam == w, i.e. m == n): the Yamamoto
        # S = I - Q1^T is built from a fully-orthogonal Q1 whose spectrum
        # can touch +1 even after the sign fix (S singular — the
        # ops/cholqr.py::newton_inv breakdown domain; exposed by the
        # offset-axis reflector sweep, round-1 VERDICT missing item 4).
        # The band is only (w x w): gather it, factor EXACTLY with the
        # compact-WY panel — H = I - V T V^T is unconditionally orthogonal
        # — and hand (V_loc, T) back through the same (Y, Sinv) slots
        # (every driver update uses H = I - Y Sinv Y^T).
        allrows = jax.lax.all_gather(P_loc, axis).reshape(-1, w)
        band = jax.lax.dynamic_slice(allrows, (lam, 0), (w, w))
        V, T, Rf = panel_factor(band)
        R_pan = jnp.triu(Rf[:w, :])
        idx = jnp.clip(glob - lam, 0, w - 1)
        in_band = (glob >= lam) & (glob < lam + w)
        V_loc = jnp.where(in_band[:, None], V[idx, :], 0.0)
        return V_loc, T, R_pan

    if panel_method in ("cholqr2", "cholqr2s"):
        from mixedprecisionblockqr_tpu.ops.cholqr import cholesky_qr2

        alive = jnp.any(active).astype(P_loc.dtype)
        # Dead devices (all rows above the panel): identity Gram keeps the
        # Cholesky finite; factors are zeroed below so they contribute
        # nothing to the reduction tree.
        P_reg = P_loc + (1.0 - alive) * jnp.eye(
            P_loc.shape[0], w, dtype=P_loc.dtype
        )
        # 'cholqr2s': shifted first pass (condition capped at ~1e3) — the
        # trailing-corner panels of large square factorizations push
        # cond(Gram) = cond(P)^2 past the plain fp32 Cholesky domain
        # (quality collapse first seen on the 8192^2 scan-mode run,
        # BENCH_NOTES round-3); the shift + extra pass absorb it.
        Q_leaf, R_loc = cholesky_qr2(P_reg, shifted=panel_method == "cholqr2s")
        Q_leaf = Q_leaf * alive
        R_loc = jnp.triu(R_loc) * alive
    else:
        V, T, Rf = panel_factor(P_loc)
        Q_leaf = reduced_q_from_vt(V, T, w)        # (h, w); zero on inactive rows
        R_loc = jnp.triu(Rf[:w, :])

    R_all = jax.lax.all_gather(R_loc, axis)        # (d, w, w) replicated
    F, R_pan = reduction_tree(R_all)               # (d, w, w), (w, w)
    myF = jax.lax.dynamic_index_in_dim(F, my, 0, keepdims=False)
    Q_red_loc = jnp.matmul(Q_leaf, myF, precision=_HI)  # (h, w)

    # Top (w x w) block of the global reduced Q lives on device i0.
    # (lam may be traced in scan mode — all index math stays dynamic-safe.)
    i0, loc = lam // h, lam % h
    cand = jax.lax.dynamic_slice_in_dim(Q_red_loc, loc, w, axis=0)
    Q1 = jax.lax.psum(jnp.where(my == i0, cand, jnp.zeros_like(cand)), axis)

    # Column sign-fix: make diag(Q1) <= 0 so S = I - Q1^T is well-conditioned.
    Dsign = jnp.where(jnp.diag(Q1) > 0, -1.0, 1.0).astype(Q1.dtype)
    Q_red_loc = Q_red_loc * Dsign[None, :]
    Q1 = Q1 * Dsign[None, :]
    R_pan = R_pan * Dsign[:, None]                 # keep Q_red @ R_pan invariant

    # Y = Q_red - E1 (E1 rows live on device i0 only).
    e1_rows = (glob[:, None] - lam) == jax.lax.broadcasted_iota(
        jnp.int32, (h, w), 1
    )
    Y_loc = Q_red_loc - e1_rows.astype(Q_red_loc.dtype)
    S = jnp.eye(w, dtype=Q1.dtype) - Q1.T
    # sigma_max(S) <= 2 by the sign fix, but sigma_min shrinks on squarer
    # panels and Newton under-converges silently (measured on single-chip:
    # aspect-2 panel sigma_min 0.236 -> 5-iter residual 8e-5).  The
    # distributed panels share one program across all lam, so size the
    # chain generously and arm the residual-checked LU fallback — the
    # collectives dominate per-panel cost here anyway.
    if on_tpu:
        # Fused Mosaic chain (ops/pallas/ns.py) — same math, one dispatch
        # per panel instead of ~24; LU fallback semantics preserved.
        from mixedprecisionblockqr_tpu.ops.pallas.ns import ninv_chain

        Xn, nresid = ninv_chain(S, iters=12)
        Sinv = jax.lax.cond(nresid < 1e-3, lambda s: Xn, jnp.linalg.inv, S)
    else:
        Sinv = newton_inv(S, iters=12, check=True)
    return Y_loc, Sinv, R_pan


def _tri_chain_dist(G, iters, omega=True, on_tpu=False):
    """Replicated triangular-NS chain on a psum'd Gram — the per-panel
    factorization core shared by the 1-D and 2-D distributed BGS drivers
    (the fused Mosaic kernel on TPU, the XLA composition off it).
    omega=False on robust passes (pure Newton keeps their calibrated
    floor; the shift already caps the condition — ops/polar.py::
    ns_omega_iters)."""
    if on_tpu:
        from mixedprecisionblockqr_tpu.ops.pallas.ns import ns_chain

        return ns_chain(G, iters=iters, omega=omega)
    from mixedprecisionblockqr_tpu.ops.polar import tri_inv_chol

    X, resid = tri_inv_chol(G, iters=iters, with_resid=True, omega=omega)
    t = jnp.triu(jnp.matmul(X.T, G, precision=_HI))
    return X, t, resid


def _robust_panel_dist(P_loc, psum_gram, r, on_tpu=False):
    """Shifted three-pass scheme on psum'd Grams (ops/polar.py::
    tri_cholqr_robust semantics, distributed): 3 Gram collectives.
    ``psum_gram`` carries the mesh-axis reduction, so the same code
    serves the 1-D and 2-D drivers."""
    from mixedprecisionblockqr_tpu.ops.polar import _spectral_guard

    G = psum_gram(P_loc, P_loc)
    Gs = G + (1e-3 * _spectral_guard(G)) * jnp.eye(r, dtype=jnp.float32)
    if on_tpu:
        from mixedprecisionblockqr_tpu.ops.pallas.ns import ns_chain

        X1, _, _ = ns_chain(Gs, iters=14, omega=False)
        t1 = jnp.matmul(X1.T, Gs, precision=_HI)  # exact X1^{-1}
    else:
        from mixedprecisionblockqr_tpu.ops.polar import tri_inv_chol

        X1 = tri_inv_chol(Gs, iters=14, omega=False)
        t1 = jnp.matmul(X1.T, Gs, precision=_HI)
    Q1 = jnp.matmul(P_loc.astype(jnp.float32), X1, precision=_HI)
    M1 = psum_gram(Q1, Q1)
    X2, t2, _ = _tri_chain_dist(M1, 12, omega=False, on_tpu=on_tpu)
    Q2 = jnp.matmul(Q1, X2, precision=_HI)
    M2 = psum_gram(Q2, Q2)
    if on_tpu:
        from mixedprecisionblockqr_tpu.ops.pallas.ns import ns_chain

        X3, t3, resid = ns_chain(M2, iters=4, refine=True)
    else:
        from mixedprecisionblockqr_tpu.ops.polar import _tri_refine

        X3 = _tri_refine(M2, 4)
        M3 = jnp.matmul(
            X3.T, jnp.matmul(M2, X3, precision=_HI), precision=_HI
        )
        resid = jnp.max(jnp.abs(M3 - jnp.eye(r, dtype=jnp.float32)))
        t3 = jnp.triu(jnp.matmul(X3.T, M2, precision=_HI))
    Qk = jnp.matmul(Q2, X3, precision=_HI)
    t = jnp.triu(jnp.matmul(
        t3, jnp.matmul(t2, t1, precision=_HI), precision=_HI
    ))
    return Qk, t, 0.01 * resid  # robust tier: 1e-2 breakdown threshold


def _dist_bgs_local(
    A_loc: jax.Array,
    B_loc: Optional[jax.Array],
    *,
    m: int,
    n: int,
    block_size: int,
    axis: str,
    policy: DTypePolicy,
    group_panels: int = 4,
    reorth: bool = True,
    on_tpu: bool = False,
):
    """Distributed Block Gram-Schmidt (the single-chip throughput flagship
    ``ops/blockqr.py::_block_qr_bgs`` brought inside ``shard_map`` — round-2
    VERDICT item 5a).

    Every panel keeps FULL height across the mesh, so the whole structure
    survives sharding verbatim:

      * the panel Gram is ``psum_i(P_i^T P_i)`` — ONE (r x r) collective —
        and the triangular-NS chain runs REPLICATED (tiny, r x r; as the
        fused Mosaic kernel on TPU),
      * ``Q_k = P X`` is local (no communication at all),
      * the eager in-group and per-group trailing projections are one
        ``psum`` of the (w x n_trail) coefficient block each — the same
        collective count as the Yamamoto reflector path but with NO
        S-inverse, NO reflector merge and NO Q-update GEMMs,
      * Q materializes by writing column blocks into a row-sharded buffer
        (concatenation), R rows are written directly (replicated).

    ``reorth=True`` ('bgs') re-projects each group's columns against all
    previous Q once at group start (BCGS2) — two extra psum'd GEMMs per
    group, fp32-roundoff-class orthogonality.  Tail panels (last
    max(2, nb//8)) run the shifted three-pass chain on their psum'd Grams
    (3 collectives instead of 1).

    Returns (Qbuf_loc (h, n), R (n, n) replicated, QtB (n, kB) replicated,
    worst_resid).
    """
    h = A_loc.shape[0]
    r = block_size
    nb = n // r
    assert n % r == 0
    mm_t = lambda a, b: matmul(a, b, in_dtype=policy.trailing,
                               accum_dtype=policy.accum)
    # Reorth tier ('bgs'): ALL projections run fp32 HIGHEST — the round-4
    # single-chip isolation showed ANY bf16 single-pass projection in the
    # chain pins the orthogonality floor at ~0.1 regardless of the scrub
    # (round-3 ADVICE item 2).  'bgs1' keeps trailing-precision projections
    # (max throughput).
    mm_p = (
        (lambda a, b: jnp.matmul(
            a.astype(jnp.float32), b.astype(jnp.float32), precision=_HI))
        if reorth else mm_t
    )

    def psum_gram(Xl, Yl):
        # fp32 HIGHEST Gram (the NS chain needs a true-fp32 Gram; the tall
        # projections below stay at the policy's trailing precision).
        return jax.lax.psum(
            jnp.matmul(Xl.T, Yl, precision=_HI), axis
        )

    def tri_chain(G, iters, omega=True):
        return _tri_chain_dist(G, iters, omega=omega, on_tpu=on_tpu)

    def robust_panel(P_loc):
        return _robust_panel_dist(P_loc, psum_gram, r, on_tpu=on_tpu)

    from mixedprecisionblockqr_tpu.ops.polar import tri_iters_for_aspect

    base_iters = tri_iters_for_aspect(m / r)
    worst_resid = jnp.float32(0.0)
    Qbuf = jnp.zeros((h, n), jnp.float32)
    R = jnp.zeros((n, n), jnp.float32)
    kB = B_loc.shape[1] if B_loc is not None else 1
    QtB = jnp.zeros((n, kB), jnp.float32)
    A_loc = A_loc.astype(policy.panel)

    i = 0
    while i < nb:
        lam_g = i * r
        js = list(range(i, min(i + group_panels, nb)))
        g_end = (js[-1] + 1) * r
        if reorth and lam_g > 0:
            # BCGS2 scrub at fp32 HIGHEST regardless of policy.trailing —
            # the scrub must run ABOVE the noise it scrubs (any bf16
            # single-pass projection pins the orth floor at ~0.1; the
            # single-chip round-4 isolation, mirrored here per round-3
            # ADVICE item 2).  Qbuf is already fp32.
            Cg = A_loc[:, lam_g:g_end].astype(jnp.float32)
            Qprev = Qbuf[:, :lam_g]
            C2 = jax.lax.psum(
                jnp.matmul(Qprev.T, Cg, precision=_HI), axis
            )
            A_loc = A_loc.at[:, lam_g:g_end].set(
                (Cg - jnp.matmul(Qprev, C2, precision=_HI)).astype(
                    A_loc.dtype
                )
            )
            R = R.at[:lam_g, lam_g:g_end].add(C2)
        for j in js:
            lam = j * r
            P_loc = A_loc[:, lam : lam + r].astype(jnp.float32)
            if j >= nb - max(2, nb // 8):
                Qk, t, rresid = robust_panel(P_loc)
                worst_resid = jnp.maximum(worst_resid, rresid)
                if reorth and lam > 0:
                    # Post-factorization rescrub — the SHARED D9 helper
                    # (ops/blockqr.py::_rescrub_panel; derivation there
                    # and in docs/ALGORITHMS.md D9): one psum'd projection
                    # of the FINISHED panel + a 4-iteration
                    # refactorization folds exactly
                    # Qk t = q2 (s t) + Qprev (W t).
                    from mixedprecisionblockqr_tpu.ops.blockqr import (
                        _rescrub_panel,
                    )

                    Qk, t, dW, rs = _rescrub_panel(
                        Qbuf[:, :lam], Qk, t, on_tpu=on_tpu,
                        psum_axis=axis,
                    )
                    R = R.at[:lam, lam : lam + r].add(dW)
                    worst_resid = jnp.maximum(worst_resid, rs * rs)
            else:
                if j == 0:
                    # Head panel factors RAW data: correlated inputs give
                    # it an outlier-spectrum Gram (~1e3 cond) the aspect
                    # budget cannot converge — same head boost as the
                    # single-chip drivers (ops/polar.py::tri_head_iters).
                    from mixedprecisionblockqr_tpu.ops.polar import (
                        tri_head_iters,
                    )

                    iters = tri_head_iters(base_iters)
                else:
                    iters = base_iters if j < 0.75 * nb else base_iters + 4
                G = psum_gram(P_loc, P_loc)
                X, t, resid = tri_chain(G, iters)
                Qk = jnp.matmul(P_loc, X, precision=_HI)
                # one-behind: squared = estimated true residual
                worst_resid = jnp.maximum(worst_resid, resid * resid)
            R = R.at[lam : lam + r, lam : lam + r].set(t)
            Qbuf = Qbuf.at[:, lam : lam + r].set(Qk)
            if lam + r < g_end:
                C = A_loc[:, lam + r : g_end]
                G1 = jax.lax.psum(mm_p(Qk.T, C), axis)
                A_loc = A_loc.at[:, lam + r : g_end].set(
                    (C - mm_p(Qk, G1)).astype(A_loc.dtype)
                )
                R = R.at[lam : lam + r, lam + r : g_end].set(G1)
            if B_loc is not None:
                QtB = QtB.at[lam : lam + r, :].set(
                    jax.lax.psum(mm_t(Qk.T, B_loc), axis)
                )
        if g_end < n:
            Qg = Qbuf[:, lam_g:g_end]
            C = A_loc[:, g_end:]
            G1 = jax.lax.psum(mm_p(Qg.T, C), axis)
            A_loc = A_loc.at[:, g_end:].set((C - mm_p(Qg, G1)).astype(A_loc.dtype))
            R = R.at[lam_g:g_end, g_end:].set(G1)
        i = js[-1] + 1

    R = jnp.triu(R)
    from mixedprecisionblockqr_tpu.ops.blockqr import _poison_if_unconverged

    R, Qbuf, QtB = _poison_if_unconverged(worst_resid, R, Qbuf, QtB)
    return Qbuf, R, QtB


def _dist_bgs_scan_local(
    A_loc: jax.Array,
    B_loc: Optional[jax.Array],
    *,
    m: int,
    n: int,
    block_size: int,
    axis: str,
    policy: DTypePolicy,
    reorth: bool = True,
    on_tpu: bool = False,
    group_panels: int = 1,
    reorth_grouped: bool = False,
):
    """Scan-mode distributed Block Gram-Schmidt: ONE compiled panel step
    (the ``_block_qr_bgs_scan`` structure inside shard_map).

    The unrolled dist-BGS driver compiles n/r distinct panel programs; at
    16384^2 that is 128 — unusable.  Here every group of panels shares one
    ``fori_loop`` step:

      * classical-GS projection against the whole (zero-initialized) Q
        buffer — unwritten columns contribute zero coefficients, so ONE
        full-width psum'd GEMM pair per GROUP serves every step (BCGS2 =
        twice); ``group_panels > 1`` divides the dominant Qbuf traffic and
        the full-width collective count by the group factor (the round-4
        16k budget blowout was exactly this per-panel traffic — round-3
        VERDICT item 2), with eager in-group projections on static column
        slices, mirroring the single-chip grouped scan;
      * panels before the robust tail (last ``max(2, nb//8)``) factor
        through the plain triangular-NS chain — 1 (r x r) collective —
        selected by a replicated ``lax.cond``; tail panels run the shifted
        three-pass scheme (3 collectives), which must serve the cond ~1e8
        trailing corner;
      * Q materializes by ``dynamic_update_slice`` into the row-sharded
        buffer: ZERO Q-update GEMMs, which is why this runs ~2.6x fewer
        FLOPs than the Yamamoto scan (no m x m Q accumulation).

    Grouping reorders the same single-pass CGS math, so it serves the
    'bgs1' tier; the 'bgs' reorth tier needs its BCGS2 second pass against
    freshly-written in-group panels too and stays per-panel (g = 1), same
    contract as the single-chip scan driver.  ``reorth_grouped`` (the
    'bgs2' scan tier) keeps the group width WITH the double Qbuf pass:
    the scrub covers every previous group (killing the inter-group CGS
    drift that grows with n/r — the term that broke the 16384^2 fp32
    criterion at 4.0e-3, experiments/r5_dist_cert_cpu.jsonl), while
    in-group drift stays single-pass, bounded by the group width
    (measured 1.6e-4 at 4096^2 g4) — at HALF the 'bgs' tier's Qbuf
    traffic and collective count.  Mirrors the single-chip UNROLLED
    reorth semantics (``_block_qr_bgs``: group-start scrub + eager
    in-group projections).

    Returns (Qbuf_loc (h, n), R (n, n) replicated, QtB, worst_resid-
    poisoned outputs).
    """
    h = A_loc.shape[0]
    r = block_size
    nb = n // r
    assert n % r == 0
    mm_t = lambda a, b: matmul(a, b, in_dtype=policy.trailing,
                               accum_dtype=policy.accum)
    # Reorth tiers ('bgs' per-panel, 'bgs2' grouped): ALL projections run
    # fp32 HIGHEST, mirroring the unrolled dist driver and the single-chip
    # drivers (round-3 ADVICE item 2 / round-4 isolation: ANY bf16
    # single-pass projection pins the orth floor at ~0.1 — a scrub at the
    # noise's own precision scrubs nothing).  'bgs1' keeps
    # trailing-precision projections (max throughput).
    mm_p = (
        (lambda a, b: jnp.matmul(
            a.astype(jnp.float32), b.astype(jnp.float32), precision=_HI))
        if reorth else mm_t
    )

    def psum_gram(Xl, Yl):
        return jax.lax.psum(jnp.matmul(Xl.T, Yl, precision=_HI), axis)

    def robust_panel(P_loc):
        from mixedprecisionblockqr_tpu.ops.polar import _spectral_guard

        if on_tpu:
            from mixedprecisionblockqr_tpu.ops.pallas.ns import ns_chain

            def chain(G, iters, refine=False):
                return ns_chain(G, iters=iters, refine=refine, omega=False)
        else:
            from mixedprecisionblockqr_tpu.ops.polar import (
                _tri_refine,
                tri_inv_chol,
            )

            def chain(G, iters, refine=False):
                if refine:
                    X = _tri_refine(G, iters)
                    M = jnp.matmul(
                        X.T, jnp.matmul(G, X, precision=_HI), precision=_HI
                    )
                    resid = jnp.max(jnp.abs(
                        M - jnp.eye(r, dtype=jnp.float32)))
                else:
                    X, resid = tri_inv_chol(G, iters=iters, with_resid=True,
                                            omega=False)
                t = jnp.triu(jnp.matmul(X.T, G, precision=_HI))
                return X, t, resid

        G = psum_gram(P_loc, P_loc)
        Gs = G + (1e-3 * _spectral_guard(G)) * jnp.eye(r, dtype=jnp.float32)
        X1, _, _ = chain(Gs, 14)
        t1 = jnp.matmul(X1.T, Gs, precision=_HI)
        Q1 = jnp.matmul(P_loc, X1, precision=_HI)
        M1 = psum_gram(Q1, Q1)
        X2, t2, _ = chain(M1, 12)
        Q2 = jnp.matmul(Q1, X2, precision=_HI)
        M2 = psum_gram(Q2, Q2)
        X3, t3, resid = chain(M2, 4, refine=True)
        Qk = jnp.matmul(Q2, X3, precision=_HI)
        t = jnp.triu(jnp.matmul(
            t3, jnp.matmul(t2, t1, precision=_HI), precision=_HI
        ))
        return Qk, t, 0.01 * resid

    def plain_panel(P_loc):
        # Well-conditioned pre-tail panels: ONE Gram collective + the plain
        # NS chain (vs the robust scheme's 3).  One program serves every
        # pre-tail step, so the chain is sized for the WORST of them: the
        # unprojected head panel, whose Gram has an outlier spectrum
        # (~1e3 cond) on correlated inputs (ops/polar.py::tri_head_iters
        # — covers the late-panel base+4 rule too, and the extra dots are
        # noise against the step's Qbuf traffic).
        from mixedprecisionblockqr_tpu.ops.polar import (
            tri_head_iters,
            tri_iters_for_aspect,
        )

        iters = tri_head_iters(tri_iters_for_aspect(m / r))
        G = psum_gram(P_loc, P_loc)
        if on_tpu:
            from mixedprecisionblockqr_tpu.ops.pallas.ns import ns_chain

            X, t, resid = ns_chain(G, iters=iters)
        else:
            from mixedprecisionblockqr_tpu.ops.polar import tri_inv_chol

            X, resid = tri_inv_chol(G, iters=iters, with_resid=True)
            t = jnp.triu(jnp.matmul(X.T, G, precision=_HI))
        Qk = jnp.matmul(P_loc, X, precision=_HI)
        # one-behind correction: squared = estimated true residual
        # (ops/pallas/ns.py::_bgs_group_kernel convention)
        return Qk, t, resid * resid

    q_dtype = policy.q_store or policy.accum
    A_loc = A_loc.astype(policy.panel)
    # Reorth tiers scrub AGAINST Qbuf — it must carry fp32 through the
    # loop (a bf16-resident q_store would cap the scrub at bf16 noise);
    # the compact Q dtype applies on return only.  bgs1 keeps the
    # policy's resident dtype (its Qbuf GEMMs run at trailing precision
    # anyway, and the bf16 residency IS the round-4 traffic cut).
    qbuf_dtype = jnp.float32 if reorth else q_dtype
    Qbuf = jnp.zeros((h, n), qbuf_dtype)
    R = jnp.zeros((n, n), jnp.float32)
    kB = B_loc.shape[1] if B_loc is not None else 1
    QtB = jnp.zeros((n, kB), jnp.float32)
    Bc = B_loc if B_loc is not None else jnp.zeros((h, 1), jnp.float32)

    # Grouping serves the single-pass tier and (reorth_grouped) the
    # inter-group-BCGS2 mid tier; the full 'bgs' tier's per-panel second
    # pass keeps g = 1 (see docstring).
    g = (
        group_panels
        if group_panels > 1 and nb % group_panels == 0
        and (not reorth or reorth_grouped)
        else 1
    )
    gw = g * r
    n_robust = max(2, nb // 8)
    n_steps = nb // g
    # Rescrub coverage mirrors the robust-panel predicate: the corner
    # amplification spans all n_robust tail panels, not just the final
    # group (a final-step-only rescrub misses most of them at nb > 8g,
    # e.g. 16384^2 r=256 g4).
    rescrub_from = n_steps - min(n_steps, -(-n_robust // g))

    def step(k, carry):
        Qbuf, R, QtB, wr = carry
        lam_g = k * gw
        Cg = jax.lax.dynamic_slice(A_loc, (0, lam_g), (h, gw)).astype(
            jnp.float32
        )
        # ONE full-width psum'd projection pass over Qbuf per GROUP
        # (mm_p: fp32 HIGHEST on the reorth tiers, trailing on bgs1).
        C = jax.lax.psum(mm_p(Qbuf.T, Cg), axis)
        Cg = Cg - mm_p(Qbuf, C)
        if reorth:
            C2 = jax.lax.psum(mm_p(Qbuf.T, Cg), axis)
            Cg = Cg - mm_p(Qbuf, C2)
            C = C + C2
        Rcol = C[:n, :]
        for j in range(g):  # static unroll inside the one compiled step
            P = Cg[:, j * r : (j + 1) * r]
            # Replicated predicate (k is the loop index) -> every device
            # takes the same branch; the robust scheme's extra collectives
            # are only paid on tail panels.
            is_tail = (k * g + j) >= (nb - n_robust)
            Qk, t, resid = jax.lax.cond(
                is_tail, robust_panel, plain_panel, P
            )
            wr = jnp.maximum(wr, resid)
            if reorth:
                # Rescrub the robust-corner steps (SHARED D9 helper,
                # ops/blockqr.py::_rescrub_panel — its psum_axis mode;
                # replicated predicate: every device takes the same
                # branch, so the branch collectives stay aligned);
                # whole-run cost ~ceil(n_robust/g) extra Qbuf
                # double-passes.
                from mixedprecisionblockqr_tpu.ops.blockqr import (
                    _rescrub_panel,
                )

                Qk, t, dW, rs = jax.lax.cond(
                    k >= rescrub_from,
                    lambda a: _rescrub_panel(Qbuf, *a, on_tpu=on_tpu,
                                             psum_axis=axis),
                    lambda a: (a[0].astype(jnp.float32),
                               a[1].astype(jnp.float32),
                               jnp.zeros((n, r), jnp.float32),
                               jnp.float32(0.0)),
                    (Qk, t),
                )
                wr = jnp.maximum(wr, rs * rs)
                Rcol = Rcol.at[:, j * r : (j + 1) * r].add(dW)
            row = jnp.asarray(lam_g + j * r)
            jr = jnp.full((), j * r, dtype=row.dtype)
            zero = jnp.zeros((), row.dtype)
            Qbuf = jax.lax.dynamic_update_slice(
                Qbuf, Qk.astype(qbuf_dtype), (zero, row)
            )
            if j + 1 < g:
                # Eager in-group projection (static column slices, one
                # psum of the (r x remaining) coefficient block).
                Ct = Cg[:, (j + 1) * r :]
                G1 = jax.lax.psum(mm_p(Qk.T, Ct), axis)
                Cg = Cg.at[:, (j + 1) * r :].set(Ct - mm_p(Qk, G1))
                Rcol = jax.lax.dynamic_update_slice(
                    Rcol, jnp.concatenate([t, G1], axis=1), (row, jr)
                )
            else:
                Rcol = jax.lax.dynamic_update_slice(Rcol, t, (row, jr))
            if B_loc is not None:
                QtB = jax.lax.dynamic_update_slice(
                    QtB, jax.lax.psum(mm_t(Qk.T, Bc), axis), (row, zero)
                )
        R = jax.lax.dynamic_update_slice(R, Rcol, (0, lam_g))
        return Qbuf, R, QtB, wr

    Qbuf, R, QtB, worst = jax.lax.fori_loop(
        0, nb // g, step, (Qbuf, R, QtB, jnp.float32(0.0))
    )
    # Qbuf leaves in its loop residency (fp32 on the reorth tiers, the
    # policy's compact q_store on bgs1); the PUBLIC boundary
    # (dist_block_qr) owns the returned-Q dtype contract.
    R = jnp.triu(R)
    from mixedprecisionblockqr_tpu.ops.blockqr import _poison_if_unconverged

    R, Qbuf, QtB = _poison_if_unconverged(worst, R, Qbuf, QtB)
    return Qbuf, R, QtB


def _dist_qr_local(
    A_loc: jax.Array,
    Q_loc: Optional[jax.Array],
    B_loc: Optional[jax.Array],
    *,
    m: int,
    n: int,
    block_size: int,
    axis: str,
    policy: DTypePolicy,
    panel_method: str = "householder",
    loop_mode: str = "unroll",
    on_tpu: bool = False,
):
    """SPMD body (inside shard_map): the full panel loop on local shards."""
    h = A_loc.shape[0]
    r = min(block_size, n)
    if h % r != 0 and n > r:
        raise ValueError(
            f"block_size {r} must divide per-device rows {h} (m={m})"
        )
    glob = (
        jax.lax.axis_index(axis) * h
        + jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)[:, 0]
    )
    mm_t = lambda a, b: matmul(a, b, in_dtype=policy.trailing,
                               accum_dtype=policy.accum)
    mm_q = lambda a, b: matmul(a, b, in_dtype=policy.q_update,
                               accum_dtype=policy.accum)

    if loop_mode == "scan":
        # One compiled panel step iterated with lax.fori_loop — for large
        # n/r the unrolled graph would take hours to compile (e.g. 16384^2
        # at r=256 is 64 panels).  Instead of slice-and-scatter bookkeeping,
        # each step applies H^T to the FULL width: finished columns are
        # invariant (Y has no support on their nonzero rows) and the panel
        # columns themselves become [R; 0] — exactly H^T A.  Costs ~1.5x
        # the trailing-only FLOPs; wins whenever compile time or program
        # size dominates.
        if n % r != 0:
            raise ValueError(f"scan mode needs block_size | n ({r} vs {n})")

        def panel_step(k, carry):
            A_loc, Q_loc, B_loc = carry
            lam = k * r
            P_loc = jax.lax.dynamic_slice_in_dim(A_loc, lam, r, axis=1)
            Y, Sinv, _ = _panel_reflector_cols(
                P_loc, lam, r, h, axis, panel_method, on_tpu=on_tpu
            )
            G = jax.lax.psum(mm_t(Y.T, A_loc), axis)
            M = jnp.matmul(Sinv.T, G, precision=_HI)
            A_loc = (A_loc - mm_t(Y, M)).astype(A_loc.dtype)
            if B_loc is not None:
                Gb = jax.lax.psum(mm_t(Y.T, B_loc), axis)
                B_loc = B_loc - mm_t(Y, jnp.matmul(Sinv.T, Gb, precision=_HI))
            if Q_loc is not None:
                QY = jax.lax.psum(mm_q(Q_loc.T, Y), axis)
                Mq = jnp.matmul(QY, Sinv, precision=_HI)
                Q_loc = Q_loc - mm_q(Y, Mq.T)
            return A_loc, Q_loc, B_loc

        dummy = jnp.zeros((1, 1), A_loc.dtype)
        carry0 = (
            A_loc,
            Q_loc if Q_loc is not None else dummy,
            B_loc if B_loc is not None else dummy,
        )

        def panel_step_wrapped(k, carry):
            a, q, b_ = carry
            a, q2, b2 = panel_step(
                k,
                (
                    a,
                    q if Q_loc is not None else None,
                    b_ if B_loc is not None else None,
                ),
            )
            return (
                a,
                q2 if Q_loc is not None else q,
                b2 if B_loc is not None else b_,
            )

        # All but the final panel via the scan; the final panel is square
        # (CholeskyQR-hostile) and runs one static step with Householder
        # leaves — mirroring the single-chip hybrid rule.
        A_loc, Q_out, B_out = jax.lax.fori_loop(
            0, n // r - 1, panel_step_wrapped, carry0
        )
        Q_loc = Q_out if Q_loc is not None else None
        B_loc = B_out if B_loc is not None else None
        lam_last = n - r
        Yl, Sl, _ = _panel_reflector(
            A_loc, lam_last, r, h, axis, "householder",
            square_final=(m - lam_last == r), on_tpu=on_tpu,
        )
        Gl = jax.lax.psum(mm_t(Yl.T, A_loc), axis)
        A_loc = (A_loc - mm_t(Yl, jnp.matmul(Sl.T, Gl, precision=_HI))).astype(
            A_loc.dtype
        )
        if B_loc is not None:
            Gb = jax.lax.psum(mm_t(Yl.T, B_loc), axis)
            B_loc = B_loc - mm_t(Yl, jnp.matmul(Sl.T, Gb, precision=_HI))
        if Q_loc is not None:
            QY = jax.lax.psum(mm_q(Q_loc.T, Yl), axis)
            Q_loc = Q_loc - mm_q(Yl, jnp.matmul(QY, Sl, precision=_HI).T)
        # Zero sub-diagonal rounding residue (the unrolled path writes
        # exact zeros; here triu-mask locally by global row index).
        col = jax.lax.broadcasted_iota(jnp.int32, (h, n), 1)
        A_loc = jnp.where(col >= glob[:, None], A_loc, 0.0)
        return A_loc, Q_loc, B_loc

    for lam in range(0, n, r):
        w = min(r, n - lam)
        # Hybrid rule (same as ops/blockqr.py): CholeskyQR leaves square the
        # condition number, and the final panel of a square matrix is square
        # — fall back to Householder leaves when the global aspect < 2.
        pm = panel_method
        if pm in ("cholqr2", "cholqr2s") and (m - lam) < 2 * w:
            pm = "householder"
        Y, Sinv, R_pan = _panel_reflector(
            A_loc, lam, w, h, axis, pm, square_final=(m - lam == w),
            on_tpu=on_tpu,
        )

        # Write the panel result: rows in [lam, lam+w) <- R_pan; rows below
        # panel <- 0; rows above unchanged.
        idx = jnp.clip(glob - lam, 0, w - 1)
        rvals = R_pan[idx, :]                       # (h, w) gather of R rows
        in_band = (glob >= lam) & (glob < lam + w)
        pan_new = jnp.where(
            in_band[:, None],
            rvals,
            jnp.where((glob >= lam + w)[:, None], 0.0, A_loc[:, lam : lam + w]),
        )
        A_loc = A_loc.at[:, lam : lam + w].set(pan_new.astype(A_loc.dtype))

        # Trailing update: C <- C - Y S^-T (psum Y^T C).
        if lam + w < n:
            C = A_loc[:, lam + w :]
            G = jax.lax.psum(mm_t(Y.T, C), axis)    # (w, ntrail)
            M = jnp.matmul(Sinv.T, G, precision=_HI)
            C = C - mm_t(Y, M)
            A_loc = A_loc.at[:, lam + w :].set(C.astype(A_loc.dtype))

        if B_loc is not None:
            Gb = jax.lax.psum(mm_t(Y.T, B_loc), axis)
            B_loc = B_loc - mm_t(Y, jnp.matmul(Sinv.T, Gb, precision=_HI))

        # Q accumulation (Q column-sharded): Q <- Q - (psum Q_i Y_i) S^-1 Y^T.
        if Q_loc is not None:
            QY = jax.lax.psum(mm_q(Q_loc.T, Y), axis)  # (m, w)? see note
            # Q_loc is (h, m) = rows of Q^T? -- we store Q^T row-sharded so
            # both operands shard the contraction axis; QY = psum(Q_i Y_i).
            M = jnp.matmul(QY, Sinv, precision=_HI)     # (m, w)
            Q_loc = Q_loc - mm_q(Y, M.T)                # (h, m)

    return A_loc, Q_loc, B_loc


@lru_cache(maxsize=None)
def _jitted_dist_qr(
    m: int,
    n: int,
    d: int,
    block_size: int,
    policy: DTypePolicy,
    want_q: bool,
    with_b: bool,
    axis: str,
    mesh_key,
    panel_method: str = "householder",
    loop_mode: str = "unroll",
    on_tpu: bool = False,
):
    mesh = _MESHES[mesh_key]

    def fn(A, Q0, B):
        A_out, Q_out, B_out = _dist_qr_local(
            A,
            Q0 if want_q else None,
            B if with_b else None,
            m=m,
            n=n,
            block_size=block_size,
            axis=axis,
            policy=policy,
            panel_method=panel_method,
            loop_mode=loop_mode,
            on_tpu=on_tpu,
        )
        outs = [A_out]
        outs.append(Q_out if want_q else jnp.zeros((1, 1), A_out.dtype))
        outs.append(B_out if with_b else jnp.zeros((1, 1), A_out.dtype))
        return tuple(outs)

    in_specs = (P(axis, None), P(axis, None), P(axis, None))
    out_specs = (
        P(axis, None),
        P(axis, None) if want_q else P(None, None),
        P(axis, None) if with_b else P(None, None),
    )
    sm = jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )
    return jax.jit(sm)


@lru_cache(maxsize=None)
def _jitted_dist_bgs(
    m: int,
    n: int,
    d: int,
    block_size: int,
    policy: DTypePolicy,
    with_b: bool,
    axis: str,
    mesh_key,
    reorth: bool = True,
    group_panels: int = 4,
    on_tpu: bool = False,
    loop_mode: str = "unroll",
    reorth_grouped: bool = False,
):
    mesh = _MESHES[mesh_key]

    def fn(A, B):
        if loop_mode == "scan":
            Qbuf, R, QtB = _dist_bgs_scan_local(
                A, B if with_b else None, m=m, n=n,
                block_size=block_size, axis=axis, policy=policy,
                reorth=reorth, on_tpu=on_tpu, group_panels=group_panels,
                reorth_grouped=reorth_grouped,
            )
        else:
            Qbuf, R, QtB = _dist_bgs_local(
                A,
                B if with_b else None,
                m=m,
                n=n,
                block_size=block_size,
                axis=axis,
                policy=policy,
                group_panels=group_panels,
                reorth=reorth,
                on_tpu=on_tpu,
            )
        return Qbuf, R, QtB

    # R / QtB are built exclusively from psum results and replicated chain
    # math -> replicated across the mesh axis; Q stays row-sharded.
    sm = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(sm)


# shard_map needs the concrete Mesh; lru_cache needs hashables -> registry.
_MESHES = {}


def _mesh_key(mesh: Mesh):
    key = (tuple(mesh.shape.items()), tuple(d.id for d in mesh.devices.flat))
    _MESHES[key] = mesh
    return key


def dist_block_qr(
    A,
    mesh: Mesh,
    block_size: int = 128,
    policy: DTypePolicy = POLICY_FP32,
    axis: str = ROWS_AXIS,
    mode: str = "reduced",
    b=None,
    panel_method: str = "householder",
    loop_mode: str = "unroll",
    group_panels: int = 4,
    quality: str | None = None,
):
    """Distributed blocked QR of a row-sharded A over ``mesh[axis]``.

    Returns (Q, R) — Q row-sharded (m x m, transposed storage internally),
    R replicated (n x n) — or (R, Q^T b) when ``b`` is given and mode='r'.

    mode: 'reduced' | 'complete' | 'r' (R only, no Q accumulation).
    ``group_panels``: BGS projection-aggregation factor — in scan mode each
    fori step factors a whole group with ONE full-width Qbuf collective
    pass (single-pass 'bgs1' tier only; 'bgs' reorth stays per-panel).
    ``quality``: the same speed/orthogonality ladder as single-chip
    ``qr(quality=...)`` — 'fast' -> bgs1 (single-pass CGS; inter-group
    drift grows with n/r and crosses the fp32 criterion near 16384^2),
    'balanced' -> bgs2 (grouped inter-group BCGS2 — the certified 16384^2
    config: orth 6.0e-7, fp32 roundoff, after the D9 corner-leak rescrub),
    'high' -> bgs (per-panel BCGS2), 'robust' -> householder
    leaves.  Reorth tiers return Q fp32 (see _dist_bgs_scan_local).
    Overrides ``panel_method`` when given.
    """
    if quality is not None:
        from mixedprecisionblockqr_tpu.ops.blockqr import (
            QUALITY_LEVELS,
            _QUALITY_BGS,
        )

        if quality not in QUALITY_LEVELS:
            raise ValueError(
                f"quality must be one of {QUALITY_LEVELS}, got {quality!r}"
            )
        panel_method = _QUALITY_BGS.get(quality, "householder")
        n_ = A.shape[1]
        r_ = min(block_size, n_)
        if (
            panel_method.startswith("bgs")
            and loop_mode == "unroll"
            and n_ % r_ == 0
            and n_ // r_ > 32
        ):
            # Large panel counts: the unrolled driver compiles n/r
            # distinct panel programs (minutes-to-hours over a compile
            # relay) — same guard as resolve_panel_config / the CLI
            # (review finding: library quality= callers didn't get it).
            loop_mode = "scan"
    A = jnp.asarray(A, dtype=policy.panel)
    m, n = A.shape
    d = mesh.shape[axis]
    if m % d:
        raise ValueError(f"rows {m} must divide across {d} devices")
    h = m // d

    if panel_method in ("bgs", "bgs1", "bgs2"):
        # Distributed Block Gram-Schmidt tier (_dist_bgs_local): full-height
        # panels — NO square-leaf hazard (the Gram is global, aspect m/r) —
        # Q by concatenation into a row-sharded buffer.  Same contract as
        # the single-chip tier: r | n, reduced-Q = (m, n).
        # Ladder: 'bgs1' single-pass (grouped), 'bgs2' scan = grouped
        # inter-group BCGS2 (half the 'bgs' Qbuf traffic, kills the drift
        # term that grows with n/r), 'bgs' full per-panel BCGS2.
        if n % min(block_size, n) != 0 or n < 2 * block_size:
            raise ValueError(
                f"dist bgs needs block_size | n and n >= 2*block_size "
                f"(block_size {block_size}, n {n})"
            )
        if mode == "complete" and m != n:
            raise ValueError(
                "dist bgs materializes the reduced Q (m x n); complete-Q "
                "for m > n needs the reflector tier "
                "(panel_method='cholqr2s' or 'householder')"
            )
        sharding = NamedSharding(mesh, P(axis, None))
        A_sh = jax.device_put(A, sharding)
        B = (
            jax.device_put(jnp.asarray(b, policy.accum).reshape(m, -1),
                           sharding)
            if b is not None
            else jax.device_put(jnp.zeros((m, 1), policy.accum), sharding)
        )
        from mixedprecisionblockqr_tpu.ops.blockqr import _on_tpu

        fn = _jitted_dist_bgs(
            m, n, d, min(block_size, n), policy, b is not None, axis,
            _mesh_key(mesh), panel_method in ("bgs", "bgs2"), group_panels,
            _on_tpu(), loop_mode, panel_method == "bgs2",
        )
        Qbuf, R, QtB = fn(A_sh, B)
        if not bool(jnp.isfinite(R[0, 0])):
            # NaN canary (NS under-convergence on hostile data): transparent
            # retry through the robust reflector tier, mirroring block_qr.
            # 'householder' (not cholqr2s — round-7: its leaf Cholesky NaNs
            # on exactly the rank-deficient inputs that poison the BGS
            # tiers, so the old retry returned NaN with no further check).
            out = dist_block_qr(
                A, mesh, block_size=block_size, policy=policy, axis=axis,
                mode=mode, b=b, panel_method="householder",
                loop_mode=loop_mode,
            )
            R_retry = out[1] if isinstance(out, tuple) and mode != "r" else (
                out[0] if isinstance(out, tuple) else out
            )
            if not bool(jnp.all(jnp.isfinite(R_retry))):
                from mixedprecisionblockqr_tpu.utils.checks import (
                    NonFiniteError,
                )

                raise NonFiniteError(
                    "dist_block_qr: non-finite factorization even via "
                    "'householder' — the input likely contains NaN/Inf"
                )
            return out
        if mode == "r":
            return (R, QtB) if b is not None else R
        # Reorth tiers ('bgs'/'bgs2') return Q at accumulation precision —
        # a compact bf16 return would round Q to its ~4.4e-4 storage floor
        # and waste the scrub (see ops/blockqr.py::_block_qr_bgs).
        q_dtype = (
            policy.accum
            if panel_method in ("bgs", "bgs2")
            else (policy.q_store or policy.accum)
        )
        Q = Qbuf.astype(q_dtype)
        out = (Q, R) if mode == "complete" else (Q, R[:n, :])
        return out + ((QtB,) if b is not None else ())

    if panel_method.startswith("cholqr") and h < 2 * min(block_size, n):
        # CholeskyQR leaves square the LEAF condition number; a square
        # (h == r) leaf from the trailing corner is numerically rank-
        # deficient in fp32 and the leaf Cholesky collapses or NaNs
        # (first seen: 8192^2 / 8 devices / block 256 — backward 0.46).
        # Tall leaves (aspect >= 2) keep the leaf Gram inside the fp32
        # domain; raise instead of silently degrading (round-2 VERDICT:
        # no silent coercions).
        raise ValueError(
            f"cholqr leaves need per-device aspect >= 2: {h} rows/device "
            f"vs block_size {block_size}; use block_size <= {h // 2} or "
            "panel_method='householder'"
        )
    want_q = mode in ("reduced", "complete")
    with_b = b is not None

    sharding = NamedSharding(mesh, P(axis, None))
    A = jax.device_put(A, sharding)
    # Q is stored transposed (Q^T, row-sharded) so the contraction in the
    # Q-update shards cleanly; transpose back at the end.
    Q0 = jax.device_put(jnp.eye(m, dtype=policy.accum), sharding)
    B = (
        jax.device_put(
            jnp.asarray(b, policy.accum).reshape(m, -1), sharding
        )
        if with_b
        else jax.device_put(jnp.zeros((m, 1), policy.accum), sharding)
    )

    from mixedprecisionblockqr_tpu.ops.blockqr import _on_tpu

    fn = _jitted_dist_qr(
        m, n, d, block_size, policy, want_q, with_b, axis, _mesh_key(mesh),
        panel_method, loop_mode, _on_tpu(),
    )
    A_out, Qt, B_out = fn(A, Q0, B)
    if with_b:
        # Q^T b is consumed by the replicated triangular solve — gather it.
        B_out = jax.device_put(B_out, NamedSharding(mesh, P()))
    if mode == "complete":
        R = jnp.triu(A_out)
    else:
        # Gather the top n rows to replicated form (slicing a row-sharded
        # array across shard boundaries is ambiguous under eager
        # sharding-in-types; a jit with explicit out_shardings reshards).
        rep = NamedSharding(mesh, P())
        R = jax.jit(
            lambda x: jnp.triu(x[:n, :]), out_shardings=rep
        )(A_out)
    if mode == "r":
        if with_b:
            return R, B_out
        return R
    if mode == "reduced":
        # Top-n rows of the transposed store, re-transposed: Q (m x n),
        # column-sharded.  jit + out_shardings handles the cross-shard slice.
        Q = jax.jit(
            lambda q: q[:n, :].T,
            out_shardings=NamedSharding(mesh, P(None, axis)),
        )(Qt)
    else:
        Q = Qt.T  # stored transposed; column-sharded view
    if with_b:
        return Q, R, B_out
    return Q, R
