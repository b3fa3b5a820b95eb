"""Fused triangular Newton-Schulz chain — the whole panel-inverse iteration
as ONE kernel.

Why: the BGS/polar drivers' per-panel cost is op COUNT, not FLOPs — the
triangular-NS inverse Cholesky (``ops/polar.py::tri_inv_chol``) is ~3 small
matmuls per iteration x 6-14 iterations, and in-context every XLA op costs
~0.7us of dispatch regardless of content (BENCH_NOTES.md round-2 profiling:
the 2048^2 factorization spends ~2/3 of its runtime on these chains).  This
kernel runs the ENTIRE chain — Jacobi scaling, spectral guard, all NS
iterations, the R recovery ``t = triu(X^T G)`` and the convergence residual
— on a VMEM-resident r x r block: one dispatch instead of ~25, with the
per-iteration 128^3 HIGHEST matmuls back-to-back on the MXU.

It also makes iteration count nearly free, so the ill-conditioned tail
panels can simply run a longer chain (+ an in-kernel shift) instead of the
~100-op three-pass ``tri_cholqr_robust`` composition.

This is the same TPU answer as the reference's move of its panel math off
the host (``dev_mixed_precision_block_qr``'s per-panel CPU stall,
``Cuda/qr.cu:1049-1226``) taken one level further: panel -> Gram -> one
fused device op.

Semantics match ``ops/polar.py::tri_inv_chol`` (same update, same seed,
same guard) — exactly with ``fuse_xw=False``; with the default fused X/W
recurrence the match is fp32-roundoff class (the final two iterations
always run the classic form, and the handoff parity test asserts rtol
2e-5).  Oracle-tested against it in interpret mode.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    # fp32 dots inside Mosaic lower to one bf16 MXU pass without HIGHEST
    # (repo numerics rule; see ops/pallas/chol.py::_dot).
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_HI)


def _dot_ta(a, b):
    # a^T @ b without materializing the transpose (contract on axis 0).
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )


# -- shared in-kernel chain pieces ------------------------------------------
# Everything stays 2-D: 1-D (r,) intermediates trip Mosaic relayout bugs on
# 1x128 vectors, and (r,1)<->(1,r) transposes are relayouts too — so the
# diagonal is extracted TWICE (row- and column-shaped masked reductions)
# instead of transposing one of them, and the power-iteration matvecs are
# (r,r)@(r,1) MXU dots.


def _norm2_est(M):
    # Upper estimate of ||M||_2: 1.05 x two power-iteration steps, computed
    # SCALE-NORMALIZED (mirror of ops/polar.py::_spectral_guard): the
    # estimate ||M v1||/||v1|| is scale-invariant, but the unnormalized
    # form overflows fp32 at ||M|| >~ 3e8 (the v1*v1 sum squares ~r*||M||^2
    # values) — Grams of physically-scaled panels (column norm ~1e4+) hit
    # it and the resulting inf/inf NaN'd the whole chain (round 7).
    a = jnp.maximum(jnp.max(jnp.abs(M)), jnp.finfo(jnp.float32).tiny)
    Ms = M * (1.0 / a)
    v0 = jnp.sum(Ms, axis=1, keepdims=True)         # (r, 1)
    v1 = _dot(Ms, v0)
    n1 = jnp.sqrt(jnp.sum(v1 * v1))
    v2 = _dot(Ms, v1 * (1.0 / (n1 + 1e-30)))
    return (1.05 * a) * jnp.sqrt(jnp.sum(v2 * v2))


def _dot_bf16(a, b):
    # Single-pass bf16 MXU dot with fp32 accumulation — ~6x cheaper than a
    # HIGHEST fp32 dot (which lowers to multiple MXU passes).
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _split_bf16(a):
    # Two-term bf16 Dekker split: a ~= hi + lo with |lo| <= ulp_bf16(a)/2,
    # giving ~16 mantissa bits across the pair.
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


# Emulated Precision.HIGH (3-pass bf16, fp32 accumulation) lives INLINE in
# _tri_ns's mid-precision path, which shares the Dekker splits across the
# iteration's three dots — there is deliberately no generic _dot3 helper
# (an earlier one was dead code drifting from the real implementation).


def _fuse_xw_default() -> bool:
    # MPBQR_NO_FUSE_XW=1 forces the classic 3-dot iteration everywhere —
    # the A/B control for timing/parity experiments.  Resolved per CALL in
    # the public wrappers (ns_chain / panel_qr_fused / bgs_group_fused) so
    # the resolved bool is a static jit argument — part of the cache key —
    # and an in-process flip takes effect without clearing jit caches.
    return os.environ.get("MPBQR_NO_FUSE_XW") != "1"


def _tri_ns(G, iters, rows, cols, eye, refine=False, final_exact=False,
            cheap_iters=0, mid_iters=0, omega=True, fuse_xw=True):
    """The triangular-NS chain on an SPD G (exact ``tri_inv_chol``
    semantics).  Returns (X, E) with E the last iteration's correction —
    one step BEHIND the final X (free), or, with ``final_exact``, the true
    post-loop residual ``I - X^T G X`` (2 extra r x r matmuls).  The exact
    form matters when E feeds _poison_if_unconverged: early NS convergence
    is slow-then-quadratic, so the one-behind value can over-report by
    orders of magnitude (measured 2.2e-2 one-behind vs < 1e-4 final on a
    cond-1e4 robust tail) and would falsely poison healthy panels.

    Fused X/W recurrence (round-9 dot-count lever): the classic iteration
    issues three dependent r x r dots (W = G X, M = X^T W, X += om X C).
    But X' = X (I + om C) implies W' = G X' = W (I + om C) — W transforms
    by the SAME right factor — so X and W stack into one (2r, r) buffer S
    updated by ONE (2r, r) x (r, r) dot: two MXU ops per iteration instead
    of three at identical FLOPs (the drivers are in-kernel issue-bound on
    these dots, BENCH_NOTES round 8).  The recurrence lets W drift from
    G X by the accumulated per-step rounding, so the FINAL two iterations
    always run the classic form with a fresh W = G X: the chain is
    self-correcting (X <- X(I + C) contracts toward X^T G X = I from
    wherever X sits), and two fresh quadratic steps pin the converged
    floor exactly as before — same structure as the chain_mid precision
    split, applied to the dependency graph instead of the MXU passes."""
    if refine:
        # G already near identity — no Jacobi scaling / guard, X0 = I.
        X = eye
        W = G                                  # W0 = G X0 = G, free
    else:
        diag_keep = jnp.where(rows == cols, G, 0.0)
        tiny = jnp.finfo(jnp.float32).tiny
        dcol = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(diag_keep, axis=1, keepdims=True), tiny)
        )                                                # (r, 1)
        drow = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(diag_keep, axis=0, keepdims=True), tiny)
        )                                                # (1, r)
        M0 = G * dcol * drow
        scale = jax.lax.rsqrt(_norm2_est(M0))
        X = jnp.where(rows == cols, drow * scale, 0.0)
        # X0 is diagonal, so W0 = G X0 is a COLUMN scaling of G — a VPU
        # broadcast multiply, no MXU dot.
        W = G * (drow * scale)

    # Statically unrolled: a fori_loop's (r, r) carries cost ~1us/iteration
    # of VMEM copies in Mosaic (measured: 8us at 6 iters vs ~0.3us of MXU
    # work); iters is always a static Python int here.
    # The iteration is SELF-CORRECTING: X <- X(I + C) drives X^T G X -> I
    # from wherever the current X sits, so the first ``cheap_iters`` steps
    # can run single-pass bf16 (6x cheaper on the MXU) and only the FINAL
    # HIGHEST steps set the converged accuracy (bf16 steps reach the
    # ~2^-8 residual class; two quadratic HIGHEST steps take 4e-3 ->
    # ~1e-5 -> roundoff).  The convergence residual still reflects the
    # HIGHEST tail, and the drivers' poison canary guards the scheme on
    # hostile spectra.
    # Precision tiers per iteration: 'cheap' = single-pass bf16 (2^-8 —
    # NaN'd on chip in round-4, never default), 'mid' = emulated HIGH
    # (3-pass bf16 Dekker split, ~2^-16 — the round-5 lever: half of
    # HIGHEST's 6 MXU passes on the early, self-correcting iterations),
    # else HIGHEST.  The mid path shares splits across the iteration's
    # three dots (X feeds two of them; G's split hoists out of the loop).
    if mid_iters > 0:
        Gh, Gl = _split_bf16(G)
    # Omega schedule (ops/polar.py::ns_omega_iters parity): the early
    # iterations over-relax the correction (X <- X + 1.5 X C) — 3.06x/iter
    # small-eigenvalue escape instead of 2.25x at identical dot count,
    # widening the cond(G) basin for structured panels.  omega = 1.5 (not
    # 2) and capped at 4: the fixed point contracts at |1 - omega| per
    # iteration, so omega = 2 leaves converged eigenvalues oscillating
    # (measured fp32 floor regression + robust-chain NaN divergence; see
    # ns_omega_iters).  Refine chains skip it (spectrum already at 1),
    # and the robust three-pass composition passes omega=False — its
    # shift already caps the condition (escape is not its constraint)
    # and pure-Newton passes keep the round-4-calibrated floor exactly.
    n_om = 0 if (refine or not omega) else min(4, max(0, iters - 4))
    # Fused-recurrence extent: all but the final two iterations carry
    # W = G X by the stacked right-multiplication (see docstring); the
    # final two run classic with a fresh W to pin the converged floor.
    r = G.shape[0]
    # fuse_xw=False forces the classic 3-dot iteration everywhere (the A/B
    # control, threaded as a static jit arg from the public wrappers).
    n_fused = max(0, iters - 2) if fuse_xw else 0
    S = jnp.concatenate([X, W], axis=0) if n_fused > 0 else None
    E = eye
    dn = (((0,), (0,)), ((), ()))
    bf = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    bf_ta = lambda a, b: jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32)
    for it in range(iters):
        om = 1.5 if it < n_om else 1.0
        cheap = it < cheap_iters
        mid = not cheap and it < mid_iters
        if it == n_fused and n_fused > 0:
            X = S[:r]                       # hand off to the classic tail
        if it < n_fused:
            if cheap:
                M = bf_ta(S[:r].astype(jnp.bfloat16),
                          S[r:].astype(jnp.bfloat16))
                E = eye - M
                C = (jnp.where(cols > rows, E, 0.0)
                     + jnp.where(rows == cols, E, 0.0) * 0.5)
                S = S + om * _dot_bf16(S, C)
            elif mid:
                Sh, Sl = _split_bf16(S)
                M = (bf_ta(Sh[:r], Sh[r:]) + bf_ta(Sh[:r], Sl[r:])
                     + bf_ta(Sl[:r], Sh[r:]))
                E = eye - M
                C = (jnp.where(cols > rows, E, 0.0)
                     + jnp.where(rows == cols, E, 0.0) * 0.5)
                Ch, Cl = _split_bf16(C)
                S = S + om * (bf(Sh, Ch) + bf(Sh, Cl) + bf(Sl, Ch))
            else:
                M = _dot_ta(S[:r], S[r:])
                E = eye - M
                C = (jnp.where(cols > rows, E, 0.0)
                     + jnp.where(rows == cols, E, 0.0) * 0.5)
                S = S + om * _dot(S, C)
        elif cheap:
            W = _dot_bf16(G, X)
            M = jax.lax.dot_general(
                X.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            E = eye - M
            C = (jnp.where(cols > rows, E, 0.0)
                 + jnp.where(rows == cols, E, 0.0) * 0.5)
            X = X + om * _dot_bf16(X, C)
        elif mid:
            Xh, Xl = _split_bf16(X)
            W = bf(Gh, Xh) + bf(Gh, Xl) + bf(Gl, Xh)
            Wh, Wl = _split_bf16(W)
            M = bf_ta(Xh, Wh) + bf_ta(Xh, Wl) + bf_ta(Xl, Wh)
            E = eye - M
            C = (jnp.where(cols > rows, E, 0.0)
                 + jnp.where(rows == cols, E, 0.0) * 0.5)
            Ch, Cl = _split_bf16(C)
            X = X + om * (bf(Xh, Ch) + bf(Xh, Cl) + bf(Xl, Ch))
        else:
            W = _dot(G, X)
            M = _dot_ta(X, W)
            E = eye - M
            C = (jnp.where(cols > rows, E, 0.0)
                 + jnp.where(rows == cols, E, 0.0) * 0.5)
            X = X + om * _dot(X, C)
    if final_exact:
        E = eye - _dot_ta(X, _dot(G, X))
    return X, E


def _ns_kernel(g_ref, x_ref, t_ref, resid_ref, *, r: int, iters: int,
               shift: float, refine: bool, chain_mid: bool, omega: bool,
               fuse_xw: bool):
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    eye = (rows == cols).astype(jnp.float32)
    G = g_ref[:]
    if shift:
        # G + s||G|| I caps the effective condition number so a fixed
        # chain converges for any input (ops/polar.py::tri_cholqr_robust
        # pass 1).
        G = G + (shift * _norm2_est(G)) * eye
    # refine chains close the robust compositions and their E feeds the
    # poison canary -> report the exact post-loop residual there; they
    # never run chain_mid (their output error IS the converged accuracy).
    X, E = _tri_ns(G, iters, rows, cols, eye, refine=refine,
                   final_exact=refine,
                   mid_iters=max(0, iters - 2)
                   if chain_mid and not refine else 0,
                   omega=omega, fuse_xw=fuse_xw)
    x_ref[:] = X
    # X^{-1} = X^T G at convergence — R recovered with no solve.
    t_ref[:] = jnp.where(cols >= rows, _dot_ta(X, G), 0.0)
    resid_ref[0, 0] = jnp.max(jnp.abs(E))


def ns_chain(
    G: jax.Array,
    iters: int = 10,
    shift: float = 0.0,
    refine: bool = False,
    chain_mid: bool = False,
    omega: bool = True,
    fuse_xw: Optional[bool] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused triangular-NS inverse Cholesky of an SPD Gram ``G`` (r x r).

    Returns ``(X, t, resid)``: upper-triangular X with ``X^T G' X ~= I``
    (G' = G + shift*||G|| I when ``shift`` > 0), ``t = triu(X^T G')`` (the
    exact inverse of X at convergence), and ``resid = max|I - X^T G' X|``
    from the LAST iteration's correction (one step conservative, free).

    ``refine=True`` runs the no-scaling identity-seeded variant for Grams
    already near I (``_tri_refine`` parity).  ``fuse_xw=False`` forces the
    classic 3-dot NS iteration (A/B control; default from
    MPBQR_NO_FUSE_XW, resolved per call — see ``_fuse_xw_default``).
    """
    if fuse_xw is None:
        fuse_xw = _fuse_xw_default()
    return _ns_chain_jit(G, iters, shift, refine, chain_mid, omega,
                         fuse_xw, interpret)


@functools.partial(
    jax.jit, static_argnames=("iters", "shift", "refine", "chain_mid",
                              "omega", "fuse_xw", "interpret")
)
def _ns_chain_jit(
    G: jax.Array,
    iters: int,
    shift: float,
    refine: bool,
    chain_mid: bool,
    omega: bool,
    fuse_xw: bool,
    interpret: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    r = G.shape[0]
    kernel = functools.partial(
        _ns_kernel, r=r, iters=iters, shift=shift, refine=refine,
        chain_mid=chain_mid, omega=omega, fuse_xw=fuse_xw,
    )
    X, t, resid = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r, r), jnp.float32),
            jax.ShapeDtypeStruct((r, r), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            # (1,1) scalar output lives in SMEM (Mosaic cannot store
            # scalars to VMEM).
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(G.astype(jnp.float32))
    return X, t, resid[0, 0]


def _ninv_kernel(s_ref, x_ref, resid_ref, *, r: int, iters: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    eye = (rows == cols).astype(jnp.float32)
    S = s_ref[:]
    X = (2.0 / 3.0) * eye  # minimax scalar seed for sigma(S) in [1, 2]

    # Statically unrolled (see _tri_ns: fori carries cost ~1us/iter).
    for _ in range(iters):
        X = _dot(X, 2.0 * eye - _dot(S, X))
    x_ref[:] = X
    resid_ref[0, 0] = jnp.max(jnp.abs(eye - _dot(S, X)))


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def ninv_chain(
    S: jax.Array, iters: int = 6, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Fused general Newton-Schulz inverse — ``ops/cholqr.py::newton_inv``
    (X0 = (2/3)I, X <- X(2I - S X)) as one kernel dispatch, for the
    Yamamoto S whose spectrum the sign convention pins to [1, 2].

    Returns ``(X, resid)`` with ``resid = max|I - S X|`` of the FINAL
    iterate (newton_inv's ``check`` recomputes exactly this); callers arm
    their own fallback on it (a lax.cond with captured m x m buffers costs
    ~200us on TPU — ops/blockqr.py::_poison_if_unconverged discussion).
    """
    r = S.shape[0]
    kernel = functools.partial(_ninv_kernel, r=r, iters=iters)
    X, resid = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r, r), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(S.astype(jnp.float32))
    return X, resid[0, 0]


def _panel_qr_kernel(p_ref, q_ref, t_ref, resid_ref, *, m: int, r: int,
                     iters: int, gram_hi: bool, robust: bool,
                     chain_mid: bool, fuse_xw: bool):
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    eye = (rows == cols).astype(jnp.float32)
    # Mosaic supports only HIGHEST/DEFAULT dot precision in-kernel
    # (NotImplementedError on HIGH, measured) — so the mixed policy's
    # 3-pass-bf16 Gram is promoted to HIGHEST here: ~1us extra on a
    # 2048x128 panel and strictly tighter than the XLA path it replaces.
    del gram_hi
    gprec = _HI

    def gram(a):  # a^T a
        return jax.lax.dot_general(
            a, a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=gprec,
        )

    P = p_ref[:]
    G = gram(P)
    mid = (lambda it: max(0, it - 2)) if chain_mid else (lambda it: 0)
    if robust:
        # Shifted three-pass scheme entirely in VMEM (ops/polar.py::
        # tri_cholqr_robust): pass 1 on the shifted Gram (condition capped
        # -> 14 iterations converge for any input; t1 = X1^{-1} EXACTLY at
        # convergence so reconstruction is preserved), passes 2-3 on the
        # fresh Grams of the explicit products, absorbing the shift bias.
        Gs = G + (1e-3 * _norm2_est(G)) * eye
        X1, _ = _tri_ns(Gs, 14, rows, cols, eye, mid_iters=mid(14),
                        omega=False, fuse_xw=fuse_xw)
        t1 = _dot_ta(X1, Gs)
        Q1 = jnp.dot(P, X1, preferred_element_type=jnp.float32,
                     precision=_HI)
        M1 = gram(Q1)
        X2, _ = _tri_ns(M1, 12, rows, cols, eye, mid_iters=mid(12),
                        omega=False, fuse_xw=fuse_xw)
        t2 = _dot_ta(X2, M1)
        Q2 = jnp.dot(Q1, X2, preferred_element_type=jnp.float32,
                     precision=_HI)
        M2 = gram(Q2)
        X3, E = _tri_ns(M2, 4, rows, cols, eye, refine=True,
                        final_exact=True, fuse_xw=fuse_xw)
        t3 = _dot_ta(X3, M2)
        q_ref[:] = jnp.dot(Q2, X3, preferred_element_type=jnp.float32,
                           precision=_HI)
        t_ref[:] = jnp.where(cols >= rows, _dot(t3, _dot(t2, t1)), 0.0)
        resid_ref[0, 0] = jnp.max(jnp.abs(E))
    else:
        X, E = _tri_ns(G, iters, rows, cols, eye, mid_iters=mid(iters),
                       fuse_xw=fuse_xw)
        q_ref[:] = jnp.dot(P, X, preferred_element_type=jnp.float32,
                           precision=gprec)
        t_ref[:] = jnp.where(cols >= rows, _dot_ta(X, G), 0.0)
        resid_ref[0, 0] = jnp.max(jnp.abs(E))


def panel_qr_fused(
    P: jax.Array,
    iters: int = 10,
    gram_hi: bool = True,
    robust: bool = False,
    chain_mid: bool = False,
    fuse_xw: Optional[bool] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """The ENTIRE panel factorization as one kernel: Gram, NS chain(s),
    ``Q = P X`` and ``t`` — P rides VMEM end-to-end (m*r*4*2 bytes; the
    blocked drivers keep m <= 8192, r <= 256 well inside the 16 MB budget).

    ``robust=True`` runs the shifted three-pass scheme (``tri_cholqr_
    robust`` parity) — one dispatch instead of 3 kernels + 7 GEMMs.
    ``gram_hi`` is accepted for signature parity with the XLA path but
    both settings run the Gram at HIGHEST in-kernel (Mosaic has no HIGH
    dot precision; HIGHEST is strictly tighter and ~1us at r=128).
    Returns (Q (m,r), t (r,r), resid).
    """
    if fuse_xw is None:
        fuse_xw = _fuse_xw_default()
    return _panel_qr_fused_jit(P, iters, gram_hi, robust, chain_mid,
                               fuse_xw, interpret)


@functools.partial(
    jax.jit, static_argnames=("iters", "gram_hi", "robust", "chain_mid",
                              "fuse_xw", "interpret")
)
def _panel_qr_fused_jit(
    P: jax.Array,
    iters: int,
    gram_hi: bool,
    robust: bool,
    chain_mid: bool,
    fuse_xw: bool,
    interpret: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    m, r = P.shape
    kernel = functools.partial(
        _panel_qr_kernel, m=m, r=r, iters=iters, gram_hi=gram_hi,
        robust=robust, chain_mid=chain_mid, fuse_xw=fuse_xw,
    )
    Q, t, resid = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, r), jnp.float32),
            jax.ShapeDtypeStruct((r, r), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        # Robust chains hold ~5 live m x r fp32 intermediates ON TOP of
        # the P input and Q output blocks; past the 16 MB Mosaic
        # scoped-vmem default raise the per-kernel limit like
        # bgs_group_fused — previously this kernel got no lift and large
        # fused robust panels failed relay compile opaquely (review
        # finding; round-8: the 5x-only estimate still OOM'd robust
        # panels at m=4096 — 10.5 MB of temps + 4 MB in/out over the
        # stack — so the estimate now counts in/out too).
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if m * r * 4 * (7 if robust else 4) > 12 * 2**20
            else None
        ),
        interpret=interpret,
    )(P.astype(jnp.float32))
    return Q, t, resid[0, 0]


def _tri_ns_panel(P, iters, rows, cols, eye, robust, bf16_dots,
                  chain_cheap=False, chain_mid=False, mid_final=2,
                  robust_iters=(14, 12, 4), fuse_xw=True):
    """One panel's factorization INSIDE a kernel: returns (Qk, t, resid).

    ``bf16_dots``: the tall (m x r) products (Gram, Q = P X) run as
    single-pass bf16 MXU dots — the mixed policy's trailing precision;
    the r x r NS chain itself always runs fp32 HIGHEST.  The factorization
    identity Q t = (P X)(X^{-1}) holds to NS-residual accuracy regardless
    of the Gram's own rounding, so backward error stays in the policy's
    2^-8 class (panel orthogonality picks up the Gram noise; the BGS
    quality ladder already budgets for that tier).
    """
    def tall_dot_ta(a, b):
        if bf16_dots:
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )

    def tall_dot(a, b):
        if bf16_dots:
            return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=_HI)

    G = tall_dot_ta(P, P)
    # chain_mid: all but the final ``mid_final`` iterations of each
    # non-refine chain run at emulated HIGH (3-pass bf16) — the
    # refine/final iterations set the converged accuracy at HIGHEST, the
    # early ones only steer.
    mid = lambda it: max(0, it - mid_final) if chain_mid else 0
    if robust:
        i1, i2, i3 = robust_iters
        Gs = G + (1e-3 * _norm2_est(G)) * eye
        X1, _ = _tri_ns(Gs, i1, rows, cols, eye, mid_iters=mid(i1),
                        omega=False, fuse_xw=fuse_xw)
        t1 = _dot_ta(X1, Gs)
        Q1 = tall_dot(P, X1)
        M1 = tall_dot_ta(Q1, Q1)
        X2, _ = _tri_ns(M1, i2, rows, cols, eye, mid_iters=mid(i2),
                        omega=False, fuse_xw=fuse_xw)
        t2 = _dot_ta(X2, M1)
        Q2 = tall_dot(Q1, X2)
        M2 = tall_dot_ta(Q2, Q2)
        X3, E = _tri_ns(M2, i3, rows, cols, eye, refine=True,
                        final_exact=True, fuse_xw=fuse_xw)
        t3 = _dot_ta(X3, M2)
        Qk = tall_dot(Q2, X3)
        t = jnp.where(cols >= rows, _dot(t3, _dot(t2, t1)), 0.0)
        # Final-pass correction residual max|I - X3^T M2 X3|: measures how
        # well the LAST chain inverted ITS OWN Gram — independent of the
        # bf16 Gram's rounding (X3 solves the M2 problem, noisy or not), so
        # it stays ~fp32-roundoff when converged under bf16_dots, and blows
        # up exactly when an upstream pass under-converged (M2 far from I,
        # 4 refine iterations cannot recover).  The 0.0 placeholder made
        # tail-panel breakdowns invisible to _poison_if_unconverged
        # (round-2 VERDICT weak item 5).
        return Qk, t, jnp.max(jnp.abs(E))
    # chain_cheap: all but the final 2 iterations in single-pass bf16
    # (kept as a negative-result control; it NaN-poisons on chip).
    X, E = _tri_ns(G, iters, rows, cols, eye,
                   cheap_iters=max(0, iters - 2) if chain_cheap else 0,
                   mid_iters=mid(iters), fuse_xw=fuse_xw)
    Qk = tall_dot(P, X)
    t = jnp.where(cols >= rows, _dot_ta(X, G), 0.0)
    return Qk, t, jnp.max(jnp.abs(E))


def _robust_spill(q_ref, c0, r, rows, cols, eye, bf16_dots, chain_mid,
                  mid_final, robust_iters, fuse_xw=True):
    """The shifted three-pass chain with STORE-BACK: each pass's tall
    product (Q1, Q2, Qk) overwrites the panel's own slot in the aliased
    group buffer instead of living as a fresh m x r VMEM temporary.  Same
    math as ``_tri_ns_panel(robust=True)`` (loads round-trip through fp32
    VMEM, value-identical); the point is scoped-VMEM liveness — the
    measured 19.12 MB at m=4096/g4 is dominated by the robust chain's
    ~5 live m x r intermediates, and spilling them through the buffer is
    what lets the group kernel past the m <= 3072 cap."""
    def tall_dot_ta(a, b):
        if bf16_dots:
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )

    def tall_dot(a, b):
        if bf16_dots:
            return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=_HI)

    i1, i2, i3 = robust_iters
    mid = (lambda it: max(0, it - mid_final)) if chain_mid else (lambda it: 0)
    sl = slice(c0, c0 + r)
    P = q_ref[:, sl]
    G = tall_dot_ta(P, P)
    Gs = G + (1e-3 * _norm2_est(G)) * eye
    X1, _ = _tri_ns(Gs, i1, rows, cols, eye, mid_iters=mid(i1), omega=False,
                    fuse_xw=fuse_xw)
    t1 = _dot_ta(X1, Gs)
    q_ref[:, sl] = tall_dot(P, X1)          # Q1 overwrites P
    Q1 = q_ref[:, sl]
    M1 = tall_dot_ta(Q1, Q1)
    X2, _ = _tri_ns(M1, i2, rows, cols, eye, mid_iters=mid(i2), omega=False,
                    fuse_xw=fuse_xw)
    t2 = _dot_ta(X2, M1)
    q_ref[:, sl] = tall_dot(Q1, X2)         # Q2 overwrites Q1
    Q2 = q_ref[:, sl]
    M2 = tall_dot_ta(Q2, Q2)
    X3, E = _tri_ns(M2, i3, rows, cols, eye, refine=True, final_exact=True,
                    fuse_xw=fuse_xw)
    t3 = _dot_ta(X3, M2)
    q_ref[:, sl] = tall_dot(Q2, X3)         # final Qk in place
    t = jnp.where(cols >= rows, _dot(t3, _dot(t2, t1)), 0.0)
    return t, jnp.max(jnp.abs(E))


def _group_loop(q_ref, rg_ref, rows, cols, eye, *, r: int, g: int,
                iters: tuple, robust: tuple, bf16_dots: bool,
                bf16_gram: bool, chain_cheap: bool, chain_mid: bool,
                mid_final: int, robust_iters: tuple, tail_spill: bool,
                fuse_xw: bool):
    """The shared in-kernel BGS group body: g sequential panel
    factorizations + eager in-group projections over the aliased
    ``q_ref`` buffer (columns already scrubbed against previous groups).
    Returns the worst normalized NS residual.  Used by both
    ``_bgs_group_kernel`` and the project-on-entry variant."""
    worst = jnp.float32(0.0)

    def proj_dots(Qk, C):
        if bf16_dots:
            G1 = jax.lax.dot_general(
                Qk.astype(jnp.bfloat16), C.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return G1, jnp.dot(
                Qk.astype(jnp.bfloat16), G1.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        G1 = jax.lax.dot_general(
            Qk, C, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )
        return G1, jnp.dot(Qk, G1, preferred_element_type=jnp.float32,
                           precision=_HI)

    for j in range(g):
        c0 = j * r
        if robust[j] and tail_spill:
            t, resid = _robust_spill(
                q_ref, c0, r, rows, cols, eye, bf16_gram, chain_mid,
                mid_final, robust_iters, fuse_xw=fuse_xw,
            )
            worst = jnp.maximum(worst, resid * 0.01)
            rg_ref[c0 : c0 + r, c0 : c0 + r] = t
            Qk = q_ref[:, c0 : c0 + r]
            if j + 1 < g:
                C = q_ref[:, c0 + r :]
                G1, PG = proj_dots(Qk, C)
                q_ref[:, c0 + r :] = C - PG
                rg_ref[c0 : c0 + r, c0 + r :] = G1
            continue
        P = q_ref[:, c0 : c0 + r]
        Qk, t, resid = _tri_ns_panel(
            P, iters[j], rows, cols, eye, robust[j], bf16_gram,
            chain_cheap=chain_cheap, chain_mid=chain_mid,
            mid_final=mid_final, robust_iters=robust_iters,
            fuse_xw=fuse_xw,
        )
        # Residual convention (ops/blockqr.py::_poison_if_unconverged):
        # robust chains report the EXACT final residual with a looser
        # healthy range (final orthogonality ~1e-3 at the edge of the
        # fp32-Gram domain is correct behavior, breakdown is >= 1e-1) —
        # pre-scaled by 1e-2 so the shared 1e-4 tol means 1e-2 for them.
        # Plain chains report the free ONE-BEHIND correction, which lags
        # the final quadratic step by its square root (measured: 1.3e-4
        # one-behind vs 2e-7 true on a converged cond-1e3 panel — a false
        # trip); its SQUARE estimates the true residual, and a stalled
        # chain (e.g. 6e-2 stuck) still trips at 3.6e-3 >> tol.
        worst = jnp.maximum(
            worst, resid * 0.01 if robust[j] else resid * resid
        )
        q_ref[:, c0 : c0 + r] = Qk
        rg_ref[c0 : c0 + r, c0 : c0 + r] = t
        if j + 1 < g:
            # Eager projection of the group's remaining columns in ONE
            # wide dot pair — r-wide chunked projections were tried to cut
            # temporary liveness and measured 18% SLOWER at 2048 g8
            # (narrow sequential dots drain the MXU pipeline) while still
            # not fitting m = 4096 (scoped-vmem OOM: 19.12M vs the 16M
            # stack limit, dominated by the robust tail chain's m x r
            # intermediates) — hence the driver's m <= 3072 group cap.
            C = q_ref[:, c0 + r :]
            G1, PG = proj_dots(Qk, C)
            q_ref[:, c0 + r :] = C - PG
            rg_ref[c0 : c0 + r, c0 + r :] = G1
    return worst


def _bgs_group_kernel(pg_ref, q_ref, rg_ref, resid_ref, *, m: int, r: int,
                      g: int, iters: tuple, robust: tuple, bf16_dots: bool,
                      bf16_gram: bool, chain_cheap: bool, chain_mid: bool,
                      mid_final: int, robust_iters: tuple,
                      tail_spill: bool, fuse_xw: bool):
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    eye = (rows == cols).astype(jnp.float32)
    rg_ref[:] = jnp.zeros_like(rg_ref)
    # q is input_output_aliased onto pg (same buffer, distinct refs) —
    # this seed copy is a self-copy there and a real one in interpret mode.
    q_ref[:] = pg_ref[:]
    resid_ref[0, 0] = _group_loop(
        q_ref, rg_ref, rows, cols, eye, r=r, g=g, iters=iters,
        robust=robust, bf16_dots=bf16_dots, bf16_gram=bf16_gram,
        chain_cheap=chain_cheap, chain_mid=chain_mid, mid_final=mid_final,
        robust_iters=robust_iters, tail_spill=tail_spill, fuse_xw=fuse_xw,
    )


def _bgs_group_proj_kernel(pg_ref, qp_ref, q_ref, rp_ref, rg_ref, resid_ref,
                           *, m: int, r: int, g: int, p: int, iters: tuple,
                           robust: tuple, bf16_dots: bool, bf16_gram: bool,
                           chain_cheap: bool, chain_mid: bool,
                           mid_final: int, robust_iters: tuple,
                           tail_spill: bool, fuse_xw: bool):
    """Project-on-entry group kernel (round-10 headline lever): scrub this
    group's RAW columns against ALL previous groups' Q inside the kernel
    (block-classical Gram-Schmidt form: C = P - Qprev (Qprev^T P)), then
    run the shared group body on the scrubbed buffer.

    Replaces the driver's inter-group XLA projection GEMM pair — the
    trailing carry never round-trips HBM between groups and the two
    dispatch boundaries disappear.  The scrub runs at the same precision
    as the XLA ``mm_t`` it replaces (single-pass bf16 under bf16-trailing
    policies, fp32 HIGHEST otherwise); the coefficient block
    ``Rprev = Qprev^T P`` is written out for the R assembly exactly like
    the XLA path's G1 rows.  This is the TPU answer to the reference's
    per-panel trailing update (``Cuda/qr.cu:1098``) taken one level
    further: group -> scrub -> factorization in one fused program.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    eye = (rows == cols).astype(jnp.float32)
    rg_ref[:] = jnp.zeros_like(rg_ref)
    P = pg_ref[:].astype(jnp.float32)
    Qp = qp_ref[:]
    if bf16_dots:
        C2 = jax.lax.dot_general(
            Qp.astype(jnp.bfloat16), P.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        PG = jnp.dot(Qp.astype(jnp.bfloat16), C2.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    else:
        Qp32 = Qp.astype(jnp.float32)
        C2 = jax.lax.dot_general(
            Qp32, P, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )
        PG = jnp.dot(Qp32, C2, preferred_element_type=jnp.float32,
                     precision=_HI)
    rp_ref[:] = C2
    q_ref[:] = P - PG
    resid_ref[0, 0] = _group_loop(
        q_ref, rg_ref, rows, cols, eye, r=r, g=g, iters=iters,
        robust=robust, bf16_dots=bf16_dots, bf16_gram=bf16_gram,
        chain_cheap=chain_cheap, chain_mid=chain_mid, mid_final=mid_final,
        robust_iters=robust_iters, tail_spill=tail_spill, fuse_xw=fuse_xw,
    )


def bgs_group_fused(
    Pg: jax.Array,
    r: int,
    iters: tuple,
    robust: tuple,
    bf16_dots: bool = True,
    bf16_gram: Optional[bool] = None,
    chain_cheap: bool = False,
    chain_mid: bool = False,
    mid_final: int = 2,
    robust_iters: tuple = (14, 12, 4),
    tail_spill: bool = False,
    fuse_xw: Optional[bool] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One WHOLE BGS group — g sequential panel factorizations plus their
    in-group eager projections — as a single kernel dispatch.

    The per-panel kernel (``ns_chain``) already beat the XLA op chain 1.5x
    in context; this removes the remaining per-panel Gram/Q/projection
    dispatches too (~7 ops/panel at the ~0.7us floor).  The group's Q
    OVERWRITES the input buffer (input_output_aliased — one m x g*r VMEM
    resident, ~4 MB for 2048x512).

    Args: Pg (m, g*r) group columns, already projected against previous
    groups; per-panel static ``iters``/``robust`` tuples (robust = the
    shifted three-pass chain for ill-conditioned tail panels).
    ``tail_spill``: run robust panels through the store-back chain
    (``_robust_spill``) — value-identical, but each pass's tall product
    overwrites the panel's slot in the aliased buffer instead of holding
    ~5 live m x r VMEM temporaries, which is what fits robust groups past
    the m <= 3072 scoped-VMEM cap.
    Returns (Qg (m, g*r), Rg (g*r, g*r) block-upper coefficient block,
    worst non-robust NS residual).
    """
    if fuse_xw is None:
        fuse_xw = _fuse_xw_default()
    return _bgs_group_fused_jit(
        Pg, r, tuple(iters), tuple(robust), bf16_dots, bf16_gram,
        chain_cheap, chain_mid, mid_final, tuple(robust_iters), tail_spill,
        fuse_xw, interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("r", "iters", "robust", "bf16_dots",
                              "bf16_gram", "chain_cheap", "chain_mid",
                              "mid_final", "robust_iters", "tail_spill",
                              "fuse_xw", "interpret")
)
def _bgs_group_fused_jit(
    Pg: jax.Array,
    r: int,
    iters: tuple,
    robust: tuple,
    bf16_dots: bool,
    bf16_gram: Optional[bool],
    chain_cheap: bool,
    chain_mid: bool,
    mid_final: int,
    robust_iters: tuple,
    tail_spill: bool,
    fuse_xw: bool,
    interpret: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    m, w = Pg.shape
    g = w // r
    assert w == g * r and len(iters) == g and len(robust) == g
    # Precision split (round-2 VERDICT item 4): ``bf16_dots`` covers the
    # EAGER PROJECTIONS, ``bf16_gram`` the per-panel Gram + Q = P X (the
    # source of the one-pass panel-noise orthogonality floor).  Default:
    # coupled (the historic bgs1/bgs behavior); the 'bgs2' mid-tier runs
    # bf16 projections with HIGHEST Grams.
    if bf16_gram is None:
        bf16_gram = bf16_dots
    kernel = functools.partial(
        _bgs_group_kernel, m=m, r=r, g=g, iters=tuple(iters),
        robust=tuple(robust), bf16_dots=bf16_dots, bf16_gram=bf16_gram,
        chain_cheap=chain_cheap, chain_mid=chain_mid,
        mid_final=mid_final, robust_iters=tuple(robust_iters),
        tail_spill=tail_spill, fuse_xw=fuse_xw,
    )
    Qg, Rg, resid = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, w), jnp.float32),
            jax.ShapeDtypeStruct((w, w), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        input_output_aliases={0: 0},
        # Mosaic's default scoped-VMEM stack is 16 MB — a SOFT compiler
        # default, not the hardware (v5e has 128 MB VMEM).  The robust
        # tail chain's live m x r intermediates hit 19.6 MB at m=4096/g4
        # (the historic OOM behind the m <= 3072 robust-group cap; the
        # store-back tail_spill variant did NOT reduce it — Mosaic's
        # stack allocator doesn't exploit ref round-trips).  Raise the
        # per-kernel limit for exactly those cases (scoped: an
        # unconditionally raised limit would let XLA's VMEM scheduler
        # assume less headroom around the small kernels too).
        # Condition notes: fp32-dot groups (the reorth tiers,
        # bf16_dots=False) hold fp32 eager-projection temporaries — ~2x
        # the bgs1 liveness, OOMing where bgs1 fits (measured 18.88M for
        # a PLAIN fp32 group at 4096 x 512, whose m*w*4 is EXACTLY 8 MB —
        # the old strict '>' test skipped the lift and the 'high' tier
        # failed relay compile at 4096^2).
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if (
                m > 3072
                and (any(robust) or not bf16_dots or m * w * 4 >= 8 * 2**20)
            )
            # Whole-factorization groups (w -> n): the aliased buffer plus
            # the w x w Rg block alone exceed the 16 MB stack long before
            # m does (g16 at 2048^2: 16 + 16 MB).  The g8 headline config
            # (8 + 4 MB) stays under the old default on purpose — an
            # unconditionally raised limit lets XLA assume less VMEM
            # headroom around the kernel.
            or (m * w + w * w) * 4 > 12 * 2**20
            else None
        ),
        interpret=interpret,
    )(Pg.astype(jnp.float32))
    return Qg, Rg, resid[0, 0]


def bgs_group_fused_proj(
    Pg: jax.Array,
    Qprev: jax.Array,
    r: int,
    iters: tuple,
    robust: tuple,
    bf16_dots: bool = True,
    bf16_gram: Optional[bool] = None,
    chain_cheap: bool = False,
    chain_mid: bool = False,
    mid_final: int = 2,
    robust_iters: tuple = (14, 12, 4),
    tail_spill: bool = False,
    fuse_xw: Optional[bool] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """``bgs_group_fused`` with the inter-group projection fused INTO the
    kernel (project-on-entry): takes this group's RAW columns ``Pg``
    (m, g*r) plus the concatenated previous-group Q ``Qprev`` (m, p; any
    float dtype — bf16 under compact policies, matching the XLA ``mm_t``
    it replaces), scrubs ``Pg -= Qprev (Qprev^T Pg)`` in VMEM and then
    runs the standard group body.

    Returns (Qg (m, g*r), Rprev (p, g*r) — the R rows above this group's
    diagonal block, exactly the XLA path's ``G1`` — Rg (g*r, g*r), worst
    residual).  VMEM: the driver gates this variant on the total resident
    estimate (``ops/blockqr.py::_proj_entry_fits``); the kernel raises the
    Mosaic scoped-VMEM limit unconditionally since Qprev alone usually
    exceeds the 16 MB default stack.
    """
    if fuse_xw is None:
        fuse_xw = _fuse_xw_default()
    return _bgs_group_fused_proj_jit(
        Pg, Qprev, r, tuple(iters), tuple(robust), bf16_dots, bf16_gram,
        chain_cheap, chain_mid, mid_final, tuple(robust_iters), tail_spill,
        fuse_xw, interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("r", "iters", "robust", "bf16_dots",
                              "bf16_gram", "chain_cheap", "chain_mid",
                              "mid_final", "robust_iters", "tail_spill",
                              "fuse_xw", "interpret")
)
def _bgs_group_fused_proj_jit(
    Pg: jax.Array,
    Qprev: jax.Array,
    r: int,
    iters: tuple,
    robust: tuple,
    bf16_dots: bool,
    bf16_gram: Optional[bool],
    chain_cheap: bool,
    chain_mid: bool,
    mid_final: int,
    robust_iters: tuple,
    tail_spill: bool,
    fuse_xw: bool,
    interpret: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    m, w = Pg.shape
    mq, p = Qprev.shape
    g = w // r
    assert w == g * r and len(iters) == g and len(robust) == g and mq == m
    if bf16_gram is None:
        bf16_gram = bf16_dots
    kernel = functools.partial(
        _bgs_group_proj_kernel, m=m, r=r, g=g, p=p, iters=tuple(iters),
        robust=tuple(robust), bf16_dots=bf16_dots, bf16_gram=bf16_gram,
        chain_cheap=chain_cheap, chain_mid=chain_mid,
        mid_final=mid_final, robust_iters=tuple(robust_iters),
        tail_spill=tail_spill, fuse_xw=fuse_xw,
    )
    Qg, Rprev, Rg, resid = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, w), jnp.float32),
            jax.ShapeDtypeStruct((p, w), jnp.float32),
            jax.ShapeDtypeStruct((w, w), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        input_output_aliases={0: 0},
        # Qprev (m x p) + the aliased group buffer almost always exceed
        # the 16 MB default stack; the driver's _proj_entry_fits gate
        # keeps the total resident estimate well under this limit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(Pg.astype(jnp.float32), Qprev)
    return Qg, Rprev, Rg, resid[0, 0]


def tri_cholqr_fused(
    P: jax.Array,
    iters: int = 10,
    gram_precision=_HI,
    sign_fix: bool = False,
    interpret: bool = False,
):
    """Drop-in for ``ops/polar.py::tri_cholqr(check=False,
    return_resid=True)`` with the whole NS chain as one dispatch:
    Gram GEMM -> ns_chain kernel -> Q GEMM.  ``sign_fix`` applies the
    Yamamoto column convention (diag of the top r x r block <= 0) exactly
    as the XLA path does.  Returns (Qs, t, X, resid)."""
    r = P.shape[1]
    G = jnp.matmul(P.T, P, precision=gram_precision)
    X, t, resid = ns_chain(G, iters=iters, interpret=interpret)
    if sign_fix:
        Q1 = jnp.matmul(P[:r, :], X, precision=_HI)
        D = jnp.where(jnp.diag(Q1) > 0, -1.0, 1.0).astype(jnp.float32)
        X = X * D[None, :]
        t = D[:, None] * t
    Q = jnp.matmul(P, X, precision=gram_precision)
    return Q, t, X, resid


def tri_cholqr_robust_fused(
    P: jax.Array,
    sign_fix: bool = False,
    chain_mid: bool = False,
    interpret: bool = False,
):
    """Fused counterpart of ``tri_cholqr_robust`` (shifted three-pass) for
    ill-conditioned tail panels: 2 kernel dispatches + 5 GEMMs instead of
    the ~100-op XLA composition.  Pass 1 factors the shifted Gram (capped
    condition number -> 14 iterations always converge; reconstruction stays
    exact since t1 = X1^{-1} exactly at convergence); pass 2 re-factors the
    fresh Gram of Q1 = P X1 with a long chain (iteration count is nearly
    free in-kernel), absorbing the shift bias.  Returns (Qs, t, X, resid)
    with ``resid`` the FINAL pass's correction residual — small iff the
    whole three-pass composition converged (see ``_tri_ns_panel``)."""
    X1, t1, _ = ns_chain(
        jnp.matmul(P.T, P, precision=_HI), iters=14, shift=1e-3,
        chain_mid=chain_mid, omega=False, interpret=interpret,
    )
    Q1 = jnp.matmul(P, X1, precision=_HI)
    # cond(Q1) <= ~45 by the shift cap; 12 iterations converge, and the
    # refine chain runs on the FRESH Gram of the explicit product (captures
    # committed fp32 rounding — the algebraic form plateaus at ~1e-4).
    M1 = jnp.matmul(Q1.T, Q1, precision=_HI)
    X2, t2, _ = ns_chain(M1, iters=12, chain_mid=chain_mid, omega=False,
                         interpret=interpret)
    Q1f = jnp.matmul(Q1, X2, precision=_HI)
    M2 = jnp.matmul(Q1f.T, Q1f, precision=_HI)
    X3, t3, resid = ns_chain(M2, iters=4, refine=True, interpret=interpret)
    Qs = jnp.matmul(Q1f, X3, precision=_HI)
    t21 = jnp.matmul(t2, t1, precision=_HI)
    t = jnp.triu(jnp.matmul(t3, t21, precision=_HI))
    X = jnp.matmul(jnp.matmul(X1, X2, precision=_HI), X3, precision=_HI)
    if sign_fix:
        # Yamamoto column convention, applied at the end (equivalent to
        # flipping inside pass 2: Q -> Q D, t -> D t, X -> X D).
        r = P.shape[1]
        D = jnp.where(jnp.diag(Qs[:r, :]) > 0, -1.0, 1.0).astype(jnp.float32)
        Qs = Qs * D[None, :]
        t = D[:, None] * t
        X = X * D[None, :]
    return Qs, t, X, resid
