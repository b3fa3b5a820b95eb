"""Fused NS-chain kernel (ops/pallas/ns.py) vs its XLA oracle
(ops/polar.py) — interpret mode on CPU, the reference's kernel-vs-host-twin
pattern (SURVEY §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
from mixedprecisionblockqr_tpu.ops.pallas.ns import (
    ns_chain,
    tri_cholqr_fused,
    tri_cholqr_robust_fused,
)
from mixedprecisionblockqr_tpu.ops.policy import POLICY_FP32
from mixedprecisionblockqr_tpu.ops.polar import (
    tri_cholqr,
    tri_cholqr_robust,
    tri_inv_chol,
)


@pytest.mark.parametrize("r,iters", [(32, 6), (128, 6), (128, 10), (256, 8)])
def test_ns_chain_matches_tri_inv_chol(r, iters):
    rng = np.random.default_rng(r + iters)
    P = rng.standard_normal((8 * r, r)).astype(np.float32)
    G = jnp.asarray(P.T @ P)
    X_ref = tri_inv_chol(G, iters=iters)
    X, t, resid = ns_chain(G, iters=iters, interpret=True)
    # Same update, same seed, same guard -> bit-identical chains modulo
    # reduction order; measured exact on the fori-loop path.
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref),
                               rtol=1e-6, atol=1e-6)
    # t = triu(X^T G) is the exact inverse of X at convergence.
    np.testing.assert_allclose(
        np.asarray(jnp.matmul(X, t, precision=jax.lax.Precision.HIGHEST)),
        np.eye(r), atol=5e-4,
    )
    assert float(resid) < 1e-4
    # X upper-triangular, t upper-triangular.
    assert np.allclose(np.tril(np.asarray(X), -1), 0.0)
    assert np.allclose(np.tril(np.asarray(t), -1), 0.0)


def test_tri_cholqr_fused_matches_xla():
    rng = np.random.default_rng(3)
    P = jnp.asarray(rng.standard_normal((1024, 128)).astype(np.float32))
    Qf, tf, Xf, residf = tri_cholqr_fused(P, iters=7, interpret=True)
    Qr, tr, Xr, residr = tri_cholqr(P, iters=7, sign_fix=False, check=False,
                                    return_resid=True)
    np.testing.assert_allclose(np.asarray(Qf), np.asarray(Qr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf), np.asarray(tr), atol=1e-3)


def test_robust_fused_ill_conditioned_panel():
    # cond(P) ~ 1e4: inside the documented fp32 Gram domain for the
    # three-pass scheme; parity with the XLA composition.
    rng = np.random.default_rng(4)
    U, _ = np.linalg.qr(rng.standard_normal((256, 128)))
    V, _ = np.linalg.qr(rng.standard_normal((128, 128)))
    P = jnp.asarray((U * np.logspace(0, -4, 128)) @ V.T, dtype=jnp.float32)
    Qf, tf, _, residf = tri_cholqr_robust_fused(P, interpret=True)
    Qx, tx, _ = tri_cholqr_robust(P, sign_fix=False)
    # Edge-of-domain (cond 1e4) robust residual is ~1e-3-class — healthy
    # for this tier (breakdown is >= 1e-1; drivers scale robust resids by
    # 1e-2 against the shared 1e-4 poison threshold).
    assert float(residf) < 1e-2
    orth_f = float(jnp.max(jnp.abs(Qf.T @ Qf - jnp.eye(128))))
    orth_x = float(jnp.max(jnp.abs(Qx.T @ Qx - jnp.eye(128))))
    recon = float(jnp.max(jnp.abs(Qf @ tf - P)))
    assert orth_f < max(5e-5, 2 * orth_x)
    assert recon < 1e-4


def test_ns_chain_shift_mode():
    # Shifted pass: converges on a near-singular Gram where the unshifted
    # chain's budget would blow; t stays the exact inverse of X w.r.t. the
    # SHIFTED Gram, so reconstruction through (P X) t is preserved.
    rng = np.random.default_rng(5)
    U, _ = np.linalg.qr(rng.standard_normal((128, 128)))
    P = (U * np.logspace(0, -5, 128)).astype(np.float32)
    G = jnp.asarray(P.T @ P)
    X, t, resid = ns_chain(G, iters=14, shift=1e-3, interpret=True)
    assert float(resid) < 1e-3
    np.testing.assert_allclose(
        np.asarray(jnp.matmul(X, t, precision=jax.lax.Precision.HIGHEST)),
        np.eye(128), atol=1e-3,
    )


@pytest.mark.parametrize("iters", [1, 2, 3, 4, 8])
def test_ns_chain_fused_xw_handoff(iters, monkeypatch):
    # Round-9 fused X/W recurrence: all but the final two iterations carry
    # W = G X by the stacked right-multiplication (one (2r, r) dot instead
    # of two r x r dots); the final two run classic with a fresh W.  This
    # sweeps the fused->classic handoff boundary (iters <= 2 = no fusion
    # at all; iters = 3 = exactly one fused step) and checks the chain
    # lands on the SAME converged factor as the classic control
    # (fuse_xw=False) to fp32-roundoff class — the fixed point is
    # unique, so any recurrence-drift bug shows up as a floor regression.
    # The ambient env knob must not leak in: pin both arms explicitly
    # (fuse_xw is a static jit arg, so the two calls are distinct traces).
    monkeypatch.delenv("MPBQR_NO_FUSE_XW", raising=False)
    r = 64
    rng = np.random.default_rng(100 + iters)
    P = rng.standard_normal((8 * r, r)).astype(np.float32)
    G = jnp.asarray(P.T @ P)
    X, t, resid = ns_chain(G, iters=iters, fuse_xw=True, interpret=True)
    Xc, tc, residc = ns_chain(G, iters=iters, fuse_xw=False, interpret=True)
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xc),
                               rtol=2e-5, atol=2e-6)
    if iters >= 8:
        assert float(resid) < 1e-4 and float(residc) < 1e-4


def test_ns_chain_refine_mode():
    # Identity-seeded refinement on a Gram near I (pass-2/3 use).
    rng = np.random.default_rng(6)
    E = rng.standard_normal((64, 64)).astype(np.float32)
    G = jnp.asarray(np.eye(64, dtype=np.float32) + 1e-3 * (E + E.T))
    X, t, resid = ns_chain(G, iters=4, refine=True, interpret=True)
    M = np.asarray(
        jnp.matmul(X.T, jnp.matmul(G, X, precision=jax.lax.Precision.HIGHEST),
                   precision=jax.lax.Precision.HIGHEST)
    )
    assert np.max(np.abs(M - np.eye(64))) < 1e-6


def test_ninv_chain_matches_newton_inv():
    from mixedprecisionblockqr_tpu.ops.cholqr import newton_inv
    from mixedprecisionblockqr_tpu.ops.pallas.ns import ninv_chain

    rng = np.random.default_rng(7)
    # A Yamamoto-class S from a TALL panel (aspect 8): I - Q1^T with
    # Q1 the top block of the orthonormal basis, diag flipped <= 0 —
    # ||Q1||_2 < 1 keeps sigma(S) in [1, 2] (square Q1 is the documented
    # breakdown domain, not the driver's input).
    Qb, _ = np.linalg.qr(rng.standard_normal((512, 64)))
    Qb = Qb * np.where(np.diag(Qb[:64]) > 0, -1.0, 1.0)[None, :]
    S = jnp.asarray(np.eye(64) - Qb[:64].T, dtype=jnp.float32)
    X_ref = newton_inv(S, iters=6)
    X, resid = ninv_chain(S, iters=6, interpret=True)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref),
                               rtol=1e-5, atol=1e-5)
    assert float(resid) < 1e-3


@pytest.mark.parametrize("gram_hi", [True, False])
def test_panel_qr_fused_matches_tri_cholqr(gram_hi):
    from mixedprecisionblockqr_tpu.ops.pallas.ns import panel_qr_fused

    rng = np.random.default_rng(8)
    P = jnp.asarray(rng.standard_normal((1024, 128)).astype(np.float32))
    Q, t, resid = panel_qr_fused(P, iters=7, gram_hi=gram_hi, interpret=True)
    atol = 1e-5 if gram_hi else 5e-3  # HIGH Gram ~ 3-pass bf16 class
    Qr, tr, _, residr = tri_cholqr(
        P, iters=7, sign_fix=False, check=False, return_resid=True,
        gram_precision=(jax.lax.Precision.HIGHEST if gram_hi
                        else jax.lax.Precision.HIGH),
    )
    np.testing.assert_allclose(np.asarray(Q), np.asarray(Qr), atol=atol)
    np.testing.assert_allclose(np.asarray(t), np.asarray(tr),
                               atol=max(atol, 1e-3) * 40)
    assert float(resid) < 1e-4
    # And the factorization actually reconstructs.
    recon = float(jnp.max(jnp.abs(
        jnp.matmul(Q, t, precision=jax.lax.Precision.HIGHEST) - P)))
    assert recon < (1e-3 if gram_hi else 0.3)  # bf16-class Gram -> looser


def test_panel_qr_fused_robust_matches_three_pass():
    from mixedprecisionblockqr_tpu.ops.pallas.ns import panel_qr_fused

    rng = np.random.default_rng(9)
    U, _ = np.linalg.qr(rng.standard_normal((256, 128)))
    V, _ = np.linalg.qr(rng.standard_normal((128, 128)))
    P = jnp.asarray((U * np.logspace(0, -4, 128)) @ V.T, dtype=jnp.float32)
    Q, t, resid = panel_qr_fused(P, robust=True, interpret=True)
    orth = float(jnp.max(jnp.abs(Q.T @ Q - jnp.eye(128))))
    recon = float(jnp.max(jnp.abs(Q @ t - P)))
    Qx, tx, _ = tri_cholqr_robust(P, sign_fix=False)
    orth_x = float(jnp.max(jnp.abs(Qx.T @ Qx - jnp.eye(128))))
    assert orth < max(5e-5, 2 * orth_x)
    assert recon < 1e-4


def test_bgs_driver_ns_impl_parity():
    # The full driver with ns_impl='pallas' (interpret) matches 'xla'.
    rng = np.random.default_rng(0)
    a = rng.standard_normal((512, 512)).astype(np.float32)
    A = jnp.asarray(a)
    out = {}
    for impl in ("xla", "pallas", "fused", "group"):
        R, Q, _ = jax.jit(
            lambda x, impl=impl: _block_qr_bgs(
                x, 128, POLICY_FP32, True, None, 4, False,
                reorth=False, ns_impl=impl)
        )(A)
        out[impl] = (np.asarray(R), np.asarray(Q))
    # 'group' under fp32 uses HIGHEST dots in-kernel -> numerically the
    # same path as the others (bf16 divergence only under mixed policy).
    for impl in ("pallas", "fused", "group"):
        np.testing.assert_allclose(out["xla"][0], out[impl][0], atol=1e-4)
        np.testing.assert_allclose(out["xla"][1], out[impl][1], atol=1e-4)


def test_bgs_proj_entry_parity():
    """Project-on-entry group kernel (``bgs_group_fused_proj``): the
    block-classical-GS form (each group scrubbed in-kernel against all
    previous Q) must match the right-looking XLA trailing-carry path.
    The variant measured SLOWER on chip (experiments/r10_proj_entry.jsonl
    — defaults OFF) but stays available, so it stays correctness-tested."""
    rng = np.random.default_rng(7)
    a = rng.standard_normal((512, 512)).astype(np.float32)
    A = jnp.asarray(a)
    out = {}
    for pe in (False, True):
        R, Q, _ = jax.jit(
            lambda x, pe=pe: _block_qr_bgs(
                x, 128, POLICY_FP32, True, None, 4, False,
                reorth=False, ns_impl="group", proj_entry=pe)
        )(A)
        out[pe] = (np.asarray(R), np.asarray(Q))
    np.testing.assert_allclose(out[False][0], out[True][0], atol=1e-4)
    np.testing.assert_allclose(out[False][1], out[True][1], atol=1e-4)
    # R-only calls must still work (the DUS buffer doubles as the
    # kernels' Qprev source but is not returned).
    R, Qn, _ = jax.jit(
        lambda x: _block_qr_bgs(
            x, 128, POLICY_FP32, False, None, 4, False,
            reorth=False, ns_impl="group", proj_entry=True)
    )(A)
    assert Qn is None
    np.testing.assert_allclose(np.asarray(R), out[True][0], atol=1e-6)


def test_bgs_proj_entry_mixed_quality():
    """Under POLICY_MIXED_FAST the proj-entry scrub runs single-pass bf16
    (same contract as the XLA mm_t it replaces) — quality must stay in
    the documented bgs1 band, not degrade."""
    from mixedprecisionblockqr_tpu.ops import metrics
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST

    rng = np.random.default_rng(8)
    a = rng.standard_normal((512, 512)).astype(np.float32)
    R, Q, _ = jax.jit(
        lambda x: _block_qr_bgs(
            x, 128, POLICY_MIXED_FAST, True, None, 4, False,
            reorth=False, ns_impl="group", proj_entry=True)
    )(jnp.asarray(a))
    rep = metrics.evaluate(
        a, np.asarray(Q, np.float32), np.asarray(R, np.float32),
        precision_bits=8,
    )
    assert rep.all_ok, str(rep)


def test_robust_tail_breakdown_trips_canary():
    """A cond ~1e9 matrix is far beyond the three-pass scheme's fp32 Gram
    domain: the robust tail chains must REPORT failure through the NaN
    canary (_poison_if_unconverged) instead of silently returning a garbage
    factorization (round-2 VERDICT weak item 5 / next item 6 — the robust
    branch used to return resid = 0.0 and could never trip it)."""
    rng = np.random.default_rng(13)
    n = 512
    U, _ = np.linalg.qr(rng.standard_normal((n, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = jnp.asarray((U * np.logspace(0, -9, n)) @ V.T, dtype=jnp.float32)
    R, Q, _ = jax.jit(
        lambda x: _block_qr_bgs(
            x, 128, POLICY_FP32, True, None, 4, False,
            reorth=False, ns_impl="group",
        )
    )(A)
    assert not np.isfinite(np.asarray(R)[0, 0]), (
        "ill-conditioned tail panel must poison the output, not pass"
    )
    # And check='sync' turns the canary into a transparent retry through
    # the robust reflector tier (which may legitimately succeed or fail on
    # this matrix, but must return FINITE results or raise — here we only
    # require it not to return the poisoned buffers).  The default
    # check='defer' intentionally PROPAGATES the NaN instead (round-3
    # VERDICT item 3: no blocking fetch on the public path).
    from mixedprecisionblockqr_tpu.ops.blockqr import block_qr

    Q2, R2 = block_qr(A, block_size=128, policy=POLICY_FP32,
                      mode="complete", panel_method="bgs1", check="sync")
    backward = float(
        jnp.linalg.norm(Q2 @ R2 - A) / jnp.linalg.norm(A)
    )
    assert np.isfinite(backward)


def test_tri_cholqr_fused_sign_fix_parity():
    """sign_fix=True (Yamamoto column convention) must match the XLA path
    exactly — the 'polar' grouped driver relies on it on TPU."""
    rng = np.random.default_rng(11)
    P = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32))
    Qf, tf, Xf, _ = tri_cholqr_fused(P, iters=7, sign_fix=True,
                                     interpret=True)
    Qx, tx, Xx, _ = tri_cholqr(P, iters=7, sign_fix=True, check=False,
                               return_resid=True)
    np.testing.assert_allclose(np.asarray(Qf), np.asarray(Qx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf), np.asarray(tx), atol=1e-3)
    assert bool((np.diag(np.asarray(Qf)[:128]) <= 0).all())


def test_robust_fused_sign_fix():
    rng = np.random.default_rng(12)
    P = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    Qf, tf, _, _ = tri_cholqr_robust_fused(P, sign_fix=True, interpret=True)
    assert bool((np.diag(np.asarray(Qf)[:64]) <= 0).all())
    np.testing.assert_allclose(
        np.asarray(Qf) @ np.asarray(tf), np.asarray(P), atol=1e-4
    )


def test_bgs2_mid_tier_quality_ladder():
    """'bgs2' (round-2 VERDICT item 4): BCGS2 reorth + HIGHEST in-kernel
    panel Gram/Q=PX with bf16 projections — orthogonality must land
    strictly between bgs1 (panel-noise floor) and bgs (all-HIGHEST)."""
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED

    rng = np.random.default_rng(20)
    a = rng.standard_normal((512, 512)).astype(np.float32)
    A = jnp.asarray(a)
    orth = {}
    for pm, reorth, mid in (("bgs1", False, False), ("bgs2", True, True),
                            ("bgs", True, False)):
        R, Q, _ = jax.jit(
            lambda x, reorth=reorth, mid=mid: _block_qr_bgs(
                x, 128, POLICY_MIXED, True, None, 4, False,
                reorth=reorth, ns_impl="group", mid_tier=mid,
            )
        )(A)
        Qn = np.asarray(Q, dtype=np.float64)
        orth[pm] = float(np.max(np.abs(Qn.T @ Qn - np.eye(512))))
        recon = np.linalg.norm(Qn @ np.asarray(R, np.float64) - a)
        assert recon / np.linalg.norm(a) < 0.02, (pm, recon)
    assert orth["bgs2"] < orth["bgs1"], orth
    assert orth["bgs"] <= orth["bgs2"] * 3, orth  # bgs stays the top tier


def test_chain_cheap_converges():
    """bf16 early NS iterations + HIGHEST tail: the converged accuracy is
    set by the final HIGHEST steps (self-correcting iteration), so the
    driver output must match the all-HIGHEST chain's quality class."""
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED

    rng = np.random.default_rng(21)
    a = rng.standard_normal((512, 512)).astype(np.float32)
    A = jnp.asarray(a)
    out = {}
    for cheap in (False, True):
        R, Q, _ = jax.jit(
            lambda x, cheap=cheap: _block_qr_bgs(
                x, 128, POLICY_FP32, True, None, 4, False,
                reorth=False, ns_impl="group", chain_cheap=cheap,
            )
        )(A)
        Qn = np.asarray(Q, dtype=np.float64)
        out[cheap] = (
            float(np.max(np.abs(Qn.T @ Qn - np.eye(512)))),
            float(np.linalg.norm(Qn @ np.asarray(R, np.float64) - a)
                  / np.linalg.norm(a)),
        )
        assert np.isfinite(np.asarray(R)[0, 0]), "cheap chain poisoned"
    # same fp32-roundoff class (within 4x of the all-HIGHEST chain)
    assert out[True][0] < max(4 * out[False][0], 1e-5), out
    assert out[True][1] < max(4 * out[False][1], 1e-6), out
