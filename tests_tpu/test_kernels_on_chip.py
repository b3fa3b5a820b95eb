"""Compiled-Mosaic parity: every Pallas kernel vs its XLA oracle ON CHIP.

Mirrors the interpret-mode tests in tests/ (same oracles, fp32 tolerances)
but with ``interpret=False`` on the real TPU — the only way to catch
Mosaic lowering regressions (relayouts, in-kernel precision, SMEM rules).
Shapes are kept small so cold relay compiles stay in the tens of seconds.
"""

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


def test_ns_chain_on_chip():
    from mixedprecisionblockqr_tpu.ops.pallas.ns import ns_chain
    from mixedprecisionblockqr_tpu.ops.polar import tri_inv_chol

    rng = np.random.default_rng(0)
    P = rng.standard_normal((1024, 128)).astype(np.float32)
    G = jnp.asarray(P.T @ P)
    X, t, resid = ns_chain(G, iters=8)
    X_ref = tri_inv_chol(G, iters=8)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref),
                               rtol=1e-5, atol=1e-5)
    assert float(resid) < 1e-4
    # X t = I (t is X^{-1} at convergence)
    np.testing.assert_allclose(
        np.asarray(jnp.matmul(X, t, precision=_HI)), np.eye(128), atol=5e-4
    )


def test_ns_chain_fused_xw_parity_on_chip(monkeypatch):
    """Round-9 fused X/W recurrence vs the classic 3-dot chain ON CHIP:
    the stacked (2r, r) dot lowers through Mosaic differently from two
    r x r dots (tile shapes, relayouts), so compiled parity is the test
    interpret mode cannot provide.  The fixed point is unique — any
    compiled-lowering drift in the recurrence shows as a floor gap."""
    from mixedprecisionblockqr_tpu.ops.pallas.ns import ns_chain

    rng = np.random.default_rng(13)
    P = rng.standard_normal((2048, 128)).astype(np.float32)
    G = jnp.asarray(P.T @ P)
    # fuse_xw is a static jit arg (distinct traces per arm); pin both arms
    # so an ambient MPBQR_NO_FUSE_XW cannot make this a vacuous A/A.
    monkeypatch.delenv("MPBQR_NO_FUSE_XW", raising=False)
    X, t, resid = ns_chain(G, iters=8, chain_mid=True, fuse_xw=True)
    Xc, tc, residc = ns_chain(G, iters=8, chain_mid=True, fuse_xw=False)
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xc),
                               rtol=2e-5, atol=2e-6)
    assert float(resid) < 1e-4 and float(residc) < 1e-4


def test_ninv_chain_on_chip():
    from mixedprecisionblockqr_tpu.ops.cholqr import newton_inv
    from mixedprecisionblockqr_tpu.ops.pallas.ns import ninv_chain

    rng = np.random.default_rng(1)
    Qb, _ = np.linalg.qr(rng.standard_normal((512, 64)))
    Qb = Qb * np.where(np.diag(Qb[:64]) > 0, -1.0, 1.0)[None, :]
    S = jnp.asarray(np.eye(64) - Qb[:64].T, dtype=jnp.float32)
    X, resid = ninv_chain(S, iters=6)
    X_ref = newton_inv(S, iters=6)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref),
                               rtol=1e-4, atol=1e-4)
    assert float(resid) < 1e-3


def test_panel_qr_fused_on_chip():
    from mixedprecisionblockqr_tpu.ops.pallas.ns import panel_qr_fused

    rng = np.random.default_rng(2)
    P = jnp.asarray(rng.standard_normal((1024, 128)).astype(np.float32))
    Q, t, resid = panel_qr_fused(P, iters=7)
    orth = float(jnp.max(jnp.abs(
        jnp.matmul(Q.T, Q, precision=_HI) - jnp.eye(128))))
    recon = float(jnp.max(jnp.abs(jnp.matmul(Q, t, precision=_HI) - P)))
    assert orth < 1e-4 and recon < 1e-3 and float(resid) < 1e-4


def test_robust_fused_on_chip():
    from mixedprecisionblockqr_tpu.ops.pallas.ns import tri_cholqr_robust_fused

    rng = np.random.default_rng(3)
    U, _ = np.linalg.qr(rng.standard_normal((256, 128)))
    V, _ = np.linalg.qr(rng.standard_normal((128, 128)))
    P = jnp.asarray((U * np.logspace(0, -4, 128)) @ V.T, dtype=jnp.float32)
    Q, t, X, resid = tri_cholqr_robust_fused(P)
    orth = float(jnp.max(jnp.abs(
        jnp.matmul(Q.T, Q, precision=_HI) - jnp.eye(128))))
    recon = float(jnp.max(jnp.abs(jnp.matmul(Q, t, precision=_HI) - P)))
    assert orth < 5e-3 and recon < 1e-3
    assert float(resid) < 1e-2  # healthy edge-of-domain range


def test_bgs_group_fused_on_chip():
    from mixedprecisionblockqr_tpu.ops.pallas.ns import bgs_group_fused

    rng = np.random.default_rng(4)
    Pg = jnp.asarray(rng.standard_normal((1024, 512)).astype(np.float32))
    r, g = 128, 4
    Qg, Rg, resid = bgs_group_fused(
        Pg, r, iters=(6,) * g, robust=(False,) * g, bf16_dots=False
    )
    orth = float(jnp.max(jnp.abs(
        jnp.matmul(Qg.T, Qg, precision=_HI) - jnp.eye(512))))
    recon = float(jnp.max(jnp.abs(jnp.matmul(Qg, Rg, precision=_HI) - Pg)))
    assert orth < 1e-4, orth
    assert recon < 1e-3, recon
    assert float(resid) < 1e-4


def test_bgs_group_fused_bf16_dots_on_chip():
    # The mixed-policy production configuration (single-pass bf16 MXU dots).
    from mixedprecisionblockqr_tpu.ops.pallas.ns import bgs_group_fused

    rng = np.random.default_rng(5)
    Pg = jnp.asarray(rng.standard_normal((1024, 512)).astype(np.float32))
    Qg, Rg, resid = bgs_group_fused(
        Pg, 128, iters=(6,) * 4, robust=(False,) * 4, bf16_dots=True
    )
    orth = float(jnp.max(jnp.abs(
        jnp.matmul(Qg.T, Qg, precision=_HI) - jnp.eye(512))))
    recon = float(jnp.max(jnp.abs(jnp.matmul(Qg, Rg, precision=_HI) - Pg)))
    assert orth < 0.1, orth         # bf16 Gram-noise class (2^-8 * panels)
    assert recon < 0.5, recon       # bf16-element class on O(30)-norm data
    assert float(resid) < 1e-3


def test_gemm_kernel_on_chip():
    from mixedprecisionblockqr_tpu.ops.pallas.gemm import matmul_bf16_accum_f32

    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((256, 384)).astype(np.float32))
    c = matmul_bf16_accum_f32(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    ref = jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref),
                               rtol=2e-2, atol=2e-1)


def test_chol_kernel_on_chip():
    from mixedprecisionblockqr_tpu.ops.pallas.chol import chol_rinv

    rng = np.random.default_rng(7)
    P = rng.standard_normal((512, 128)).astype(np.float32)
    G = jnp.asarray(P.T @ P + 128 * np.eye(128, dtype=np.float32))
    R, Rinv = chol_rinv(G)
    R_ref = np.linalg.cholesky(np.asarray(G, np.float64)).T  # upper factor
    np.testing.assert_allclose(np.abs(np.asarray(R)), np.abs(R_ref),
                               rtol=1e-3, atol=1e-3)
    # R @ Rinv = I
    np.testing.assert_allclose(
        np.asarray(jnp.matmul(R, Rinv, precision=_HI)), np.eye(128),
        atol=1e-3,
    )


def test_panel_factor_fused_on_chip():
    from mixedprecisionblockqr_tpu.ops.householder import panel_factor
    from mixedprecisionblockqr_tpu.ops.pallas.panel import panel_factor_fused

    rng = np.random.default_rng(8)
    P = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32))
    V, T, Rp = panel_factor_fused(P)
    Vr, Tr, Rr = panel_factor(P)
    np.testing.assert_allclose(np.asarray(Rp), np.asarray(Rr),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(V), np.asarray(Vr),
                               rtol=1e-4, atol=1e-4)


def test_chain_mid_parity_on_chip():
    """Round-5 lever: emulated-HIGH (3-pass bf16 split) early NS iterations
    must match the full-HIGHEST chain's converged quality ON CHIP (the
    split lowering is exactly the class interpret mode cannot check)."""
    from mixedprecisionblockqr_tpu.ops.pallas.ns import bgs_group_fused

    rng = np.random.default_rng(9)
    Pg = jnp.asarray(rng.standard_normal((1024, 512)).astype(np.float32))
    Qh, Rh, resid_h = bgs_group_fused(
        Pg, 128, iters=(6,) * 4, robust=(False,) * 4, bf16_dots=False
    )
    Qm, Rm, resid_m = bgs_group_fused(
        Pg, 128, iters=(6,) * 4, robust=(False,) * 4, bf16_dots=False,
        chain_mid=True,
    )
    orth_m = float(jnp.max(jnp.abs(
        jnp.matmul(Qm.T, Qm, precision=_HI) - jnp.eye(512))))
    orth_h = float(jnp.max(jnp.abs(
        jnp.matmul(Qh.T, Qh, precision=_HI) - jnp.eye(512))))
    assert orth_m < max(2 * orth_h, 1e-4), (orth_m, orth_h)
    assert float(resid_m) < 1e-4, float(resid_m)


def test_chain_cheap_converges_with_omega_on_chip():
    """Round-4 recorded chain_cheap (single-pass bf16 NS iterations) as a
    hard negative: interpret passed, compiled Mosaic NaN'd — this test
    asserted the canary FIRES.  The round-5b omega=1.5 burst changed the
    iteration's dynamics and chain_cheap now converges on chip (backward
    2.4e-3 / orth 0.081, tight gate passes).  Pin the NEW behavior: if
    this NaNs again, the omega protection regressed."""
    from mixedprecisionblockqr_tpu.ops import metrics
    from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST

    a = np.random.default_rng(0).random((2048, 2048), dtype=np.float32) - 0.5
    R, Q, _ = jax.jit(
        lambda x: _block_qr_bgs(
            x, 128, POLICY_MIXED_FAST, True, None, group_panels=8,
            on_tpu=True, reorth=False, robust_tail=1, chain_cheap=True,
        )
    )(jnp.asarray(a))
    assert bool(jnp.isfinite(R[0, 0])), (
        "chain_cheap NaN'd on chip again — the omega=1.5 protection "
        "(ops/polar.py::ns_omega_iters) regressed"
    )
    rep = metrics.evaluate(a, np.asarray(Q, np.float32),
                           np.asarray(R, np.float32), precision_bits=8)
    assert rep.all_ok and rep.tight_ok, str(rep)


def test_hostile_cond_trips_canary_on_chip():
    """The canary-trip coverage the chain_cheap seed used to provide: a
    cond-1e7 Bierlaire draw genuinely breaks the one-pass Gram tier
    (orth ~0.5 measured with the canary disabled) and the poison must
    fire ON CHIP — compiled-Mosaic residual plumbing included."""
    from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
    from mixedprecisionblockqr_tpu.utils.datagen import conditioned_matrix

    a = conditioned_matrix(512, condition_number=1e7, seed=7).astype(
        np.float32
    )
    R, Q, _ = jax.jit(
        lambda x: _block_qr_bgs(
            x, 64, POLICY_MIXED_FAST, True, None, group_panels=8,
            on_tpu=True, reorth=False, chain_mid=True,
        )
    )(jnp.asarray(a))
    assert not bool(jnp.isfinite(R[0, 0])), (
        "cond-1e7 draw did not poison on chip — canary coverage lost"
    )


def test_auto_path_1024_no_poison_on_chip():
    """Regression for the round-5 tri_iters_for_aspect recalibration: the
    public auto path at 1024^2 mixed (aspect-8 panels) must NOT poison
    with check='defer' (it silently retried for two rounds)."""
    import mixedprecisionblockqr_tpu as mpq

    a = np.random.default_rng(2).random((1024, 1024), dtype=np.float32) - 0.5
    Q, R = mpq.qr(a, policy=mpq.POLICY_MIXED, mode="complete",
                  quality="fast", check="defer")
    rep = mpq.metrics.evaluate(a, np.asarray(Q), np.asarray(R),
                               precision_bits=8)
    assert np.isfinite(np.asarray(R)[0, 0]) and rep.all_ok, str(rep)


def test_grouped_scan_bgs_on_chip():
    """Grouped scan-BGS (one Qbuf pass per group) — the 16384^2 tier's
    structure at a compile-friendly size, on compiled Mosaic."""
    from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs_scan
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
    from mixedprecisionblockqr_tpu.ops import metrics as M

    a = np.random.default_rng(3).random((1024, 1024), dtype=np.float32) - 0.5
    R, Q, _ = jax.jit(
        lambda x: _block_qr_bgs_scan(
            x, 128, POLICY_MIXED_FAST, True, None, on_tpu=True,
            reorth=False, group_panels=4,
        )
    )(jnp.asarray(a))
    rep = M.evaluate(a, np.asarray(Q, np.float32), np.asarray(R, np.float32),
                     precision_bits=8)
    assert rep.all_ok, str(rep)


def test_group_vmem_boundary_3072_on_chip():
    """m=3072 is the LAST size whose robust-tail chain fits the DEFAULT
    16 MB Mosaic scoped-VMEM stack inside ``bgs_group_fused`` (measured
    OOM 19.6 MB at m=4096/g4).  The whole group — tail panel included —
    must compile and factor in-kernel here WITHOUT the raised per-kernel
    limit (bgs_group_fused only lifts it for m > 3072 robust groups)."""
    from mixedprecisionblockqr_tpu.ops import metrics as M
    from mixedprecisionblockqr_tpu.ops.blockqr import (
        _block_qr_bgs,
        _group_kernel_fits,
    )
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST

    assert _group_kernel_fits(3072, 128, 4)
    a = np.random.default_rng(5).random((3072, 512), dtype=np.float32) - 0.5
    R, Q, _ = jax.jit(
        lambda x: _block_qr_bgs(
            x, 128, POLICY_MIXED_FAST, True, None, group_panels=4,
            on_tpu=True, reorth=False,
        )
    )(jnp.asarray(a))
    rep = M.evaluate(a, np.asarray(Q, np.float32),
                     np.asarray(R, np.float32)[:512], precision_bits=8)
    assert rep.all_ok, str(rep)


def test_group_vmem_boundary_4096_fallback_on_chip():
    """One size past the default-stack boundary: at m=4096 robust-tail
    groups now run IN-KERNEL under the raised per-kernel scoped-VMEM
    limit (round-5b; the historic fallback routed them to per-panel
    chain kernels).  The compile-time scoped-vmem OOM this guards is
    invisible to interpret mode.  Success = compiles AND the quality
    triple passes."""
    from mixedprecisionblockqr_tpu.ops import metrics as M
    from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST

    a = np.random.default_rng(6).random((4096, 512), dtype=np.float32) - 0.5
    R, Q, _ = jax.jit(
        lambda x: _block_qr_bgs(
            x, 128, POLICY_MIXED_FAST, True, None, group_panels=4,
            on_tpu=True, reorth=False,
        )
    )(jnp.asarray(a))
    rep = M.evaluate(a, np.asarray(Q, np.float32),
                     np.asarray(R, np.float32)[:512], precision_bits=8)
    assert rep.all_ok, str(rep)


def test_scan_bgs2_reorth_mixed_on_chip():
    """Round-5 scan-tier reorth fix ON CHIP: under a mixed policy the
    'bgs2' scan tier must deliver fp32-class orthogonality — every
    projection pass runs fp32 HIGHEST against an fp32-resident Qbuf.
    This is MXU-specific: on TPU a plain fp32 ``jnp.matmul`` is ONE bf16
    pass, so dropping the HIGHEST annotation regresses orth to ~2^-8
    class on chip while the CPU-mesh tests (true fp32 math) stay green —
    exactly the blind spot this suite exists for."""
    from mixedprecisionblockqr_tpu.ops import metrics as M
    from mixedprecisionblockqr_tpu.ops.blockqr import block_qr
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED

    a = np.random.default_rng(25).random((512, 512), dtype=np.float32) - 0.5
    Q, R = block_qr(jnp.asarray(a), 128, POLICY_MIXED, mode="complete",
                    panel_method="bgs2", loop_mode="scan", group_panels=2,
                    check="defer")
    orth = float(M.orthogonality_error(np.asarray(Q, np.float32)))
    bwd = float(M.backward_error(a, np.asarray(Q, np.float32),
                                 np.asarray(R, np.float32)))
    assert orth < 1e-4 and bwd < 1e-5, (orth, bwd)


def test_dist_scan_bgs2_reorth_mixed_d1_on_chip():
    """The distributed grouped-BCGS2 scan tier's shard_map program under a
    MIXED policy on the real chip (d=1): the psum'd HIGHEST projection
    passes + fp32 Qbuf must survive compiled lowering, not just the
    CPU-mesh suite's fp32 math (same MXU blind spot as the single-chip
    test above)."""
    from mixedprecisionblockqr_tpu.ops import metrics as M
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED
    from mixedprecisionblockqr_tpu.parallel.dist_qr import dist_block_qr
    from mixedprecisionblockqr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((1,), ("rows",))
    a = np.random.default_rng(16).random((512, 512)).astype(np.float32) - 0.5
    Q, R = dist_block_qr(a, mesh, block_size=128, mode="reduced",
                         panel_method="bgs2", loop_mode="scan",
                         group_panels=2, policy=POLICY_MIXED)
    orth = float(M.orthogonality_error(np.asarray(Q, np.float32)))
    assert orth < 1e-4, orth


def test_dist_bgs_shardmap_d1_on_chip():
    """The distributed BGS tier's shard_map program on the real chip at
    d=1 — collectives lower to on-device no-ops but the whole program
    (psum'd Grams, lax.cond robust/plain split, grouped Qbuf pass) runs
    compiled, which the CPU-mesh suite never exercises."""
    from mixedprecisionblockqr_tpu.ops import metrics as M
    from mixedprecisionblockqr_tpu.parallel.dist_qr import dist_block_qr
    from mixedprecisionblockqr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((1,), ("rows",))
    a = np.random.default_rng(4).random((512, 512)).astype(np.float32) - 0.5
    Q, R = dist_block_qr(a, mesh, block_size=128, mode="reduced",
                         panel_method="bgs1", loop_mode="scan",
                         group_panels=2)
    rep = M.evaluate(a, np.asarray(Q, np.float32), np.asarray(R, np.float32),
                     precision_bits=23)
    assert rep.backward < 1e-5, str(rep)


def test_conditioned_no_false_poison_on_chip():
    """Round-5b omega fix ON CHIP: a cond-1e3 Bierlaire draw (realistic
    SLAM-Jacobian conditioning) must complete on the fast tier — no
    canary — and pass the acceptance criteria (compiled Mosaic, not
    interpret: the omega dynamics must hold under real MXU rounding)."""
    from mixedprecisionblockqr_tpu.ops import metrics
    from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
    from mixedprecisionblockqr_tpu.utils.datagen import conditioned_matrix

    a = conditioned_matrix(512, condition_number=1e3, seed=7).astype(
        np.float32
    )
    R, Q, _ = jax.jit(
        lambda x: _block_qr_bgs(
            x, 64, POLICY_MIXED_FAST, True, None, group_panels=8,
            on_tpu=True, reorth=False, chain_mid=True,
        )
    )(jnp.asarray(a))
    assert bool(jnp.isfinite(R[0, 0])), (
        "canary false-fired on a cond-1e3 draw on chip"
    )
    rep = metrics.evaluate(a, np.asarray(Q, np.float32),
                           np.asarray(R, np.float32), precision_bits=8)
    assert rep.all_ok, str(rep)


def test_quality_ladder_tight_gates_on_chip():
    """Round-5c corner-leak rescrub + fp32-Q return ON CHIP: the public
    quality ladder's reorth rungs must reach fp32-roundoff orthogonality
    under compiled Mosaic (the rescrub's refactorization runs through the
    fused NS kernel — interpret mode cannot certify it).  Pre-fix, fp32
    'high' at this class of sizes measured orth ~5e-5 (the r5 ladder
    floor) and mixed 'high' sat at the bf16 STORAGE floor (~4.4e-4):
    both failed the tight 2^-23*sqrt(m) gate this test pins."""
    from mixedprecisionblockqr_tpu.ops import metrics
    from mixedprecisionblockqr_tpu.ops.blockqr import qr
    from mixedprecisionblockqr_tpu.ops.policy import (
        POLICY_FP32,
        POLICY_MIXED_FAST,
    )

    a = np.random.default_rng(3).random((512, 512), np.float32) - 0.5
    A = jnp.asarray(a)
    tight = 2.0**-23 * np.sqrt(512)  # ~2.7e-6

    Q, R = qr(A, policy=POLICY_FP32, mode="complete", quality="high",
              check="defer")
    rep = metrics.evaluate(a, np.asarray(Q, np.float32),
                           np.asarray(R, np.float32), precision_bits=23)
    assert rep.all_ok and rep.orthogonality < tight, str(rep)

    for quality in ("balanced", "high"):
        Q, R = qr(A, policy=POLICY_MIXED_FAST, mode="complete",
                  quality=quality, check="defer")
        assert Q.dtype == jnp.float32, (quality, Q.dtype)  # fp32-Q return
        rep = metrics.evaluate(a, np.asarray(Q, np.float32),
                               np.asarray(R, np.float32), precision_bits=8)
        assert rep.all_ok, (quality, str(rep))
        assert rep.orthogonality < 1e-5, (
            f"{quality}: orth {rep.orthogonality:.2e} must beat the bf16 "
            "storage floor by orders of magnitude (fp32-Q regression)")


def test_posuni_head_panel_no_poison_on_chip():
    """Round-7 regression: the reference's DEFAULT input class (uniform
    [0,1) — positively correlated columns) poisoned EVERY unrolled NS fast
    tier on chip: the unprojected head panel's outlier-spectrum Gram
    (cond(M0) ~ 9e2 at 1024x128) stalls the aspect-budget chain (measured
    one-behind 0.5).  The head boost (ops/polar.py::tri_head_iters) must
    converge it inside the compiled group kernel."""
    import mixedprecisionblockqr_tpu as mpq

    a = np.random.default_rng(2).random((1024, 1024), dtype=np.float32)
    Q, R = mpq.block_qr(a, 128, mpq.POLICY_MIXED, panel_method="bgs1",
                        check="defer")
    Rn = np.asarray(R, np.float32)
    assert np.isfinite(Rn[0, 0]), "posuni head panel poisoned on chip"
    rep = mpq.metrics.evaluate(a, np.asarray(Q, np.float32), Rn,
                               precision_bits=8)
    assert rep.all_ok, str(rep)


def test_sketch_qrcp_kernel_on_chip():
    """The RQRCP pivot-selection kernel (ops/pallas/sketch.py) compiled to
    Mosaic must pick exactly the XLA oracle's pivot sequence — including a
    non-bucket width (padding masked with -inf norms)."""
    from mixedprecisionblockqr_tpu.ops.pallas.sketch import sketch_qrcp_ranks
    from mixedprecisionblockqr_tpu.ops.pivoted import _sketch_qrcp

    rng = np.random.default_rng(11)
    for d, w, r in [(136, 512, 128), (136, 384, 128)]:
        a = rng.standard_normal((d, w)).astype(np.float32)
        a = a * np.exp(rng.standard_normal(w)).astype(np.float32)
        sel, _ = _sketch_qrcp(jnp.asarray(a), r)
        rank_xla = np.full(w, w, np.int32)
        rank_xla[np.asarray(sel)] = np.arange(r)
        rank_k = np.asarray(sketch_qrcp_ranks(jnp.asarray(a), r))
        np.testing.assert_array_equal(
            np.argsort(rank_k, kind="stable"),
            np.argsort(rank_xla, kind="stable"),
        )


def test_rqrcp_pivoted_qr_on_chip():
    """End-to-end RQRCP factorization on chip: exact reconstruction,
    orthonormal Q, correct rank on a low-rank input."""
    from mixedprecisionblockqr_tpu.ops.pivoted import (
        numerical_rank,
        pivoted_qr,
    )

    rng = np.random.default_rng(12)
    a = (rng.standard_normal((640, 100)) @
         rng.standard_normal((100, 512))).astype(np.float32)
    Q, R, perm = pivoted_qr(a, mode="reduced", method="rqrcp",
                            block_size=128)
    Q, R, perm = np.asarray(Q), np.asarray(R), np.asarray(perm)
    scale = np.linalg.norm(a)
    assert np.linalg.norm(a[:, perm] - Q @ R) / scale < 5e-6
    assert np.max(np.abs(Q.T @ Q - np.eye(512))) < 5e-6
    assert numerical_rank(R, m=640) == 100


def test_bgs_group_fused_proj_on_chip():
    """Project-on-entry group kernel compiled to Mosaic (round-10,
    measured-negative opt-in — kept correctness-pinned): in-kernel scrub
    vs the XLA trailing-carry driver must agree, and the scrub must leave
    fp32-class orthogonality across the group boundary."""
    from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_FP32

    rng = np.random.default_rng(14)
    a = rng.standard_normal((1024, 1024)).astype(np.float32)
    A = jnp.asarray(a)
    out = {}
    for pe in (False, True):
        R, Q, _ = jax.jit(
            lambda x, pe=pe: _block_qr_bgs(
                x, 128, POLICY_FP32, True, None, 4, False,
                reorth=False, ns_impl="group", proj_entry=pe)
        )(A)
        out[pe] = (np.asarray(R), np.asarray(Q))
    np.testing.assert_allclose(out[False][0], out[True][0],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(out[False][1], out[True][1], atol=1e-4)
    Qp = out[True][1]
    assert np.max(np.abs(Qp.T @ Qp - np.eye(1024))) < 1e-3


def test_qr_autodiff_bgs1_grad_on_chip():
    """Gradient check through the bgs1 fast tier ON CHIP (round-4 VERDICT
    item 7): the custom VJP wraps an opaque Mosaic group kernel in its
    forward — interpret mode cannot prove the compiled composition.
    Oracle: jnp.linalg.qr under the same gauge-invariant loss."""
    from mixedprecisionblockqr_tpu.ops.autodiff import qr_autodiff
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_FP32

    rng = np.random.default_rng(15)
    A = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))
    wq = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))
    wr = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))

    def canon(qr_fn):
        def f(X):
            Q, R = qr_fn(X)
            s = jnp.sign(jnp.diag(R))
            return Q * s[None, :], R * s[:, None]
        return f

    def loss(qr_fn):
        f = canon(qr_fn)
        def L(X):
            Q, R = f(X)
            return jnp.sum(wq * Q) + jnp.sum(wr * jnp.triu(R))
        return L

    g_ours = jax.grad(loss(
        lambda X: qr_autodiff(X, block_size=128, policy=POLICY_FP32,
                              panel_method="bgs1")
    ))(A)
    # The ORACLE's builtin VJP uses default-precision matmuls — one bf16
    # MXU pass on TPU (max abs drift 0.10 on this problem, measured) —
    # while our backward pins HIGHEST; pin the oracle too so the
    # comparison tests our composition, not the oracle's noise.
    with jax.default_matmul_precision("highest"):
        g_ref = jax.grad(loss(
            lambda X: jnp.linalg.qr(X, mode="reduced")
        ))(A)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


def test_resumable_segment_resume_on_chip(tmp_path):
    """block_qr_resumable interrupt + resume ON CHIP (round-4 VERDICT
    item 7): the orbax carry round-trip composes with the compiled scan
    segment program; resumed == uninterrupted bitwise."""
    from mixedprecisionblockqr_tpu.models.resumable import (
        block_qr_resumable,
    )
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_FP32

    a = np.random.default_rng(16).standard_normal((512, 512)).astype(
        np.float32
    )
    out = block_qr_resumable(
        a, str(tmp_path / "int"), block_size=128, policy=POLICY_FP32,
        group_panels=2, reorth=False, segment_groups=1, max_segments=1,
    )
    assert out is None  # stopped early, checkpoint on disk
    while out is None:
        out = block_qr_resumable(
            a, str(tmp_path / "int"), block_size=128, policy=POLICY_FP32,
            group_panels=2, reorth=False, segment_groups=1, max_segments=1,
        )
    Qi, Ri = out
    Qu, Ru = block_qr_resumable(
        a, str(tmp_path / "uni"), block_size=128, policy=POLICY_FP32,
        group_panels=2, reorth=False, segment_groups=1,
    )
    np.testing.assert_array_equal(np.asarray(Qi), np.asarray(Qu))
    np.testing.assert_array_equal(np.asarray(Ri), np.asarray(Ru))
    from mixedprecisionblockqr_tpu.ops import metrics

    rep = metrics.evaluate(a, np.asarray(Qi), np.asarray(Ri),
                           precision_bits=23)
    assert rep.all_ok, str(rep)
