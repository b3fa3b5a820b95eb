"""Round-7 battery finds: scale-safe spectral guard + the sync contract.

1. ``_spectral_guard``/``_norm2_est`` used to compute two UNNORMALIZED
   power-iteration matvecs: for ||G|| >~ 3e8 the sum-of-squares overflows
   fp32 and the inf/inf NaN'd the whole NS chain — any physically-scaled
   input (panel column norm ~1e4+, e.g. uniform x 1e6 data) poisoned
   every NS tier.  The estimate ||M v||/||v|| is scale-invariant, so it
   is now computed normalized (divide by max|M|, renormalize the
   intermediate).

2. ``check='sync'`` only guarded the NS tiers, and the cholqr drivers
   never funneled a mid-matrix Cholesky NaN into the R[0,0] canary — a
   zero column at 300 of 512 left R[0,0] FINITE with NaN R/Q bodies, so
   'sync' returned garbage (contract violation) and checked_qr-style
   R[0,0] inspection missed it.  ``_block_qr_traced`` now aggregates
   ``sum(panel_factor * 0)`` per panel into the poison canary, and the
   public sync retry covers every tier.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import block_qr, block_qr_qtb
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED
from mixedprecisionblockqr_tpu.ops.polar import _spectral_guard
from mixedprecisionblockqr_tpu.utils.checks import NonFiniteError


def test_spectral_guard_scale_invariant():
    rng = np.random.default_rng(0)
    P = rng.standard_normal((1024, 128)).astype(np.float32)
    G = jnp.asarray(P.T @ P)
    base = float(_spectral_guard(G))
    true = float(np.linalg.norm(np.asarray(G, np.float64), 2))
    assert 0.5 * true < base < 1.5 * true
    for s in (1e-20, 1e-8, 1e8, 1e14, 1e20):
        est = float(_spectral_guard(G * s))
        assert np.isfinite(est), f"guard overflowed at scale {s:g}"
        assert abs(est / (base * s) - 1.0) < 1e-3, (s, est, base * s)


@pytest.mark.parametrize("scale", [1e6, 1e-12])
def test_scaled_input_no_poison_bgs1(scale):
    """Pre-fix: uniform x 1e6 NaN'd bgs1 through scale = rsqrt(inf/inf)
    in the chain init (and tiny inputs underflowed to rsqrt(0) = inf)."""
    a = (np.random.default_rng(0).random((512, 512)) * scale).astype(
        np.float32
    )
    Q, R = block_qr(jnp.asarray(a), 64, POLICY_MIXED, panel_method="bgs1",
                    check="defer")
    Rn = np.asarray(R, np.float32)
    assert np.isfinite(Rn[0, 0]), f"poisoned at scale {scale:g}"
    rep = metrics.evaluate(a, np.asarray(Q, np.float32), Rn,
                           precision_bits=8)
    assert rep.all_ok


def _zerocol_matrix(col):
    a = np.random.default_rng(0).standard_normal((512, 512)).astype(
        np.float32
    )
    a[:, col] = 0.0
    return a


@pytest.mark.parametrize("pm", ["cholqr1", "cholqr2s"])
def test_midmatrix_cholesky_nan_fires_canary(pm):
    """Pre-fix: the NaN appeared in R/Q bodies but R[0,0] stayed finite —
    the documented inspection point (and sync detection) missed it."""
    a = _zerocol_matrix(300)
    Q, R = block_qr(jnp.asarray(a), 64, POLICY_MIXED, panel_method=pm,
                    check="defer")
    assert not np.isfinite(np.asarray(R)[0, 0]), (
        f"{pm}: mid-matrix breakdown did not reach the canary"
    )


@pytest.mark.parametrize("pm", ["cholqr1", "cholqr2s", "bgs1"])
def test_sync_recovers_rank_deficient(pm):
    """The sync contract proper: every tier must transparently retry
    through the rank-deficiency-exact Householder driver."""
    a = _zerocol_matrix(300)
    Q, R = block_qr(jnp.asarray(a), 64, POLICY_MIXED, panel_method=pm,
                    check="sync")
    Rn = np.asarray(R, np.float32)
    assert np.isfinite(Rn).all()
    rep = metrics.evaluate(a, np.asarray(Q, np.float32), Rn,
                           precision_bits=8)
    assert rep.all_ok, (pm, str(rep))


def test_sync_raises_on_nonfinite_input():
    a = np.random.default_rng(0).standard_normal((256, 256)).astype(
        np.float32
    )
    a[3, 5] = np.nan
    with pytest.raises(NonFiniteError):
        block_qr(jnp.asarray(a), 64, POLICY_MIXED, panel_method="cholqr1",
                 check="sync")


def test_qtb_sync_recovers_rank_deficient():
    a = _zerocol_matrix(300)
    b = np.random.default_rng(1).standard_normal((512,)).astype(np.float32)
    R, qtb = block_qr_qtb(jnp.asarray(a), jnp.asarray(b), 64, POLICY_MIXED,
                          panel_method="cholqr1", check="sync")
    assert np.isfinite(np.asarray(R)).all()
    assert np.isfinite(np.asarray(qtb)).all()
