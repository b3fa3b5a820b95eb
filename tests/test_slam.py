"""SLAM workload module: Jacobian generation, factor-and-report, GN loop."""

import numpy as np

from mixedprecisionblockqr_tpu.models.slam import (
    JacobianCase,
    enumerate_jacobians,
    factor_and_report,
    gauss_newton_step,
)
from mixedprecisionblockqr_tpu.ops.policy import POLICY_FP32, POLICY_MIXED
from mixedprecisionblockqr_tpu.utils.datagen import slam_jacobian


def test_slam_jacobian_structure():
    a = slam_jacobian(128, 64, seed=0)
    assert a.shape == (128, 64)
    # dense pose strip + sparse landmark block
    pose_cols = 64 // 8
    assert np.count_nonzero(a[:, :pose_cols]) == 128 * pose_cols
    density = np.count_nonzero(a[:, pose_cols:]) / (128 * (64 - pose_cols))
    assert density < 0.2


def test_factor_and_report():
    a = slam_jacobian(192, 96, seed=1)
    rep = factor_and_report(a, POLICY_MIXED, block_size=32)
    assert rep.all_ok, str(rep)
    rep32 = factor_and_report(a, POLICY_FP32, block_size=32)
    assert rep32.backward < rep.backward


def test_gauss_newton_converges():
    """A linear residual model must converge in one undamped GN step."""
    rng = np.random.default_rng(2)
    J = rng.standard_normal((160, 24)).astype(np.float32)
    xtrue = rng.standard_normal(24).astype(np.float32)
    x = np.zeros(24, np.float32)
    for _ in range(2):
        r = J @ (x - xtrue)
        dx = np.asarray(gauss_newton_step(J, r, policy=POLICY_FP32))
        x = x + dx
    np.testing.assert_allclose(x, xtrue, atol=1e-3)


def test_jacobian_case_synthetic_load():
    c = JacobianCase("syn", 64, 32, seed=3)
    a = c.load()
    assert a.shape == (64, 32)
