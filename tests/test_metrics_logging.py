"""Metrics thresholds, CSV/JSONL logging, FLOPs model, Euroc IO."""

import os

import jax.numpy as jnp
import numpy as np

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.utils import euroc
from mixedprecisionblockqr_tpu.utils.flops import qr_flops, qr_flops_per_second
from mixedprecisionblockqr_tpu.utils.logging import (
    CSV_HEADER,
    ResultsLogger,
    average_by_rows,
    read_csv_log,
)


def test_error_limit_matches_reference_rule():
    # 2^-bits * m (Cuda/qr.cu:120-127); fp32 23 bits, mixed fp16 11 bits.
    assert metrics.error_limit(23, 1024) == (2 ** -23) * 1024
    assert metrics.error_limit(11, 2048) == (2 ** -11) * 2048


def test_metrics_on_known_factorization():
    rng = np.random.default_rng(0)
    A = rng.random((40, 20)).astype(np.float32)
    Qn, Rn = np.linalg.qr(A)
    rep = metrics.evaluate(A, jnp.asarray(Qn), jnp.asarray(Rn), precision_bits=23)
    assert rep.all_ok
    # Corrupt R below the diagonal -> lower-trapezoid criterion fails.
    Rbad = Rn.copy()
    Rbad[5, 0] = 1.0
    rep2 = metrics.evaluate(A, jnp.asarray(Qn), jnp.asarray(Rbad), precision_bits=23)
    assert not rep2.lower_trapezoid_ok


def test_strip_r():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    r = np.asarray(metrics.strip_r(x))
    assert np.all(r[np.tril_indices(4, -1, 3)] == 0)


def test_flops_model():
    # flops = 4 m^2 n - m n^2 + n^3/3 (Cuda/qr.cu:102-113)
    assert qr_flops(100, 50) == 4 * 100 * 100 * 50 - 100 * 50 * 50 + 50 ** 3 / 3
    assert qr_flops_per_second(2.0, 100, 50) == qr_flops(100, 50) / 2.0


def test_csv_logger_roundtrip(tmp_path):
    lg = ResultsLogger(str(tmp_path))
    lg.write_csv("cpu_householder", 100, 50, 0.5, 1e9, 1e-6)
    lg.write_csv("cpu_householder", 100, 50, 0.7, 1e9, 2e-6)
    lg.write_csv("cpu_householder", 200, 50, 1.0, 2e9, 1e-6)
    path = os.path.join(str(tmp_path), "cpu_householder.txt")
    with open(path) as f:
        assert f.readline().strip() == CSV_HEADER
    recs = read_csv_log(path)
    assert len(recs) == 3
    avg = average_by_rows(recs)
    assert len(avg) == 2
    assert abs(avg[0]["runtime"] - 0.6) < 1e-9


def test_jsonl_logger(tmp_path):
    lg = ResultsLogger(str(tmp_path))
    lg.write_jsonl("run", {"m": 8, "tflops": 1.5})
    import json

    rec = json.loads(open(os.path.join(str(tmp_path), "run.jsonl")).read())
    assert rec["m"] == 8 and "ts" in rec


def test_euroc_roundtrip(tmp_path):
    a = np.zeros((6, 4), np.float32)
    a[0, 1] = 2.5
    a[5, 3] = -1.25
    a[2, 0] = 3e-7
    p = os.path.join(str(tmp_path), "A_000000100.txt")
    euroc.write_euroc_jacobian(p, a)
    rows, cols, b = euroc.read_euroc_jacobian(p)
    assert (rows, cols) == (6, 4)
    np.testing.assert_array_equal(a, b)
    assert euroc.read_dims(p) == (6, 4)


def test_euroc_synthesize_and_enumerate(tmp_path):
    from mixedprecisionblockqr_tpu.models.slam import enumerate_jacobians

    d = str(tmp_path / "jac")
    paths = euroc.synthesize_dataset(d, sizes=((32, 16), (64, 32), (48, 24)))
    assert len(paths) == 3
    cases = enumerate_jacobians(d, max_matrices=30)
    # sorted by rows, every 2nd taken (Cuda/qr.cu:1750-1756)
    assert [c.m for c in cases] == [32, 64]
    A = cases[0].load()
    assert A.shape == (32, 16)


def test_enumerate_jacobians_synthetic_fallback():
    from mixedprecisionblockqr_tpu.models.slam import enumerate_jacobians

    cases = enumerate_jacobians(None)
    assert len(cases) >= 5
    A = cases[0].load()
    assert A.shape == (cases[0].m, cases[0].n)


def test_conditioned_matrix_hits_target():
    """Parity with the reference's generator test (python/utils_test.py:4-8):
    cond(P) hits the requested target exactly (the construction builds a
    sqrt(target) spectrum, then P @ P.T squares it back to target)."""
    from mixedprecisionblockqr_tpu.utils.datagen import conditioned_matrix

    for target in (10.0, 100.0, 1000.0):
        P = conditioned_matrix(64, target, seed=1)
        np.testing.assert_allclose(np.linalg.cond(P), target, rtol=1e-6)
