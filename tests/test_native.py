"""Native C++ Euroc parser vs the NumPy fallback (builds the .so on demand;
skips if no toolchain)."""

import os

import numpy as np
import pytest

from mixedprecisionblockqr_tpu.native.build import build
from mixedprecisionblockqr_tpu.utils import euroc


@pytest.fixture(scope="module")
def native():
    if build() is None:
        pytest.skip("no C++ toolchain available")
    from mixedprecisionblockqr_tpu.native import euroc_native

    return euroc_native


def test_native_roundtrip(native, tmp_path):
    rng = np.random.default_rng(0)
    a = (rng.random((64, 48)) < 0.2).astype(np.float32) * rng.standard_normal(
        (64, 48)
    ).astype(np.float32)
    p = str(tmp_path / "A_000000100.txt")
    n = native.write_file(p, a)
    assert n == int(np.count_nonzero(a))
    m, c, b = native.parse_file(p)
    assert (m, c) == (64, 48)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_native_matches_python_parser(native, tmp_path):
    rng = np.random.default_rng(1)
    a = np.zeros((30, 20), np.float32)
    a[rng.integers(0, 30, 50), rng.integers(0, 20, 50)] = rng.standard_normal(
        50
    ).astype(np.float32)
    p = str(tmp_path / "A.txt")
    euroc.write_euroc_jacobian(p, a)
    m1, n1, b1 = native.parse_file(p)
    # force the NumPy path
    import mixedprecisionblockqr_tpu.utils.euroc as em

    old = em._native, em._native_checked
    em._native, em._native_checked = None, True
    try:
        m2, n2, b2 = euroc.read_euroc_jacobian(p)
    finally:
        em._native, em._native_checked = old
    assert (m1, n1) == (m2, n2)
    np.testing.assert_array_equal(b1, b2)


def test_native_missing_file(native):
    with pytest.raises(IOError):
        native.parse_file("/nonexistent/file.txt")
