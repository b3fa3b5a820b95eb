"""Euroc-MAV Jacobian text-file IO.

File format (``read_euroc_jacobian``, ``Cuda/qr.cu:696-776``): first line
``"<rows> <cols>"``, then one sparse triplet ``"<row> <col> <value>"`` per
line; unmentioned entries are zero.  The reference ships ~225 such files in a
103 MB git-LFS archive (``data/okvis_euroc_MH_05_jacobians.tar.gz``,
extracted by ``CMakeLists.txt:10-13``); this checkout only has the LFS
pointer, so ``write_euroc_jacobian``/``synthesize_dataset`` can create
format-identical files from the synthetic SLAM-Jacobian generator.

A native C++ parser (``native/euroc_parser.cpp``, built via ctypes) is used
when available — the reference's parser is native C++ too; the NumPy
fallback is always correct.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

_native = None
_native_checked = False


def _load_native():
    global _native, _native_checked
    if _native_checked:
        return _native
    _native_checked = True
    try:
        from mixedprecisionblockqr_tpu.native import euroc_native

        _native = euroc_native
    except Exception:
        _native = None
    return _native


def read_dims(path: str) -> Tuple[int, int]:
    with open(path) as f:
        first = f.readline().split()
    return int(first[0]), int(first[1])


def read_euroc_jacobian(path: str) -> Tuple[int, int, np.ndarray]:
    """Parse one Jacobian file into a dense fp32 array.

    Returns (rows, cols, matrix).  Mirrors ``Cuda/qr.cu:696-776``.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    native = _load_native()
    if native is not None:
        try:
            return native.parse_file(path)
        except Exception:
            pass  # fall back to the NumPy parser
    with open(path) as f:
        first = f.readline().split()
        rows, cols = int(first[0]), int(first[1])
        data = np.loadtxt(f, dtype=np.float64, ndmin=2)
    a = np.zeros((rows, cols), np.float32)
    if data.size:
        r = data[:, 0].astype(np.int64)
        c = data[:, 1].astype(np.int64)
        a[r, c] = data[:, 2].astype(np.float32)
    return rows, cols, a


def write_euroc_jacobian(path: str, a: np.ndarray) -> None:
    """Write a matrix in the reference's sparse-triplet text format."""
    rows, cols = a.shape
    r, c = np.nonzero(a)
    with open(path, "w") as f:
        f.write(f"{rows} {cols}\n")
        for ri, ci in zip(r, c):
            f.write(f"{ri} {ci} {a[ri, ci]:.9g}\n")


def synthesize_dataset(
    out_dir: str,
    sizes=((256, 128), (512, 256), (1024, 512), (2000, 1000)),
    start_index: int = 100,
) -> list:
    """Create a format-identical synthetic dataset (``A_%09d.txt`` naming,
    matching ``get_jacobians_test_matrixs``' enumeration pattern,
    ``Cuda/qr.cu:1725-1728``)."""
    from mixedprecisionblockqr_tpu.utils.datagen import slam_jacobian

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    idx = start_index
    for i, (m, n) in enumerate(sizes):
        a = slam_jacobian(m, n, seed=i)
        path = os.path.join(out_dir, f"A_{idx:09d}.txt")
        write_euroc_jacobian(path, a)
        paths.append(path)
        idx += 100
    return paths
