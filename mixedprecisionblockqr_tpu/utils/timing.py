"""Benchmark timing harness.

The reference times with ``std::chrono`` around synchronous CUDA calls
(``Cuda/qr.cu:1354-1361``).  On TPU, dispatch is async: correct timing
requires ``block_until_ready`` after warmup (compile excluded), which this
harness standardizes.  ``jax.profiler`` trace capture replaces NVTX ranges
(``nvtxRangePush`` at ``Cuda/qr.cu:207,292,339``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional, Tuple

import jax


def _block(x):
    return jax.block_until_ready(x)


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    iters: int = 5,
    **kwargs,
) -> Tuple[float, object]:
    """Median wall-clock seconds per call (post-warmup) and the last result."""
    result = None
    for _ in range(max(warmup, 1)):
        result = _block(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        result = _block(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], result


@contextlib.contextmanager
def trace(name: str, log_dir: Optional[str] = None):
    """Named profiler scope; if ``log_dir`` is set, captures a full
    ``jax.profiler`` trace (Perfetto-compatible) around the block."""
    if log_dir is not None:
        jax.profiler.start_trace(log_dir)
    try:
        with jax.named_scope(name):
            yield
    finally:
        if log_dir is not None:
            jax.profiler.stop_trace()


def device_peak_tflops(dtype: str = "bfloat16") -> Optional[float]:
    """Best-effort peak TFLOP/s for the attached device (for utilization
    reporting against the >=50%-of-MXU-peak north star)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    # Published per-chip bf16 peaks.
    table = {
        "v4": 275.0,
        "v5 lite": 197.0,
        "v5lite": 197.0,
        "v5e": 197.0,
        "v5p": 459.0,
        "v6 lite": 918.0,
        "v6e": 918.0,
    }
    for key, val in table.items():
        if key in kind:
            return val if dtype in ("bfloat16", "bf16") else val / 8.0
    return None
