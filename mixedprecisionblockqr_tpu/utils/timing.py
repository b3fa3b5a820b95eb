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
    """Median wall-clock seconds per call (post-warmup) and the last result.

    Per-call timing includes dispatch/transfer latency; on a tunneled
    backend prefer :func:`time_step_amortized`."""
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


def time_step_amortized(
    step_fn: Callable,
    x0,
    iters: int = 16,
    repeats: int = 3,
) -> float:
    """Device-compute seconds per application of ``step_fn`` (x -> x, same
    shape/dtype), measured as a difference of chained in-jit loops.

    Motivation: on a tunneled/remote PJRT backend ``block_until_ready``
    returns before execution finishes and every host fetch pays tens of ms
    of relay latency, so per-call wall timing measures the tunnel, not the
    MXU.  Here the step is iterated inside one jit via ``fori_loop`` with a
    runtime trip count (one compile), a single scalar is fetched, and the
    per-step time is (t[1+iters] - t[1]) / iters — fixed overhead cancels.
    """
    import jax.numpy as jnp

    @jax.jit
    def loop(x, n):
        def body(i, x):
            return step_fn(x)

        y = jax.lax.fori_loop(0, n, body, x)
        first = jnp.ravel(y)[0] if not isinstance(y, (tuple, list)) else jnp.ravel(y[0])[0]
        return first.astype(jnp.float32)

    float(loop(x0, 1))  # compile + warm
    t_base, t_long = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(x0, 1))
        t_base.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(loop(x0, 1 + iters))
        t_long.append(time.perf_counter() - t0)
    return max(min(t_long) - min(t_base), 1e-9) / iters


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
