"""Timing/profiling utilities."""

import jax.numpy as jnp
import numpy as np

from mixedprecisionblockqr_tpu.utils.timing import (
    device_peak_tflops,
    time_fn,
    time_step_amortized,
    trace,
)


def test_time_fn_returns_result():
    sec, out = time_fn(lambda x: x * 2, jnp.ones(8), warmup=1, iters=2)
    assert sec >= 0
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones(8))


def test_time_step_amortized_positive():
    x0 = jnp.ones((64, 64))
    sec = time_step_amortized(lambda x: x * 1.0000001, x0, iters=4, repeats=2)
    assert sec > 0


def test_trace_scope_noop():
    with trace("scope"):
        pass


def test_device_peak_lookup():
    # On the CPU test backend this returns None; on TPU a float.
    v = device_peak_tflops()
    assert v is None or v > 0
