"""Test configuration: run everything on a host-simulated 8-device CPU mesh.

Distributed tests (TSQR/CAQR/dist-QR sharding) need multiple devices; the CI
box has at most one TPU chip, so all tests force the CPU platform with 8
virtual devices — the reference's CPU oracles play the same role for its CUDA
kernels (SURVEY §4).  Benchmarks (bench.py) run on the real chip instead.

This must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers a TPU backend and may
# override JAX_PLATFORMS; the config update below always wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # fp64 oracle paths

# Persistent compilation cache: the suite compiles many static-shaped QR
# programs; cache them across runs (first run pays, reruns are fast).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# XLA:CPU JIT code-space guard.  With ~230 compiled programs live in one
# process, the NEXT compile (or persistent-cache load — both end in the
# same executable-loading step) SEGFAULTS deterministically in jaxlib
# (jax 0.9.0: backend_compile_and_load / get_executable_and_time /
# put_executable_and_time frames, always once the full suite reaches
# test #237; the same test passes in isolation or any smaller file
# combination).  Dropping the in-memory executable references early
# frees the code space; re-runs reload from the persistent cache.
_CLEAR_EVERY = 100
_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _xla_code_space_guard():
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % _CLEAR_EVERY == 0:
        jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
