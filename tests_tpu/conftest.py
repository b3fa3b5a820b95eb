"""On-chip Pallas/Mosaic regression tests (round-2 VERDICT item 8).

The main suite (tests/) forces a CPU mesh and exercises every kernel in
INTERPRET mode — which cannot catch Mosaic-specific regressions (relayout
bugs on 1-D intermediates, in-kernel HIGHEST lowering, SMEM scalar rules:
exactly the class that cost kernel-porting iterations in round 3, see
BENCH_NOTES).  This suite compiles the real kernels on the real chip.

Run: ``python -m pytest tests_tpu/ -q`` (needs the tunneled TPU; each
Mosaic compile takes 10-300 s over the remote-compile relay on a cold
cache — the persistent cache below makes reruns fast).  The verify skill
runs this as its kernel-regression step.
"""

import os

import pytest

# NO JAX_PLATFORMS=cpu here — this suite exists to run on the chip.
import jax

_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache_tpu")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.devices()[0].platform not in ("cpu",)
    except Exception:
        on_tpu = False
    if not on_tpu:
        if os.environ.get("MPBQR_REQUIRE_TPU"):
            # Gate mode: an all-skipped run exits 0 and masquerades as a
            # green on-chip gate (it happened — a tunnel outage skipped
            # all 16 tests and only the skip count gave it away).  When
            # the caller REQUIRES the chip, fail loudly instead.
            pytest.exit(
                "MPBQR_REQUIRE_TPU is set but no TPU is visible "
                "(tunnel down or backend unregistered) — the on-chip "
                "gate did NOT run",
                returncode=3,
            )
        skip = pytest.mark.skip(reason="no TPU visible; on-chip suite only")
        for item in items:
            item.add_marker(skip)
