"""Round-10: verify the g8 band flip on the PUBLIC auto path.

r10_bandwide.jsonl measured g8 sweeping the 3072-12288 band with
explicit `_block_qr_bgs` calls; this script confirms the shipped auto
dispatch (block_qr(panel_method='auto', check='defer')) now lands on
those numbers, with the quality triple asserted before timing counts:

  4096^2 POLICY_MIXED_FAST   (was fused-g4 113-114 TF; expect ~142-150)
  6144^2 POLICY_MIXED_FAST   (was g4 127; expect ~145-152)
  8192^2 POLICY_BF16_FAST    (was g4 182-185; expect ~192-195)
  4096^2 quality='balanced'  (reorth rung through the g8 band: quality
                              must hold the fp32-class orth contract)

Usage: python experiments/r10_band_flip.py [rounds]
Appends to experiments/r10_band_flip.jsonl.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402

from mixedprecisionblockqr_tpu.ops import metrics  # noqa: E402
from mixedprecisionblockqr_tpu.ops.blockqr import block_qr  # noqa: E402
from mixedprecisionblockqr_tpu.ops.policy import (  # noqa: E402
    POLICY_BF16_FAST,
    POLICY_MIXED_FAST,
)
from mixedprecisionblockqr_tpu.utils.flops import qr_flops  # noqa: E402
from mixedprecisionblockqr_tpu.utils.timing import (  # noqa: E402
    time_step_amortized,
)

OUT = "/root/repo/experiments/r10_band_flip.jsonl"


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def make_fac(policy, quality):
    def fac(x):
        Q, R = block_qr(x, 128, policy, mode="complete",
                        panel_method="auto", check="defer",
                        quality=quality)
        return Q, R
    return fac


# (name, n, policy, quality, precision_bits, iters)
VARIANTS = [
    ("4096_mixed_auto", 4096, POLICY_MIXED_FAST, None, 8, 48),
    ("6144_mixed_auto", 6144, POLICY_MIXED_FAST, None, 8, 24),
    ("8192_bf16_auto", 8192, POLICY_BF16_FAST, None, 8, 16),
    ("4096_mixed_balanced", 4096, POLICY_MIXED_FAST, "balanced", 8, 24),
]


def make_step(fac):
    def step(x):
        Q, R = fac(x)
        return x * (1.0 + 1e-12 * R[0, 0].astype(jnp.float32))
    return step


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rng = np.random.default_rng(0)
    data, steps = {}, {}
    for name, n, policy, quality, bits, _ in VARIANTS:
        a = rng.random((n, n), dtype=np.float32) - 0.5
        A = jnp.asarray(a)
        fac = make_fac(policy, quality)
        Q, R = fac(A)
        rep = metrics.evaluate(a, np.asarray(Q, np.float32),
                               np.asarray(R, np.float32),
                               precision_bits=bits)
        emit({"variant": name, "kind": "quality", "backward": rep.backward,
              "orth": rep.orthogonality, "criteria_ok": bool(rep.all_ok),
              "tight_ok": bool(rep.tight_ok)})
        assert rep.all_ok, (name, str(rep))
        del Q, R
        data[name], steps[name] = A, make_step(fac)

    for rnd in range(rounds):
        for name, n, _, _, _, iters in VARIANTS:
            sec = time_step_amortized(steps[name], data[name],
                                      iters=iters, repeats=2)
            emit({"variant": name, "round": rnd, "sec": sec,
                  "tflops": qr_flops(n, n) / sec / 1e12})


if __name__ == "__main__":
    main()
