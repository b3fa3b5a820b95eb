"""Round-10 (round-4 VERDICT item 1): the 4096^2 spread, interleaved.

Committed history disagrees at 4096^2 on the SAME public auto path
(bgs1 g4, robust tails in-group): 136.9 TF round-5 final sweep
(r5_final_sweep.jsonl), 100.9/103.6 TF round-5 face-off
(r5_group4096.jsonl), 115.1 TF round-9 refresh (r9_scale_refresh.jsonl).
The repo rule (CLAUDE.md): a <20% spread is noise UNLESS an interleaved
same-process A/B says otherwise.  This runs the candidates interleaved,
>= 3 rounds each, one process:

  A  public auto path: bgs1 g4 unroll (robust tails in-group) — ships
  B  cholqr1 g4 (the pre-round-5 winner at this size)
  C  GROUPED scan bgs1 g4 (the >12288 tier, forced down to 4096)
  D  bgs1 g8 unroll (the 2048-regime group width, if VMEM admits it)

Per round: amortized in-jit seconds (utils/timing.py); quality triple
once per variant.  Interpretation: within-variant spread across rounds
= chip/session mode; consistent cross-variant ordering = real.

Usage: python experiments/r10_band4096.py [rounds]
Appends to experiments/r10_band4096.jsonl.
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
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST  # noqa: E402
from mixedprecisionblockqr_tpu.utils.flops import qr_flops  # noqa: E402
from mixedprecisionblockqr_tpu.utils.timing import (  # noqa: E402
    time_step_amortized,
)

N = 4096
OUT = "/root/repo/experiments/r10_band4096.jsonl"


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def make_step(pm, lm, g):
    def step(x):
        Q, Rf = block_qr(x, 128, POLICY_MIXED_FAST, mode="complete",
                         panel_method=pm, loop_mode=lm, group_panels=g,
                         check="defer")
        return x * (1.0 + 1e-12 * Rf[0, 0].astype(jnp.float32))

    return step


VARIANTS = [
    ("A_auto_bgs1_g4", "bgs1", "unroll", 4),
    ("B_cholqr1_g4", "cholqr1", "unroll", 4),
    ("C_scan_bgs1_g4", "bgs1", "scan", 4),
    ("D_bgs1_g8", "bgs1", "unroll", 8),
]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    a = np.random.default_rng(0).random((N, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)

    # Quality triples + compile warm-up, one pass (relay batching).
    steps = {}
    for name, pm, lm, g in VARIANTS:
        Q, Rf = block_qr(A, 128, POLICY_MIXED_FAST, mode="complete",
                         panel_method=pm, loop_mode=lm, group_panels=g,
                         check="defer")
        rep = metrics.evaluate(a, np.asarray(Q, np.float32),
                               np.asarray(Rf, np.float32),
                               precision_bits=8)
        emit({"variant": name, "backward": rep.backward,
              "orth": rep.orthogonality, "criteria_ok": bool(rep.all_ok),
              "tight_ok": bool(rep.tight_ok)})
        assert rep.all_ok, (name, str(rep))
        del Q, Rf
        steps[name] = make_step(pm, lm, g)

    for rnd in range(rounds):
        for name, pm, lm, g in VARIANTS:
            sec = time_step_amortized(steps[name], A, iters=32, repeats=2)
            emit({"variant": name, "round": rnd, "sec": sec,
                  "tflops": qr_flops(N, N) / sec / 1e12})


if __name__ == "__main__":
    main()
