"""Round-10: scan-tier group width at 16384^2 (the >12288 tier).

The grouped scan-BGS tier is HBM-bound on its per-group trailing-carry
pass (round-9 profile: the Qbuf/T traffic IS the runtime; compute is
~92% MXU-idle-free already).  Group width g sets the number of groups —
n/(g*r) — and the trailing carry T is read+written ONCE per group, so
g8 halves the dominant traffic vs the shipping g4 at identical FLOPs.
The per-panel chain kernels are unfused at this size either way (the
group kernel VMEM gate), so g only moves the projection batching.

Interleaved same-process A/B, public auto-shaped call (bgs1 scan),
POLICY_MIXED_FAST at 16384^2: g4 (ships) vs g8 vs g16.

Usage: python experiments/r10_scan16k.py [rounds]
Appends to experiments/r10_scan16k.jsonl.
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

N = 16384
OUT = "/root/repo/experiments/r10_scan16k.jsonl"


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def make_step(g):
    def step(x):
        Q, Rf = block_qr(x, 128, POLICY_MIXED_FAST, mode="complete",
                         panel_method="bgs1", loop_mode="scan",
                         group_panels=g, check="defer")
        return x * (1.0 + 1e-12 * Rf[0, 0].astype(jnp.float32))

    return step


GS = [4, 8, 16]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    a = (np.random.default_rng(0).random((N, N), dtype=np.float32)
         - 0.5)
    A = jnp.asarray(a)

    steps = {}
    for g in GS:
        name = f"scan_g{g}"
        Q, Rf = block_qr(A, 128, POLICY_MIXED_FAST, mode="complete",
                         panel_method="bgs1", loop_mode="scan",
                         group_panels=g, check="defer")
        rep = metrics.evaluate(a, np.asarray(Q, np.float32),
                               np.asarray(Rf, np.float32),
                               precision_bits=8)
        emit({"variant": name, "kind": "quality", "backward": rep.backward,
              "orth": rep.orthogonality, "criteria_ok": bool(rep.all_ok),
              "tight_ok": bool(rep.tight_ok)})
        assert rep.all_ok, (name, str(rep))
        del Q, Rf
        steps[name] = make_step(g)

    for rnd in range(rounds):
        for g in GS:
            name = f"scan_g{g}"
            sec = time_step_amortized(steps[name], A, iters=4, repeats=2)
            emit({"variant": name, "round": rnd, "sec": sec,
                  "tflops": qr_flops(N, N) / sec / 1e12})


if __name__ == "__main__":
    main()
