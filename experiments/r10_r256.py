"""Round-10 (round-4 VERDICT item 2): r=256 recalibration at the 2048^2
headline.

The remaining 2048^2 budget (~203 us) is issue-latency-bound on r x r
in-kernel NS dots; r=256 halves the CHAIN COUNT (8 panels instead of 16)
while doubling each dot's tile work — the issue-latency math favors
fewer, larger dots.  VMEM: m*r*g*4 at r=256/g4 equals the configuration
that OOM'd at m=4096/r=128/g4, so the B arm runs tail_spill=True (the
round-5 spill that freed exactly that boundary) and C tries g2.

Interleaved same-process A/B at POLICY_MIXED_FAST, quality gated per
variant (bgs1-class criteria, 2^-8*m):

  A  ship: r=128 g8 robust_tail=1 chain_mid (the headline program)
  B  r=256 g4 robust_tail=1 chain_mid tail_spill
  C  r=256 g2 robust_tail=1 chain_mid

Usage: python experiments/r10_r256.py [rounds]
Appends to experiments/r10_r256.jsonl.
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
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs  # noqa: E402
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST  # noqa: E402
from mixedprecisionblockqr_tpu.utils.flops import qr_flops  # noqa: E402
from mixedprecisionblockqr_tpu.utils.timing import (  # noqa: E402
    time_step_amortized,
)

N = 2048
OUT = "/root/repo/experiments/r10_r256.jsonl"


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def mk(block, **kw):
    kw.setdefault("robust_tail", 1)
    kw.setdefault("chain_mid", True)
    return jax.jit(lambda x: _block_qr_bgs(
        x, block, POLICY_MIXED_FAST, True, None, on_tpu=True,
        reorth=False, **kw))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    a = np.random.default_rng(0).random((N, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)

    variants = {
        "A_r128_g8": mk(128, group_panels=8),
        "B_r256_g4_spill": mk(256, group_panels=4, tail_spill=True),
        "C_r256_g2": mk(256, group_panels=2),
    }

    for name, fn in variants.items():
        R_full, Q, _ = fn(A)
        rep = metrics.evaluate(a, np.asarray(Q, np.float32),
                               np.asarray(R_full, np.float32),
                               precision_bits=8)
        emit({"variant": name, "kind": "quality", "backward": rep.backward,
              "orth": rep.orthogonality, "ok": bool(rep.all_ok),
              "tight": bool(rep.tight_ok)})
        assert rep.all_ok, (name, str(rep))
        del R_full, Q

    def mkstep(fn):
        def step(x):
            R_full, Qc, _ = fn(x)
            return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))
        return step

    for rnd in range(rounds):
        for name, fn in variants.items():
            sec = time_step_amortized(mkstep(fn), A, iters=96, repeats=2)
            emit({"variant": name, "round": rnd, "sec": sec,
                  "tflops": qr_flops(N, N) / sec / 1e12})


if __name__ == "__main__":
    main()
