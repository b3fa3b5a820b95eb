"""Round-5 A/B: the trailing-carry rewrite of ``_block_qr_bgs``.

HEAD's driver updates the (m, n) input array A in place with
``A.at[:, g_end:].set(...)`` — mutating the jit PARAMETER forces XLA to
clone the full buffer (a ~24 us fp32 copy at 2048^2 visible in the HLO as
a full-size copy op) and each trailing update rewrites the whole (m, n)
buffer.  The rewrite carries only the live suffix T (columns not yet
factored): each group peels its columns off the front, and the group
projection emits the next, narrower T.  Quality is BIT-IDENTICAL (verified
same-session vs HEAD on the same draw); this measures the time.

Interleaved same-session amortized timing, HEAD's driver loaded from git
as a sibling module.  Usage: python experiments/r5_carry_ab.py [reps]
"""

import json
import subprocess
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops.blockqr import block_qr as block_qr_new
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

HEAD = "6e09f50"
M = N = 2048
BLOCK = 128
OUT = "/root/repo/experiments/r5_carry_ab.jsonl"


def load_head_blockqr():
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show",
         f"{HEAD}:mixedprecisionblockqr_tpu/ops/blockqr.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    mod = types.ModuleType("blockqr_head")
    mod.__file__ = f"<git:{HEAD}>"
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod


def make_step(fn):
    public = jax.jit(
        lambda x: fn(x, BLOCK, POLICY_MIXED_FAST, mode="complete",
                     panel_method="auto", check="defer")
    )

    def step(x):
        _, R_full = public(x)
        return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))

    return step


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    head = load_head_blockqr()
    steps = {"head": make_step(head.block_qr), "carry": make_step(block_qr_new)}
    flops = qr_flops(M, N)
    with open(OUT, "a") as f:
        for rep in range(reps):
            for name in ("head", "carry"):
                s = time_step_amortized(steps[name], A, iters=96)
                rec = {"rep": rep, "variant": name, "us": round(s * 1e6, 2),
                       "tflops": round(flops / s / 1e12, 2)}
                print(json.dumps(rec), flush=True)
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
