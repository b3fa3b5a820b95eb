"""Round-5 headline face-off: interleaved repeats (3x each, A/B/C/A/B/...)
to beat the ±12% session noise that single samples cannot resolve
(r5_headline.jsonl: the same chain_mid program measured 272.5 then 239.6 us).

  A  chain_mid (hoisted shared splits), robust_iters (14,12,4) — candidate
  B  A + robust_iters (10,8,4) — shorter robust tail (canary-guarded)
  C  B + tail_bump=2 — shorter pre-tail chains
  P  the PUBLIC qr() path end-to-end in-jit (panel_method='auto',
     check='defer') — must sit within ~10% of the internal driver
     (round-3 VERDICT item 3)

Each repeat: amortized seconds; quality triple evaluated once per variant.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs, block_qr
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

M = N = 2048
BLOCK = 128
OUT = "/root/repo/experiments/r5_faceoff.jsonl"


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)

    def mk(**kw):
        kw.setdefault("robust_tail", 1)
        kw.setdefault("group_panels", 8)
        kw.setdefault("chain_mid", True)
        return jax.jit(lambda x: _block_qr_bgs(
            x, BLOCK, POLICY_MIXED_FAST, True, None, on_tpu=True,
            reorth=False, **kw))

    variants = {
        "A": mk(),
        "B": mk(robust_iters=(10, 8, 4)),
        "C": mk(robust_iters=(10, 8, 4), tail_bump=2),
        # The public driver end-to-end: auto dispatch -> bgs1 g8 +
        # chain_mid + POLICY_MIXED_FAST q_store; check='defer' is pure, so
        # the whole call traces into the timing loop.
        "P": jax.jit(lambda x: block_qr(
            x, BLOCK, POLICY_MIXED_FAST, mode="complete",
            panel_method="auto", check="defer")),
    }

    # Quality gate once per variant.
    for name, fn in variants.items():
        out = fn(A)
        Q, R_full = (out[1], out[0]) if name != "P" else (out[0], out[1])
        rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R_full),
                               precision_bits=8)
        emit({"variant": name, "kind": "quality", "backward": rep.backward,
              "orth": rep.orthogonality, "ok": bool(rep.all_ok),
              "tight": bool(rep.tight_ok)})

    def mkstep(fn, name):
        if name == "P":
            def step(x):
                Q, R = fn(x)
                return x * (1.0 + 1e-12 * R[0, 0].astype(jnp.float32))
        else:
            def step(x):
                R_full, Qc, _ = fn(x)
                return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))
        return step

    for rep_i in range(3):
        for name, fn in variants.items():
            sec = time_step_amortized(mkstep(fn, name), A, iters=96)
            emit({"variant": name, "rep": rep_i,
                  "us": round(sec * 1e6, 1),
                  "tflops": round(qr_flops(M, N) / sec / 1e12, 1)})


if __name__ == "__main__":
    main()
