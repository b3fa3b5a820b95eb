"""Round-10: project-on-entry A/B on the bgs1 group-kernel tier.

The 2048^2 headline spends ~46 us on the inter-group projection GEMM
pair + the trailing carry's HBM round-trip (BENCH_NOTES round 8 budget:
203 us kernels / 46 us projections / 35 us output writes).
``bgs_group_fused_proj`` moves the projection INTO the group kernel
(each group scrubs its own raw columns against all previous Q in VMEM,
block-classical GS form).  Interleaved same-process A/B, >= 3 pairs per
size, on the REAL headline configuration (bgs1, chain_mid, robust
tail), plus quality triples for both arms.

Usage: python experiments/r10_proj_entry.py [sizes...]  (default 2048)
JSON lines to stdout and experiments/r10_proj_entry.jsonl.

OUTCOME (round 10): NEGATIVE — the XLA-projection arm won 7/8
interleaved pairs (99-110 TF vs 86-100 TF at 2048^2); quality identical.
``proj_entry`` therefore defaults to False in ``_block_qr_bgs`` and the
kernel stays as an explicit opt-in.  Both arms still exist at HEAD
(``proj_entry=`` is a real driver argument), so a rerun measures what it
claims to.
"""

import json
import os
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

import jax.numpy as jnp

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import (
    _block_qr_bgs,
    resolve_panel_config,
)
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r10_proj_entry.jsonl")


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def make_fn(n, g, proj_entry):
    @jax.jit
    def fn(x):
        R, Q, _ = _block_qr_bgs(
            x, 128, POLICY_MIXED_FAST, True, None, group_panels=g,
            on_tpu=True, reorth=False, chain_mid=True,
            proj_entry=proj_entry,
        )
        return Q, R
    return fn


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [2048]
    pairs = int(os.environ.get("PAIRS", "3"))
    for n in sizes:
        pm, lm, g = resolve_panel_config(
            n, n, 128, POLICY_MIXED_FAST, "auto", "unroll", 4,
            on_tpu=True, quality="fast",
        )
        assert pm == "bgs1" and lm == "unroll", (pm, lm)
        a = np.random.default_rng(0).random((n, n), dtype=np.float32) - 0.5
        A = jnp.asarray(a)
        fns = {pe: make_fn(n, g, pe) for pe in (False, True)}
        # Quality once per arm (also warms the compile).
        for pe, fn in fns.items():
            Q, R = fn(A)
            rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R),
                                   precision_bits=8)
            emit({"n": n, "g": g, "proj_entry": pe,
                  "backward": rep.backward, "orth": rep.orthogonality,
                  "criteria_ok": rep.all_ok, "tight_ok": rep.tight_ok})
        for k in range(pairs):
            for pe, fn in fns.items():
                def step(x, fn=fn):
                    Q, R = fn(x)
                    return x * (1.0 + 1e-12 * R[0, 0].astype(jnp.float32))
                sec = time_step_amortized(step, A, iters=96)
                emit({"n": n, "g": g, "proj_entry": pe, "pair": k,
                      "sec": sec,
                      "tflops": qr_flops(n, n) / sec / 1e12})
    return 0


if __name__ == "__main__":
    sys.exit(main())
