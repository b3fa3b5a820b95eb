"""Round-10 (round-4 VERDICT item 1, part 2): where does the g8 win end?

r10_band4096.jsonl showed bgs1 g8 (UNFUSED grouped path — g8 at 4096
exceeds the group-kernel VMEM gate) beating the shipping bgs1 g4 (fused
group kernel) 142-145 TF vs 113-114 TF, consistently across interleaved
rounds.  Wider groups = fewer inter-group projection GEMMs at larger
size; past ~3072 the factorization is GEMM/HBM-dominated, not
dispatch-bound, so kernel fusion matters less than projection shape.

This probes the rest of the 3072-12288 band, interleaved, one process:

  n=4096:  g16 (is wider still better?)
  n=4096:  g4 UNFUSED (ns_impl='pallas') — deconfounds the r10_band4096
           A/B: D_bgs1_g8 was unfused by the VMEM gate, so g8's 145 TF
           could be the width OR the per-panel-chain path
  n=2048:  g8 UNFUSED — does the same effect reach the headline size?
  n=6144:  g4 (ships) vs g8
  n=8192:  g4 (ships) vs g8          [POLICY_MIXED_FAST]
  n=8192:  g4 vs g8 under POLICY_BF16_FAST (the 184.5 TF regime)

Usage: python experiments/r10_bandwide.py [rounds]
Appends to experiments/r10_bandwide.jsonl.
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
from mixedprecisionblockqr_tpu.ops.blockqr import (  # noqa: E402
    _block_qr_bgs,
    block_qr,
)
from mixedprecisionblockqr_tpu.ops.policy import (  # noqa: E402
    POLICY_BF16_FAST,
    POLICY_MIXED_FAST,
)
from mixedprecisionblockqr_tpu.utils.flops import qr_flops  # noqa: E402
from mixedprecisionblockqr_tpu.utils.timing import (  # noqa: E402
    time_step_amortized,
)

OUT = "/root/repo/experiments/r10_bandwide.jsonl"


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def factor_fn(pol, g, unfused):
    if unfused:
        # ns_impl='pallas' = per-panel fused NS chains, NO group kernel —
        # exactly what the VMEM gate silently gives g8 at 4096.  bgs1
        # rung semantics: reorth=False, robust_tail=1, chain_mid.
        def fac(x):
            Rf, Q, _ = _block_qr_bgs(
                x, 128, pol, True, None, group_panels=g, on_tpu=True,
                reorth=False, ns_impl="pallas", robust_tail=1,
                chain_mid=True)
            return Q, Rf
    else:
        def fac(x):
            Q, Rf = block_qr(x, 128, pol, mode="complete",
                             panel_method="bgs1", loop_mode="unroll",
                             group_panels=g, check="defer")
            return Q, Rf
    return fac


def make_step(fac):
    def step(x):
        Q, Rf = fac(x)
        return x * (1.0 + 1e-12 * Rf[0, 0].astype(jnp.float32))

    return step


VARIANTS = [
    ("4096_mixed_g16", 4096, POLICY_MIXED_FAST, 16, False),
    ("4096_mixed_g4_unfused", 4096, POLICY_MIXED_FAST, 4, True),
    ("2048_mixed_g8_unfused", 2048, POLICY_MIXED_FAST, 8, True),
    ("6144_mixed_g4", 6144, POLICY_MIXED_FAST, 4, False),
    ("6144_mixed_g8", 6144, POLICY_MIXED_FAST, 8, False),
    ("8192_mixed_g4", 8192, POLICY_MIXED_FAST, 4, False),
    ("8192_mixed_g8", 8192, POLICY_MIXED_FAST, 8, False),
    ("8192_bf16_g4", 8192, POLICY_BF16_FAST, 4, False),
    ("8192_bf16_g8", 8192, POLICY_BF16_FAST, 8, False),
]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rng = np.random.default_rng(0)
    mats = {}
    for n in sorted({n for _, n, _, _, _ in VARIANTS}):
        mats[n] = rng.random((n, n), dtype=np.float32) - 0.5

    # Quality triples + compile warm-up, one pass (relay batching).
    steps = {}
    for name, n, pol, g, unf in VARIANTS:
        a = mats[n]
        fac = factor_fn(pol, g, unf)
        Q, Rf = fac(jnp.asarray(a))
        rep = metrics.evaluate(a, np.asarray(Q, np.float32),
                               np.asarray(Rf, np.float32),
                               precision_bits=8)
        emit({"variant": name, "kind": "quality", "backward": rep.backward,
              "orth": rep.orthogonality, "criteria_ok": bool(rep.all_ok),
              "tight_ok": bool(rep.tight_ok)})
        assert rep.all_ok, (name, str(rep))
        del Q, Rf
        steps[name] = make_step(fac)

    for rnd in range(rounds):
        for name, n, pol, g, unf in VARIANTS:
            A = jnp.asarray(mats[n])
            sec = time_step_amortized(steps[name], A, iters=16, repeats=2)
            emit({"variant": name, "round": rnd, "sec": sec,
                  "tflops": qr_flops(n, n) / sec / 1e12})


if __name__ == "__main__":
    main()
