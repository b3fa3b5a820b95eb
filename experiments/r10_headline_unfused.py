"""Round-10: fused group kernel vs per-panel path AT THE HEADLINE (2048^2).

r10_bandwide measured the unfused per-panel path (ns_impl='pallas')
at 139.6/86.1/89.7 TF across rounds at 2048 g8 — high variance, iters=16
(sized for the 8192 arms, ~3 ms per measurement = tunnel-noise class at
this size).  The shipping fused group kernel measures a tight 104-107 in
its own sessions.  This is the decisive interleaved A/B: iters=96 (the
r10_r256 methodology), 3 arms, one process:

  A  ship: fused group kernel, g8 (public auto path)
  B  unfused per-panel chains, g8
  C  unfused per-panel chains, g16 (whole-matrix group: zero inter-group
     projections; per-panel kernels keep VMEM tiny so no gate)

Usage: python experiments/r10_headline_unfused.py [rounds]
Appends to experiments/r10_headline_unfused.jsonl.
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
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST  # noqa: E402
from mixedprecisionblockqr_tpu.utils.flops import qr_flops  # noqa: E402
from mixedprecisionblockqr_tpu.utils.timing import (  # noqa: E402
    time_step_amortized,
)

N = 2048
OUT = "/root/repo/experiments/r10_headline_unfused.jsonl"


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def fused_fac(x):
    Q, Rf = block_qr(x, 128, POLICY_MIXED_FAST, mode="complete",
                     panel_method="auto", check="defer")
    return Q, Rf


def unfused_fac(g):
    def fac(x):
        Rf, Q, _ = _block_qr_bgs(
            x, 128, POLICY_MIXED_FAST, True, None, group_panels=g,
            on_tpu=True, reorth=False, ns_impl="pallas", robust_tail=1,
            chain_mid=True)
        return Q, Rf
    return fac


VARIANTS = [
    ("A_fused_g8_ship", fused_fac),
    ("B_unfused_g8", unfused_fac(8)),
    ("C_unfused_g16", unfused_fac(16)),
]


def make_step(fac):
    def step(x):
        Q, Rf = fac(x)
        return x * (1.0 + 1e-12 * Rf[0, 0].astype(jnp.float32))
    return step


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    a = np.random.default_rng(0).random((N, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)

    steps = {}
    for name, fac in VARIANTS:
        Q, Rf = fac(A)
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
        for name, _ in VARIANTS:
            sec = time_step_amortized(steps[name], A, iters=96, repeats=2)
            emit({"variant": name, "round": rnd, "sec": sec,
                  "tflops": qr_flops(N, N) / sec / 1e12})


if __name__ == "__main__":
    main()
