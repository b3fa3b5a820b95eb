"""Round-5 follow-through: chain_mid (emulated-HIGH early NS iterations,
3-pass bf16 Dekker split) extended PAST the group kernel to the per-panel
kernel paths — the ones the large sizes actually take:

  * 8192^2  — _block_qr_bgs falls back to per-panel ns_chain +
              tri_cholqr_robust_fused (the m x g*r group buffer exceeds
              the VMEM quota at this m), so until now chain_mid silently
              did nothing there;
  * 16384^2 — _block_qr_bgs_scan's every-panel robust three-pass chain
              (panel_qr_fused(robust=True)): 30 NS iterations per panel
              at HIGHEST, now all but the closing 2 of each pass at
              emulated HIGH.

Controls are the round-4 champions (r4_scale8k.jsonl): 8192 bf16res g4
(11.76 ms / 155.8 TF) and 16384 grouped scan g4 (134.5 ms / 109 TF).
Expectation is modest at 8192 (HBM-bound regime) and real at 16384 only
if the panel chains matter next to the Qbuf traffic — either way the
result decides whether the wiring stays default for bgs1.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import (
    _block_qr_bgs,
    _block_qr_bgs_scan,
)
from mixedprecisionblockqr_tpu.ops.policy import (
    POLICY_BF16_FAST,
    POLICY_MIXED_FAST,
)
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = "/root/repo/experiments/r5_scale_mid.jsonl"


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def measure(name, drv, A, a_ref, m, n, iters):
    R_full, Q, _ = drv(A)
    rep = metrics.evaluate(a_ref, Q, R_full, precision_bits=8)

    def step(x):
        R_full, Qc, _ = drv(x)
        return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))

    sec = time_step_amortized(step, A, iters=iters)
    emit({"variant": name, "ms": round(sec * 1e3, 2),
          "tflops": round(qr_flops(m, n) / sec / 1e12, 1),
          "backward": rep.backward, "orth": rep.orthogonality,
          "ok": bool(rep.all_ok), "tight": bool(rep.tight_ok)})


def case_8192():
    m = n = 8192
    a = np.random.default_rng(0).random((m, n), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    for name, mid in [("8192_bf16res_g4_ctl", False),
                      ("8192_bf16res_g4_mid", True)]:
        try:
            drv = jax.jit(lambda x, _mid=mid: _block_qr_bgs(
                x, 128, POLICY_BF16_FAST, True, None, group_panels=4,
                on_tpu=True, reorth=False, chain_mid=_mid))
            measure(name, drv, A, a, m, n, iters=8)
        except Exception as e:
            emit({"variant": name, "error": str(e)[:300]})


def case_16384():
    m = n = 16384
    A = jax.random.uniform(jax.random.PRNGKey(0), (m, n),
                           jnp.float32, -0.5, 0.5)
    A = jax.block_until_ready(A)
    for name, mid in [("scan16k_g4_ctl", False), ("scan16k_g4_mid", True)]:
        try:
            drv = jax.jit(lambda x, _mid=mid: _block_qr_bgs_scan(
                x, 128, POLICY_MIXED_FAST, True, None, on_tpu=True,
                reorth=False, group_panels=4, chain_mid=_mid))
            measure(name, drv, A, A, m, n, iters=4)
        except Exception as e:
            emit({"variant": name, "error": str(e)[:300]})


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "8192"):
        case_8192()
    if which in ("both", "16384"):
        case_16384()
