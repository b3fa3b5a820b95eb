"""Round-5, VERDICT items 7 + 8:

7. 4096^2 face-off — auto's current champion 'cholqr1' (150 TF round-2) vs
   'bgs1' g4 now that (a) the group kernel's VMEM gate admits m=4096 at g4
   (8 MB buffer vs the 10 MB quota; only the robust-tail group falls back
   to per-panel kernels) and (b) chain_mid halves the chain's MXU passes.
   Winner updates resolve_panel_config.

8. The pivoted-QR cliff, quantified: pivoted_qr / lstsq_pivoted wall at
   n = 512/1024/2048 on chip — the price of the lstsq rank-tripwire
   reroute (models/lstsq.py), previously uncommitted.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _jitted_driver
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED, POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = "/root/repo/experiments/r5_band4096_pivoted.jsonl"


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def faceoff_4096():
    M = N = 4096
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    cases = [
        ("cholqr1", dict(panel_method="cholqr1", group_panels=4,
                         policy=POLICY_MIXED)),
        ("bgs1_g4_mixed_fast", dict(panel_method="bgs1", group_panels=4,
                                    policy=POLICY_MIXED_FAST)),
        ("bgs1_g4_mixed", dict(panel_method="bgs1", group_panels=4,
                               policy=POLICY_MIXED)),
    ]
    fns = {
        name: _jitted_driver(128, kw["policy"], True, False,
                             kw["panel_method"], "unroll", True,
                             kw["group_panels"])
        for name, kw in cases
    }
    for name, fn in fns.items():
        R_full, Q, _ = fn(A)
        rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R_full),
                               precision_bits=8)
        emit({"case": name, "kind": "quality", "backward": rep.backward,
              "orth": rep.orthogonality, "ok": bool(rep.all_ok),
              "tight": bool(rep.tight_ok)})
    for rep_i in range(2):
        for name, fn in fns.items():
            def step(x, fn=fn):
                R_full, Qc, _ = fn(x)
                return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))

            sec = time_step_amortized(step, A, iters=24)
            emit({"case": name, "rep": rep_i, "us": round(sec * 1e6, 1),
                  "tflops": round(qr_flops(M, N) / sec / 1e12, 1)})


def pivoted_cliff():
    from mixedprecisionblockqr_tpu.models.lstsq import lstsq_pivoted
    from mixedprecisionblockqr_tpu.ops.pivoted import pivoted_qr

    for n in (512, 1024, 2048):
        a = np.random.default_rng(1).random((n, n), dtype=np.float32) - 0.5
        A = jnp.asarray(a)

        def step(x):
            R, perm = pivoted_qr(x, mode="r")
            return x * (1.0 + 1e-12 * R[0, 0])

        sec = time_step_amortized(step, A, iters=4)
        emit({"case": f"pivoted_qr_{n}", "ms": round(sec * 1e3, 2)})
    # The lstsq reroute price end-to-end (includes host round trips).
    import time as _t

    n = 1024
    a = np.random.default_rng(2).random((n, n), dtype=np.float32) - 0.5
    b = np.random.default_rng(3).random((n,), dtype=np.float32)
    x = lstsq_pivoted(a, b)  # compile
    jax.block_until_ready(x)
    t0 = _t.perf_counter()
    for _ in range(3):
        jax.block_until_ready(lstsq_pivoted(a, b))
    emit({"case": "lstsq_pivoted_1024_wall",
          "ms": round((_t.perf_counter() - t0) / 3 * 1e3, 1)})


if __name__ == "__main__":
    faceoff_4096()
    pivoted_cliff()
