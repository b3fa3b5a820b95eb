"""Round-5b: lift the group kernel past the m <= 3072 robust-tail VMEM cap
with the store-back chain (``tail_spill``), and re-face-off 4096^2.

The measured scoped-VMEM OOM at m=4096/g4 (19.12 MB vs the 16 MB Mosaic
stack) is dominated by the robust three-pass chain's ~5 live m x r
intermediates; ``_robust_spill`` routes each pass's tall product through
the aliased group buffer instead.  This checks, on chip:

  1. does a robust-tail group at m=4096 (and 5120/8192) now COMPILE with
     tail_spill (the control without it OOMs)?
  2. quality parity (criteria + tight + canary clean) vs the shipping
     4096^2 auto path (bgs1 g4, robust groups through per-panel kernels),
  3. time: group-kernel-everywhere + tail_spill vs the shipping auto path.

Writes experiments/r5_group4096.jsonl.
"""

import json
import os
import sys

os.environ["MPBQR_GROUP_ANY_M"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.pallas.ns import bgs_group_fused
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = "/root/repo/experiments/r5_group4096.jsonl"


def kernel_compiles(m, r, g, tail_spill):
    """Can a robust-tail group kernel compile/run at this m?"""
    rng = np.random.default_rng(1)
    Pg = jnp.asarray(rng.standard_normal((m, g * r)).astype(np.float32))
    iters = tuple(9 for _ in range(g))
    robust = tuple(j == g - 1 for j in range(g))
    try:
        Q, R, resid = bgs_group_fused(
            Pg, r, iters, robust, bf16_dots=True, chain_mid=True,
            tail_spill=tail_spill,
        )
        jax.block_until_ready(Q)
        return True, float(resid)
    except Exception as e:  # noqa: BLE001 — relay wraps the Mosaic OOM
        return False, str(e)[:160]


def main():
    rows = []
    with open(OUT, "w") as f:
        def emit(row):
            rows.append(row)
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)

        # 1. compile boundary
        for m in (4096, 5120, 8192):
            for spill in (False, True):
                ok, info = kernel_compiles(m, 128, 4, spill)
                emit({"probe": "compile", "m": m, "tail_spill": spill,
                      "ok": ok, "info": info})
                if not ok and spill:
                    return  # no point timing if the spill path OOMs too

        # 2+3. full 4096^2 factorization: shipping auto vs spill-groups.
        from mixedprecisionblockqr_tpu.ops.blockqr import (
            _block_qr_bgs,
            block_qr,
        )

        M = 4096
        a = np.random.default_rng(0).random((M, M), dtype=np.float32) - 0.5
        A = jnp.asarray(a)

        variants = {
            "auto_ship": jax.jit(lambda x: block_qr(
                x, 128, POLICY_MIXED_FAST, mode="complete",
                panel_method="auto", check="defer")),
        }

        def spill_driver(x):
            R_full, Q, _ = _block_qr_bgs(
                x, 128, POLICY_MIXED_FAST, True, None, group_panels=4,
                on_tpu=True, reorth=False, chain_mid=True,
                tail_spill=True,
            )
            return Q, R_full

        variants["spill_g4"] = jax.jit(spill_driver)

        for name, fn in variants.items():
          try:
            Q, R_full = fn(A)
            rep = metrics.evaluate(
                a, np.asarray(Q, np.float32), np.asarray(R_full, np.float32),
                precision_bits=POLICY_MIXED_FAST.precision_bits)
            ok = bool(rep.all_ok and rep.tight_ok
                      and np.isfinite(np.asarray(R_full[0, 0])))

            def step(x, fn=fn):
                Qc, R = fn(x)
                return x * (1.0 + 1e-12 * R[0, 0].astype(jnp.float32))

            seconds = time_step_amortized(step, A, iters=48)
            emit({"probe": "faceoff4096", "variant": name,
                  "us": round(seconds * 1e6, 1),
                  "tflops": round(qr_flops(M, M) / seconds / 1e12, 1),
                  "backward": rep.backward, "orth": rep.orthogonality,
                  "ok": ok})
          except Exception as e:  # noqa: BLE001 — record compile OOMs
            emit({"probe": "faceoff4096", "variant": name, "ok": False,
                  "error": str(e)[:200]})


if __name__ == "__main__":
    main()
