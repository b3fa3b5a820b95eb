"""Round-5b: quality-ladder floor vs group width.

The BGS tiers' in-group drift is single-pass and bounded by the GROUP
width (docs/ALGORITHMS.md D3) — the reorth scrub only runs at group
boundaries — so the auto choice g8 (dispatch-optimal) may be leaving
orthogonality on the table at the smaller sizes:

  * fp32 quality='high' (bgs) at 1024 measured orth 5.6e-5 vs the
    claimed fp32-roundoff class (the 2048 record is 3.3e-6);
  * mixed bgs1 at 1024 wobbles around the tight gate 2^-8*sqrt(1024)
    = 0.125 (seeds land 0.10-0.13).

Sweep group_panels (8/4/2) x {fp32-bgs, mixed-bgs1} at 1024 and 2048:
orth + amortized time.  Writes experiments/r5_ladder_floor.jsonl.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
from mixedprecisionblockqr_tpu.ops.policy import POLICY_FP32, POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = "/root/repo/experiments/r5_ladder_floor.jsonl"


def main():
    with open(OUT, "w") as f:
        for m in (1024, 2048):
            a = np.random.default_rng(0).random((m, m), dtype=np.float32) - 0.5
            A = jnp.asarray(a)
            for tier, pol, reorth, bits in (
                ("bgs_fp32_high", POLICY_FP32, True, 23),
                ("bgs1_mixed_fast", POLICY_MIXED_FAST, False, 8),
            ):
                for g in (8, 4, 2):
                    @jax.jit
                    def fn(x, g=g, pol=pol, reorth=reorth):
                        R_full, Q, _ = _block_qr_bgs(
                            x, 128, pol, True, None, group_panels=g,
                            on_tpu=True, reorth=reorth,
                            chain_mid=not reorth,
                        )
                        return Q, R_full

                    try:
                        Q, R = fn(A)
                        rep = metrics.evaluate(
                            a, np.asarray(Q, np.float32),
                            np.asarray(R, np.float32), precision_bits=bits)

                        def step(x, fn=fn):
                            Qc, Rc = fn(x)
                            return x * (1.0 + 1e-12 *
                                        Rc[0, 0].astype(jnp.float32))

                        secs = time_step_amortized(step, A, iters=96)
                        row = {"tier": tier, "m": m, "g": g,
                               "us": round(secs * 1e6, 1),
                               "tflops": round(
                                   qr_flops(m, m) / secs / 1e12, 1),
                               "backward": rep.backward,
                               "orth": rep.orthogonality,
                               "ok": bool(rep.all_ok),
                               "tight": bool(rep.tight_ok)}
                    except Exception as e:  # noqa: BLE001
                        row = {"tier": tier, "m": m, "g": g, "ok": False,
                               "error": str(e)[:160]}
                    f.write(json.dumps(row) + "\n")
                    f.flush()
                    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
