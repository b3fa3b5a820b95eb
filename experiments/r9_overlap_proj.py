"""Round-9: overlapped in-group projection A/B on the 2048^2 headline config.

The eager projection's first GEMM re-associates as Qk^T C = X^T (P^T C);
Y = P^T C is independent of the panel's NS chain, so tracing it before
the chain gives Mosaic's scheduler a big MXU op to fill the
latency-bound chain's pipeline bubbles with (ops/pallas/ns.py::
_bgs_group_kernel overlap branch — bf16 tiers only).

MPBQR_NO_OVERLAP_PROJ=1 restores the classic order at trace time, so the
A/B runs as alternating SUBPROCESSES (child mode: ``one <label>``) —
interleaved on the same chip session per the CLAUDE.md bimodality guard.
Quality is asserted in every child.

HISTORICAL (round-9 negative result): the overlap branch measured a
REGRESSION and was reverted from ops/pallas/ns.py before commit — it was
never in a committed tree (the result is recorded in BENCH_NOTES round 9
and r9_overlap_proj.jsonl).  The guard below makes a rerun at HEAD fail
loudly instead of silently timing identical code in both arms.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import pathlib

_NS_SRC = pathlib.Path(
    "/root/repo/mixedprecisionblockqr_tpu/ops/pallas/ns.py"
).read_text()
assert "MPBQR_NO_OVERLAP_PROJ" in _NS_SRC, (
    "ops/pallas/ns.py no longer consumes MPBQR_NO_OVERLAP_PROJ — the "
    "overlap-projection variant was reverted (round-9 negative result); "
    "re-apply the variant branch before rerunning this A/B, otherwise "
    "both arms measure identical code."
)

M = N = 2048
OUT = "/root/repo/experiments/r9_overlap_proj.jsonl"


def child(label: str) -> None:
    import numpy as np
    import jax.numpy as jnp

    from mixedprecisionblockqr_tpu.ops import metrics
    from mixedprecisionblockqr_tpu.ops.blockqr import block_qr
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
    from mixedprecisionblockqr_tpu.utils.flops import qr_flops
    from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)

    def step(x):
        Q, Rf = block_qr(x, 128, POLICY_MIXED_FAST, mode="complete",
                         panel_method="auto", check="defer")
        return x * (1.0 + 1e-12 * Rf[0, 0].astype(jnp.float32))

    sec = time_step_amortized(step, A, iters=96, repeats=3)
    Q, Rf = block_qr(A, 128, POLICY_MIXED_FAST, mode="complete",
                     panel_method="auto", check="defer")
    rep = metrics.evaluate(a, np.asarray(Q), np.asarray(Rf),
                           precision_bits=POLICY_MIXED_FAST.precision_bits)
    rec = {
        "label": label,
        "overlap": os.environ.get("MPBQR_NO_OVERLAP_PROJ") != "1",
        "sec": sec,
        "tflops": qr_flops(M, N) / sec / 1e12,
        "backward": rep.backward,
        "orth": rep.orthogonality,
        "criteria_ok": rep.all_ok,
        "tight_ok": rep.tight_ok,
    }
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    for i in range(3):
        for label, env in (("overlap", "0"), ("classic", "1")):
            e = dict(os.environ, MPBQR_NO_OVERLAP_PROJ=env)
            subprocess.run(
                [sys.executable, __file__, "one", f"{label}-{i}"],
                env=e, check=True, timeout=1800,
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        child(sys.argv[2])
    else:
        main()
