"""Round-9: fused X/W recurrence A/B on the 2048^2 headline config.

The classic triangular-NS iteration issues three dependent r x r dots
(W = G X, M = X^T W, X += om X C); the fused form carries W = G X by the
same right-multiplication as X (S = [X; W], S += om S C — one (2r, r)
dot), cutting in-kernel dot count ~1/3 on all but the final two classic
iterations (ops/pallas/ns.py::_tri_ns docstring).

The env knob MPBQR_NO_FUSE_XW=1 restores the classic chain at trace
time, so A/B runs as alternating SUBPROCESSES of this same script
(child mode: ``one <label>``) — back-to-back on the same chip session,
fused/classic/fused/classic, which is the bimodality guard CLAUDE.md
requires (treat <20% spreads as noise unless interleaved A/B says
otherwise).  Quality (backward/orth vs the reference criteria) is
asserted in every child.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

M = N = 2048
OUT = "/root/repo/experiments/r9_fused_xw.jsonl"


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
        "fused": os.environ.get("MPBQR_NO_FUSE_XW") != "1",
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
        for label, env in (("fused", "0"), ("classic", "1")):
            e = dict(os.environ, MPBQR_NO_FUSE_XW=env)
            subprocess.run(
                [sys.executable, __file__, "one", f"{label}-{i}"],
                env=e, check=True, timeout=1200,
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        child(sys.argv[2])
    else:
        main()
