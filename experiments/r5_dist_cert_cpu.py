"""Round-5 (round-3 VERDICT item 2): BASELINE config-5 certification of the
GROUPED scan-mode distributed BGS tier on the virtual 8-device CPU mesh.

The round-4 attempt found the Yamamoto-scan + cholqr2s tier COLLAPSES at
16384^2 (backward 0.128 / orth 0.985 — r4_dist16k_cpu.jsonl) and the
per-panel dist-BGS replacement blew the host budget (every panel = 2
full-width Qbuf passes + 3 Gram collectives).  The grouped scan tier cuts
the dominant Qbuf traffic and full-width collectives by g and runs the
plain 1-collective chain on pre-tail panels (lax.cond) — this script
certifies it with the full metric triple, at `--n 4096` (budget probe,
cost scales ~n^3) then `--n 16384` (the config-5 shape).

Usage: python r5_dist_cert_cpu.py [n] [block_size] [group_panels] [method]

Round-5 finding (committed rows below): bgs1 g4 at 16384^2 finishes the
31-minute run with backward 2.7e-7 but orth 4.0e-3 — single-pass
inter-GROUP CGS drift over nb/g = 16 groups breaks the 2^-23*m = 1.95e-3
criterion.  The fix is the 'bgs2' scan tier (grouped inter-group BCGS2:
the double Qbuf pass scrubs each group against all previous groups before
factoring, killing exactly the drift term that grows with n/r, at 2x the
bgs1 traffic instead of the per-panel 'bgs' tier's 4x).
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # XLA's CPU collectives hard-kill the process when any virtual
    # device takes >40 s to reach a rendezvous (rendezvous.cc).  At
    # 16384^2 each device's local GEMM stretch between collectives
    # legitimately exceeds that under host contention — two runs died
    # mid-flight on the FIRST all-reduce.  These are correctness
    # timeouts, not perf knobs: raise them to hours for the cert.
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops import metrics  # noqa: E402
from mixedprecisionblockqr_tpu.ops.policy import POLICY_FP32  # noqa: E402
from mixedprecisionblockqr_tpu.parallel.dist_qr import dist_block_qr  # noqa: E402

OUT = "/root/repo/experiments/r5_dist_cert_cpu.jsonl"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    g = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    pm = sys.argv[4] if len(sys.argv) > 4 else "bgs1"
    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    a = np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)
    t0 = time.time()
    Q, R = dist_block_qr(
        jnp.asarray(a), mesh, block_size=r, policy=POLICY_FP32,
        mode="complete", loop_mode="scan", panel_method=pm,
        group_panels=g,
    )
    Q = jax.block_until_ready(Q)
    wall = time.time() - t0
    rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R),
                           precision_bits=23)
    row = {
        "config": f"{n}^2 complete-Q dist_block_qr, 8-device CPU mesh, "
                  f"GROUPED scan {pm} g{g}, fp32, block {r}",
        "wall_s": round(wall, 1),
        "backward": rep.backward,
        "orthogonality": rep.orthogonality,
        "lower_trapezoid": rep.lower_trapezoid,
        "limit": rep.limit,
        "all_ok": bool(rep.all_ok),
        "tight_ok": bool(rep.tight_ok),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)
    assert rep.all_ok, f"criteria failed: {rep}"


if __name__ == "__main__":
    main()
