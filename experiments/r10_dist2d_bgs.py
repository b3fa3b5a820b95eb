"""Round-10 (round-4 VERDICT item 6): the 2-D mesh BGS throughput tier —
perf/quality row at 4096^2 on the virtual (4 rows x 2 cols) CPU mesh.

``dist_block_qr_2d(panel_method='bgs'|'bgs1'|'bgs2')`` runs the flagship
Block Gram-Schmidt panel structure on the 2-D mesh
(``parallel/dist_qr2d.py::_dist2d_bgs_local``): Q by concatenation
sharded P(rows, cols), full-height panel Grams psum'd over rows,
coefficient blocks folded over cols, BCGS2 scrub + D9 rescrub on the
reorth rungs.  This certifies the reorth rung reaches fp32-class
orthogonality at 4096^2 under both fp32 and the mixed flagship policy,
and records the single-pass rung's documented trade.

CPU-mesh walls are a correctness/quality artifact, not a perf claim
(the virtual devices share one host); the perf story is the collective
count per panel (1 bcast + 1 psum-gram + 1 trailing psum + R folds).

Usage: python r10_dist2d_bgs.py [n] [block] [method] [policy]
With no args runs the 3-config battery at 4096^2.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # Correctness timeouts, not perf knobs (see r5_dist_cert_cpu.py).
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops import metrics  # noqa: E402
from mixedprecisionblockqr_tpu.ops.policy import (  # noqa: E402
    POLICY_FP32,
    POLICY_MIXED,
)
from mixedprecisionblockqr_tpu.parallel.dist_qr2d import (  # noqa: E402
    COLS_AXIS,
    dist_block_qr_2d,
)
from mixedprecisionblockqr_tpu.parallel.mesh import (  # noqa: E402
    ROWS_AXIS,
    make_mesh,
)

OUT = "/root/repo/experiments/r10_dist2d_bgs.jsonl"

POLICIES = {"fp32": POLICY_FP32, "mixed": POLICY_MIXED}


def run_one(n, r, pm, pol_name):
    pol = POLICIES[pol_name]
    mesh2d = make_mesh((4, 2), (ROWS_AXIS, COLS_AXIS))
    a = np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)
    t0 = time.time()
    Q, R = dist_block_qr_2d(
        jnp.asarray(a), mesh2d, block_size=r, policy=pol,
        mode="reduced", panel_method=pm,
    )
    Q = jax.block_until_ready(Q)
    wall = time.time() - t0
    bits = 23 if pm in ("bgs", "bgs2") else pol.precision_bits
    rep = metrics.evaluate(a, np.asarray(Q, np.float32), np.asarray(R),
                           precision_bits=bits)
    row = {
        "config": f"{n}^2 reduced-Q dist_block_qr_2d, 4x2 CPU mesh, "
                  f"{pm}, {pol_name}, block {r}",
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
    assert rep.all_ok, f"criteria failed: {row}"
    return row


def main():
    if len(sys.argv) > 1:
        n = int(sys.argv[1])
        r = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        pm = sys.argv[3] if len(sys.argv) > 3 else "bgs"
        pol = sys.argv[4] if len(sys.argv) > 4 else "mixed"
        run_one(n, r, pm, pol)
        return
    # The reorth rung under both policies (fp32-class orth is the claim),
    # plus the single-pass rung's documented trade under mixed.
    for pm, pol_name in (("bgs", "fp32"), ("bgs", "mixed"),
                         ("bgs1", "mixed")):
        run_one(4096, 128, pm, pol_name)


if __name__ == "__main__":
    main()
