"""Round-10 (round-4 VERDICT item 3): MIXED-policy certification of the
distributed BGS quality ladder at scale on the virtual 8-device CPU mesh.

The 16384^2 distributed certification (r5_dist_cert_cpu.jsonl) is
fp32-only; the FLAGSHIP policy is mixed/bf16 (the reference's
``dev_mixed_precision_block_qr``, Cuda/qr.cu:1049-1226, is the thing
being re-designed).  This runs the grouped scan tiers under POLICY_MIXED
and POLICY_BF16_FAST at 8192^2 (config-5 shape class; 16384^2 budget is
~8x) and commits the full metric triple per (policy, tier).

Expected quality (single-chip parity, BENCH_NOTES round-5 scan-reorth
fix): 'bgs2' scrubs inter-group drift at fp32 HIGHEST over a fp32 Qbuf
-> orth in the 2^-8-class of the bf16 GRAM noise or better; 'bgs1' is
the single-pass bf16 throughput rung -> orth ~1e-1 class, backward
2^-8*m class (the documented fast-rung trade).

Usage: python r10_dist_cert_mixed.py [n] [block] [group] [method] [policy]
With no args runs the full 4-config battery at 8192^2.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # Correctness timeouts, not perf knobs (see r5_dist_cert_cpu.py):
    # XLA's CPU collectives kill the process when a virtual device takes
    # too long between rendezvous under host contention.
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
from mixedprecisionblockqr_tpu.ops.policy import (  # noqa: E402
    POLICY_BF16_FAST,
    POLICY_MIXED,
)
from mixedprecisionblockqr_tpu.parallel.dist_qr import dist_block_qr  # noqa: E402

OUT = "/root/repo/experiments/r10_dist_cert_mixed.jsonl"

POLICIES = {"mixed": POLICY_MIXED, "bf16_fast": POLICY_BF16_FAST}


def run_one(n, r, g, pm, pol_name):
    pol = POLICIES[pol_name]
    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    a = np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)
    t0 = time.time()
    Q, R = dist_block_qr(
        jnp.asarray(a), mesh, block_size=r, policy=pol,
        mode="complete", loop_mode="scan", panel_method=pm,
        group_panels=g,
    )
    Q = jax.block_until_ready(Q)
    wall = time.time() - t0
    rep = metrics.evaluate(a, np.asarray(Q, np.float32), np.asarray(R),
                           precision_bits=pol.precision_bits)
    row = {
        "config": f"{n}^2 complete-Q dist_block_qr, 8-device CPU mesh, "
                  f"GROUPED scan {pm} g{g}, {pol_name}, block {r}",
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
    # bgs1 is the documented loose rung: require only the reference
    # criteria (2^-8*m); bgs2 must also hold the tight gate's class.
    assert rep.all_ok, f"criteria failed: {row}"
    return row


def main():
    if len(sys.argv) > 1:
        n = int(sys.argv[1])
        r = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        g = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        pm = sys.argv[4] if len(sys.argv) > 4 else "bgs2"
        pol = sys.argv[5] if len(sys.argv) > 5 else "mixed"
        run_one(n, r, g, pm, pol)
        return
    for pol_name in ("mixed", "bf16_fast"):
        for pm in ("bgs2", "bgs1"):
            run_one(8192, 128, 4, pm, pol_name)


if __name__ == "__main__":
    main()
