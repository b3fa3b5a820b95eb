"""16384^2 through the DISTRIBUTED driver on the 8-device CPU mesh via the
round-4 scan-mode distributed BGS tier (BCGS2 + robust three-pass panels,
Q by concatenation — no m x m Q-update GEMMs, ~2.6x fewer FLOPs than the
Yamamoto scan, which did not finish inside a 150-minute budget on this
host).  BASELINE config-5 shape; full metric triple."""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
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

OUT = "/root/repo/experiments/r4_dist16k_cpu.jsonl"


def main():
    n = 16384
    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    a = np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)
    t0 = time.time()
    Q, R = dist_block_qr(
        jnp.asarray(a), mesh, block_size=128, policy=POLICY_FP32,
        mode="complete", loop_mode="scan", panel_method="bgs1",
    )
    Q = jax.block_until_ready(Q)
    wall = time.time() - t0
    rep = metrics.evaluate(a, Q, R, precision_bits=23)
    row = {
        "config": "16384^2 complete-Q dist_block_qr, 8-device CPU mesh, "
                  "scan-BGS1 (single-pass + robust panels), fp32, block 128",
        "wall_s": round(wall, 1),
        "backward": rep.backward,
        "orthogonality": rep.orthogonality,
        "lower_trapezoid": rep.lower_trapezoid,
        "limit": rep.limit,
        "all_ok": rep.all_ok,
        "tight_ok": rep.tight_ok,
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)
    assert rep.all_ok, f"criteria failed: {rep}"


if __name__ == "__main__":
    main()
