"""Round-3 VERDICT item 5 (part 2): 8192^2 COMPLETE-Q run through the
distributed driver on the virtual 8-device CPU mesh, full metric triple
asserted against the acceptance criteria.  Records MULTICHIP_r02 evidence.
"""

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixedprecisionblockqr_tpu.ops import metrics  # noqa: E402
from mixedprecisionblockqr_tpu.ops.policy import POLICY_FP32  # noqa: E402
from mixedprecisionblockqr_tpu.parallel.dist_qr import dist_block_qr  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3_dist8192_cpu.jsonl")


def main():
    n = int(os.environ.get("N", "8192"))
    pm = os.environ.get("PM", "cholqr2s")
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("rows",))
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32)
    t0 = time.time()
    Q, R = dist_block_qr(
        jnp.asarray(a), mesh, block_size=int(os.environ.get("BLOCK", "256")), policy=POLICY_FP32,
        mode="complete", loop_mode="scan", panel_method=pm,
    )
    Q = jax.block_until_ready(Q)
    wall = time.time() - t0
    rep = metrics.evaluate(a, Q, R, precision_bits=23)
    row = {
        "config": f"{n}^2 complete-Q dist_block_qr, 8-device CPU mesh, "
                  f"scan mode, POLICY_FP32/{pm}, block " + os.environ.get("BLOCK", "256"),
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
