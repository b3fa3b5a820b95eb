"""Drive the distributed driver on the REAL chip (1-device mesh) with the
fused ninv kernel path (on_tpu=True inside shard_map)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh
from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.policy import POLICY_FP32
from mixedprecisionblockqr_tpu.parallel.dist_qr import dist_block_qr

print(jax.devices(), flush=True)
mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
a = np.random.default_rng(0).standard_normal((1024, 512)).astype(np.float32)
Q, R = dist_block_qr(a, mesh, block_size=128, policy=POLICY_FP32,
                     mode="complete", panel_method="cholqr2s",
                     loop_mode="scan")
rep = metrics.evaluate(a, Q, R, precision_bits=23)
print("dist-on-TPU (ninv kernel):", rep.all_ok,
      f"{rep.backward:.1e}/{rep.orthogonality:.1e}", flush=True)
assert rep.all_ok, str(rep)
