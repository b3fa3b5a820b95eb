import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import mixedprecisionblockqr_tpu as mpq
print(jax.devices(), flush=True)
rng = np.random.default_rng(0)
A = rng.standard_normal((1024, 1024)).astype(np.float32)
Q, R = mpq.block_qr(A, block_size=128, policy=mpq.POLICY_MIXED,
                    mode="complete", panel_method="bgs1")
print("bgs1(group):", mpq.metrics.evaluate(A, Q, R, precision_bits=8).all_ok, flush=True)
Q2, R2 = mpq.block_qr(A, block_size=128, policy=mpq.POLICY_MIXED,
                      mode="complete", panel_method="bgs", loop_mode="scan")
rep2 = mpq.metrics.evaluate(A, Q2, R2, precision_bits=8)
print("bgs scan:", rep2.all_ok, f"{rep2.backward:.1e}/{rep2.orthogonality:.1e}", flush=True)
x = mpq.lstsq(A[:, :512], np.ones((1024,), np.float32))
print("lstsq finite:", bool(np.isfinite(np.asarray(x)).all()), flush=True)
