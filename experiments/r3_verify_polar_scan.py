import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import mixedprecisionblockqr_tpu as mpq
print(jax.devices(), flush=True)
rng = np.random.default_rng(0)
A = rng.standard_normal((1024, 1024)).astype(np.float32)
# polar driver now runs its chains as Mosaic kernels on TPU
Q, R = mpq.block_qr(A, block_size=128, policy=mpq.POLICY_MIXED,
                    mode="complete", panel_method="polar")
rep = mpq.metrics.evaluate(A, Q, R, precision_bits=8)
print("polar(kernels):", rep.all_ok, f"{rep.backward:.1e}/{rep.orthogonality:.1e}", flush=True)
# scan driver with fused ninv
Q2, R2 = mpq.block_qr(A, block_size=128, policy=mpq.POLICY_MIXED,
                      mode="complete", panel_method="cholqr1", loop_mode="scan")
rep2 = mpq.metrics.evaluate(A, Q2, R2, precision_bits=8)
print("scan(ninv kernel):", rep2.all_ok, f"{rep2.backward:.1e}/{rep2.orthogonality:.1e}", flush=True)
