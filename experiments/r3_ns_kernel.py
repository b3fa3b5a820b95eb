"""Round-3: fused NS-chain Pallas kernel in the bgs driver, on-chip.

Also micro-measures the kernel standalone (amortized chain) vs the XLA op
chain it replaces.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
from mixedprecisionblockqr_tpu.ops.pallas.ns import ns_chain
from mixedprecisionblockqr_tpu.ops.polar import tri_inv_chol
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3_ns_kernel.jsonl")


def record(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def micro():
    rng = np.random.default_rng(1)
    P = rng.standard_normal((2048, 128)).astype(np.float32)
    G0 = jnp.asarray(P.T @ P)

    def step_kernel(G):
        X, t, resid = ns_chain(G, iters=6)
        return G * (1.0 + 1e-12 * (X[0, 0] + t[0, 0] + resid))

    def step_xla(G):
        X = tri_inv_chol(G, iters=6)
        t = jnp.triu(jnp.matmul(X.T, G, precision=jax.lax.Precision.HIGHEST))
        return G * (1.0 + 1e-12 * (X[0, 0] + t[0, 0]))

    for name, fn in [("ns_kernel_128_i6", step_kernel),
                     ("ns_xla_128_i6", step_xla)]:
        s = time_step_amortized(jax.jit(fn), G0, iters=512)
        record(probe=name, us=round(s * 1e6, 2))


def drivers():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2048, 2048)).astype(np.float32)
    A0 = jnp.asarray(a)
    flops = qr_flops(2048, 2048)

    cases = [
        ("pallas_r128_g4", 128, 4, False, "pallas"),
        ("pallas_r128_g4_reorth", 128, 4, True, "pallas"),
        ("pallas_r128_g8", 128, 8, False, "pallas"),
        ("pallas_r256_g2", 256, 2, False, "pallas"),
    ]
    for name, r, g, reorth, impl in cases:
        t0 = time.time()
        try:
            if impl == "scan":
                from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs_scan
                fn = jax.jit(lambda x, r=r, reorth=reorth: _block_qr_bgs_scan(
                    x, r, POLICY_MIXED, True, None, True, reorth=reorth))
            else:
                fn = jax.jit(lambda x, r=r, g=g, reorth=reorth, impl=impl:
                             _block_qr_bgs(x, r, POLICY_MIXED, True, None, g,
                                           True, reorth=reorth, ns_impl=impl))
            R_full, Q, _ = jax.block_until_ready(fn(A0))
            rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R_full),
                                   precision_bits=8)

            def step(x, fn=fn):
                R_full, Q, _ = fn(x)
                return x * (
                    1.0 + 1e-12 * (R_full[0, 0] + Q[0, 0].astype(jnp.float32))
                )

            s = time_step_amortized(step, A0, iters=96)
            record(probe=name, us=round(s * 1e6, 1),
                   tflops=round(flops / s / 1e12, 1),
                   backward=float(rep.backward), orth=float(rep.orthogonality),
                   ok=bool(rep.all_ok), tight=bool(rep.tight_ok),
                   compile_s=round(time.time() - t0, 1))
        except Exception as e:
            record(probe=name, error=repr(e)[:300])


def drivers2():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2048, 2048)).astype(np.float32)
    A0 = jnp.asarray(a)
    flops = qr_flops(2048, 2048)
    import os
    only = os.environ.get("CASES", "fused_r128_g4,fused_r128_g4_reorth,fused_r128_g2")
    cases = [c for c in [
        ("fused_r128_g4", 128, 4, False, "fused"),
        ("fused_r128_g4_reorth", 128, 4, True, "fused"),
        ("fused_r128_g2", 128, 2, False, "fused"),
        ("bgs_scan_2048", 128, 0, True, "scan"),
        ("bgs1_scan_2048", 128, 0, False, "scan"),
        ("group_r128_g4", 128, 4, False, "group"),
        ("group_r128_g4_reorth", 128, 4, True, "group"),
        ("group_r128_g8", 128, 8, False, "group"),
    ] if c[0] in only.split(",")]
    for name, r, g, reorth, impl in cases:
        t0 = time.time()
        try:
            if impl == "scan":
                from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs_scan
                fn = jax.jit(lambda x, r=r, reorth=reorth: _block_qr_bgs_scan(
                    x, r, POLICY_MIXED, True, None, True, reorth=reorth))
            else:
                fn = jax.jit(lambda x, r=r, g=g, reorth=reorth, impl=impl:
                             _block_qr_bgs(x, r, POLICY_MIXED, True, None, g,
                                           True, reorth=reorth, ns_impl=impl))
            R_full, Q, _ = jax.block_until_ready(fn(A0))
            rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R_full),
                                   precision_bits=8)
            def step(x, fn=fn):
                R_full, Q, _ = fn(x)
                return x * (1.0 + 1e-12 * (R_full[0, 0] + Q[0, 0].astype(jnp.float32)))
            s = time_step_amortized(step, A0, iters=96)
            record(probe=name, us=round(s * 1e6, 1),
                   tflops=round(flops / s / 1e12, 1),
                   backward=float(rep.backward), orth=float(rep.orthogonality),
                   ok=bool(rep.all_ok), tight=bool(rep.tight_ok),
                   compile_s=round(time.time() - t0, 1))
        except Exception as e:
            record(probe=name, error=repr(e)[:300])


if __name__ == "__main__":
    drivers2()
