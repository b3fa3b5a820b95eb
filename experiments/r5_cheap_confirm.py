"""Confirm the cheap_mid winner: interleaved reps vs shipping + multi-seed
quality on the candidate.  Appends to experiments/r5_cheap.jsonl."""
import json, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

def driver(kw):
    @jax.jit
    def fn(A):
        R_full, Q, _ = _block_qr_bgs(A, 128, POLICY_MIXED_FAST, True, None,
                                     group_panels=8, on_tpu=True,
                                     reorth=False, robust_tail=1, **kw)
        return Q, R_full
    return fn

fns = {"mid_ship": driver(dict(chain_mid=True)),
       "cheap_mid": driver(dict(chain_mid=True, chain_cheap=True))}
A = jnp.asarray(np.random.default_rng(0).random((2048, 2048), dtype=np.float32) - 0.5)
out = open("/root/repo/experiments/r5_cheap.jsonl", "a")
for rep in range(3):
    for name, fn in fns.items():
        def step(x, fn=fn):
            Qc, R = fn(x)
            return x * (1.0 + 1e-12 * R[0, 0].astype(jnp.float32))
        s = time_step_amortized(step, A, iters=96)
        row = {"confirm": name, "rep": rep, "us": round(s*1e6,1),
               "tflops": round(qr_flops(2048,2048)/s/1e12,1)}
        out.write(json.dumps(row)+"\n"); out.flush(); print(json.dumps(row), flush=True)
# multi-seed quality for the candidate
for seed in (1, 2, 3):
    a = np.random.default_rng(seed).random((2048, 2048), dtype=np.float32) - 0.5
    Q, R = fns["cheap_mid"](jnp.asarray(a))
    fin = bool(np.isfinite(np.asarray(R[0,0])))
    repq = metrics.evaluate(a, np.asarray(Q,np.float32), np.asarray(R,np.float32), precision_bits=8) if fin else None
    row = {"confirm": "cheap_mid_seed", "seed": seed, "finite": fin,
           "ok": bool(repq.all_ok and repq.tight_ok) if repq else False,
           "orth": repq.orthogonality if repq else None}
    out.write(json.dumps(row)+"\n"); out.flush(); print(json.dumps(row), flush=True)
