"""Round-4 (round-2 VERDICT item 5c): bound the DISTRIBUTED driver's
dispatch overhead by running its program on a 1-device mesh on the real
chip, next to the single-chip driver on the same matrix, same session.

Config: 2048^2 complete-Q mixed, block 128.  Compares:
  * dist_block_qr (1-device mesh, unroll, cholqr2s reflector path)
  * dist_block_qr (1-device mesh, unroll, bgs1 tier — the new round-4 path)
  * single-chip _block_qr_bgs bgs1 g8 (the headline driver)
The dist/single gap at d=1 is pure driver overhead (collectives are
self-sends at d=1): the number multi-chip speedup projections must budget.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops import metrics
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_bgs
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
from mixedprecisionblockqr_tpu.parallel.dist_qr import (
    _jitted_dist_bgs,
    _jitted_dist_qr,
    _mesh_key,
)
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

M = N = 2048
BLOCK = 128
OUT = "/root/repo/experiments/r4_dist_d1_tpu.jsonl"


def record(name, sec, rep=None):
    rec = {"variant": name, "us": round(sec * 1e6, 1),
           "tflops": round(qr_flops(M, N) / sec / 1e12, 1)}
    if rep is not None:
        rec.update(backward=rep.backward, orth=rep.orthogonality,
                   ok=bool(rep.all_ok))
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
    key = _mesh_key(mesh)
    policy = POLICY_MIXED_FAST

    # --- single-chip headline driver (control) ---
    drv = jax.jit(lambda x: _block_qr_bgs(
        x, BLOCK, policy, True, None, group_panels=8, on_tpu=True,
        reorth=False, robust_tail=1))
    R_full, Q, _ = drv(A)
    rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R_full),
                           precision_bits=8)

    def step_single(x):
        R_full, Qc, _ = drv(x)
        return x * (1.0 + 1e-12 * R_full[0, 0].astype(jnp.float32))

    record("single_bgs1_g8", time_step_amortized(step_single, A, iters=96),
           rep)

    # --- dist BGS tier at d=1 ---
    fn_bgs = _jitted_dist_bgs(M, N, 1, BLOCK, policy, False, "rows", key,
                              False, 8, True)
    B0 = jnp.zeros((M, 1), jnp.float32)
    Qb, Rb, _ = fn_bgs(A, B0)
    repb = metrics.evaluate(a, np.asarray(Qb), np.asarray(Rb),
                            precision_bits=8)

    def step_dist_bgs(x):
        Qb, Rb, _ = fn_bgs(x, B0)
        return x * (1.0 + 1e-12 * Rb[0, 0].astype(jnp.float32))

    record("dist_bgs1_d1", time_step_amortized(step_dist_bgs, A, iters=48),
           repb)

    # --- dist reflector path at d=1 (round-3 structure) ---
    fn_ref = _jitted_dist_qr(M, N, 1, BLOCK, policy, True, False, "rows",
                             key, "cholqr2s", "unroll", True)
    Q0 = jnp.eye(M, dtype=policy.accum)
    A_out, Qt, _ = fn_ref(A, Q0, B0)

    def step_dist_ref(x):
        A_out, Qt, _ = fn_ref(x, Q0, B0)
        return x * (1.0 + 1e-12 * A_out[0, 0].astype(jnp.float32))

    record("dist_cholqr2s_d1",
           time_step_amortized(step_dist_ref, A, iters=24))


if __name__ == "__main__":
    main()
