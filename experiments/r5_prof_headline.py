"""Round-5: profile the locked 2048^2 headline config (public qr path,
bgs1 g8 robust_tail=1 chain_mid, POLICY_MIXED_FAST) to see where the
remaining ~100 us over the ~145 us bf16-peak floor goes — group-kernel
device time vs trailing-projection GEMMs vs glue (R scatters, casts).

Writes a jax.profiler trace under experiments/prof/headline_r5/ and
prints the top device ops by self time (parsed from the trace proto).
"""

import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.ops.blockqr import block_qr

M = N = 2048
LOGDIR = "/root/repo/experiments/prof/headline_r5"


def main():
    a = np.random.default_rng(0).random((M, N), dtype=np.float32) - 0.5
    A = jnp.asarray(a)
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED_FAST
    fn = jax.jit(lambda x: block_qr(
        x, 128, POLICY_MIXED_FAST, mode="complete", panel_method="auto",
        check="defer"))
    out = fn(A)
    jax.block_until_ready(out)
    jax.profiler.start_trace(LOGDIR)
    for _ in range(20):
        out = fn(A)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print("trace written", flush=True)


if __name__ == "__main__":
    main()
