"""Prototype: right-looking Block Gram-Schmidt QR with triangular-NS panels.

vs the reflector (Yamamoto/W-form) driver:
  * panels keep FULL height (aspect = m/r always) -> short NS chains,
  * NO Yamamoto S / Newton inverse / reflector merge,
  * Q materializes by CONCATENATION (zero Q-update GEMMs) — for square A,
    reduced Q == complete Q (the bench config),
  * R rows land directly in a separate (n, n) buffer.

Numerics: one-pass BCGS loses inter-block orthogonality ~ eps_f32*kappa(A)
— below bf16 noise for the mixed policy (the fp32-robust paths stay on the
reflector drivers).  Late panels' Grams inherit the trailing-corner
conditioning; iteration counts step up near the end.

Measures 2048^2 mixed complete-Q + quality; also re-times the (now
aspect-aware) grouped reflector driver for comparison.
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
from mixedprecisionblockqr_tpu.ops.blockqr import _block_qr_grouped
from mixedprecisionblockqr_tpu.ops.policy import POLICY_MIXED
from mixedprecisionblockqr_tpu.ops.polar import tri_inv_chol
from mixedprecisionblockqr_tpu.utils.flops import qr_flops
from mixedprecisionblockqr_tpu.utils.timing import time_step_amortized

_HI = jax.lax.Precision.HIGHEST
_H3 = jax.lax.Precision.HIGH
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "proto_bgs.jsonl")


def record(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def bgs_qr(A, r, policy, base_iters=6, gram_prec=_HI):
    m, n = A.shape
    nb = n // r
    A = A.astype(jnp.float32)
    R = jnp.zeros((n, n), jnp.float32)
    mm_t = lambda a, b: jnp.matmul(
        a.astype(policy.trailing), b.astype(policy.trailing),
        preferred_element_type=jnp.float32,
    )
    qcols = []
    for k in range(nb):
        lam = k * r
        P = A[:, lam : lam + r]
        G = jnp.matmul(P.T, P, precision=gram_prec)
        # late panels inherit the R-corner conditioning
        frac = k / nb
        iters = base_iters if frac < 0.85 else (12 if frac < 0.95 else 20)
        X = tri_inv_chol(G, iters=iters)
        t = jnp.triu(jnp.matmul(X.T, G, precision=_HI))
        Qk = jnp.matmul(P, X, precision=gram_prec)
        R = R.at[lam : lam + r, lam : lam + r].set(t)
        if lam + r < n:
            Ct = A[:, lam + r :]
            G1 = mm_t(Qk.T, Ct)
            A = A.at[:, lam + r :].set((Ct - mm_t(Qk, G1)).astype(A.dtype))
            R = R.at[lam : lam + r, lam + r :].set(G1)
        qcols.append(Qk)
    return R, jnp.concatenate(qcols, axis=1)


def main():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2048, 2048)).astype(np.float32)
    A0 = jnp.asarray(a)
    flops = qr_flops(2048, 2048)

    cases = [
        ("bgs_r128_i6", 128, 6, _HI),
        ("bgs_r128_i6_gramHIGH", 128, 6, _H3),
        ("bgs_r256_i6", 256, 6, _HI),
        ("bgs_r128_i5", 128, 5, _HI),
    ]
    for name, r, it, gp in cases:
        t0 = time.time()
        try:
            fn = jax.jit(lambda x, r=r, it=it, gp=gp: bgs_qr(
                x, r, POLICY_MIXED, it, gp))
            R, Q = jax.block_until_ready(fn(A0))
            Rf = np.zeros((2048, 2048), np.float32)
            Rf[: R.shape[0]] = np.asarray(R)
            rep = metrics.evaluate(a, np.asarray(Q), Rf, precision_bits=8)

            def step(x, fn=fn):
                R, Q = fn(x)
                return x * (1.0 + 1e-12 * (R[0, 0] + Q[0, 0]))

            s = time_step_amortized(step, A0, iters=96)
            record(probe=name, us=round(s * 1e6, 1),
                   tflops=round(flops / s / 1e12, 1),
                   backward=float(rep.backward), orth=float(rep.orthogonality),
                   ok=bool(rep.all_ok), tight=bool(rep.tight_ok),
                   compile_s=round(time.time() - t0, 1))
        except Exception as e:
            record(probe=name, error=repr(e)[:300])

    # updated grouped reflector driver (aspect-aware iters) for comparison
    for name, g in [("grouped_g4_aspectaware", 4)]:
        t0 = time.time()
        fn = jax.jit(lambda x, g=g: _block_qr_grouped(
            x, 128, POLICY_MIXED, True, None, group_panels=g, on_tpu=True))
        R_full, Q, _ = jax.block_until_ready(fn(A0))
        rep = metrics.evaluate(a, np.asarray(Q), np.asarray(R_full),
                               precision_bits=8)

        def step(x, fn=fn):
            R_full, Q, _ = fn(x)
            return x * (1.0 + 1e-12 * (R_full[0, 0] + Q[0, 0]))

        s = time_step_amortized(step, A0, iters=96)
        record(probe=name, us=round(s * 1e6, 1),
               tflops=round(flops / s / 1e12, 1),
               backward=float(rep.backward), orth=float(rep.orthogonality),
               ok=bool(rep.all_ok), tight=bool(rep.tight_ok),
               compile_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
