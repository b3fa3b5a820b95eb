"""Round-8 adversarial battery over the RQRCP pivoted tier.

Contract under test (CPU backend): ``pivoted_qr(method='rqrcp')`` ALWAYS
returns a valid rank-revealing factorization — exact reconstruction of
A[:, perm], orthonormal Q, valid permutation, and a numerical rank within
2 of the float64 scipy QP3 oracle's — falling back to the exact tier
transparently when its NS panels poison.  Silent garbage is the only
failure mode that counts.

Run: JAX_PLATFORMS=cpu python experiments/r8_rqrcp_battery.py
Writes experiments/r8_rqrcp_battery.jsonl
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import scipy.linalg  # noqa: E402

import mixedprecisionblockqr_tpu as mpq  # noqa: E402
from mixedprecisionblockqr_tpu.ops.pivoted import (  # noqa: E402
    numerical_rank,
    pivoted_qr,
)

N = 512
R_BLK = 128


def inputs():
    rng = np.random.default_rng(0)
    yield "posuni", rng.random((N, N))
    yield "colgraded", rng.standard_normal((N, N)) * np.logspace(-6, 6, N)[None, :]
    U = np.linalg.qr(rng.standard_normal((N, 50)))[0]
    V = np.linalg.qr(rng.standard_normal((N, 50)))[0]
    yield "lowrank50+1e-6", U @ V.T + 1e-6 * rng.standard_normal((N, N))
    A = rng.standard_normal((N, N))
    A[:, 100] = A[:, 99]
    yield "dupcol", A
    A = rng.standard_normal((N, N))
    A[:, 7] = 0.0
    yield "zerocol", A
    A = rng.standard_normal((N, N))
    A[:, 256:] = 0.0
    yield "halfzero", A
    i = np.arange(1, N + 1)
    yield "hilbert", 1.0 / (i[:, None] + i[None, :] - 1.0)
    t = np.linspace(0, 1, N)
    yield "vandermonde16", (np.vander(t, 16, increasing=True)
                            @ rng.standard_normal((16, N))
                            + 1e-4 * rng.standard_normal((N, N)))
    yield "rank1+noise", np.outer(i, i) / N + 1e-3 * rng.standard_normal((N, N))
    yield "near-eye", np.eye(N) + 1e-6 * rng.standard_normal((N, N))
    yield "posuni-x1e6", rng.random((N, N)) * 1e6
    yield "normal-x1e-12", rng.standard_normal((N, N)) * 1e-12
    yield "bierlaire1e6", mpq.utils.datagen.conditioned_matrix(
        N, condition_number=1e6, seed=3
    )


def main():
    out, bad = [], 0
    for name, a in inputs():
        a = np.ascontiguousarray(a, np.float32)
        try:
            Q, R, perm = pivoted_qr(a, mode="reduced", method="rqrcp",
                                    block_size=R_BLK)
        except Exception as e:  # noqa: BLE001
            rec = {"input": name, "outcome": "raised",
                   "err": f"{type(e).__name__}: {e}"[:140]}
            out.append(rec)
            bad += 1
            print(f"{name:16s} -> raised: {rec['err']}")
            continue
        Q = np.asarray(Q, np.float64)
        R = np.asarray(R, np.float64)
        perm = np.asarray(perm)
        scale = max(np.linalg.norm(a), 1e-30)
        recon = float(np.linalg.norm(a[:, perm] - Q @ R) / scale)
        orth = float(np.max(np.abs(Q.T @ Q - np.eye(N))))
        perm_ok = sorted(perm.tolist()) == list(range(N))
        r_ours = int(numerical_rank(R.astype(np.float32), m=N))
        _, Rs, _ = scipy.linalg.qr(a.astype(np.float64), pivoting=True)
        d = np.abs(np.diag(Rs))
        r_oracle = int(np.sum(d > np.finfo(np.float32).eps * N
                              * (d[0] + 1e-300)))
        ok = (recon < 2e-5 and orth < 2e-5 and perm_ok
              and abs(r_ours - r_oracle) <= 2)
        rec = {"input": name, "outcome": "ok" if ok else "FAIL",
               "recon": recon, "orth": orth, "rank": r_ours,
               "rank_oracle": r_oracle}
        if not ok:
            bad += 1
        out.append(rec)
        print(f"{name:16s} -> {rec['outcome']:5s} recon={recon:.1e} "
              f"orth={orth:.1e} rank={r_ours}/{r_oracle}")
    with open(os.path.join(os.path.dirname(__file__),
                           "r8_rqrcp_battery.jsonl"), "w") as f:
        for rec in out:
            f.write(json.dumps(rec) + "\n")
    print(f"violations: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
