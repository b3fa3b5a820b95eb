"""Round-7 adversarial input battery over the PUBLIC qr() surface.

Contract under test (CPU backend, every quality rung):
  * ``check='sync'``  — ALWAYS returns a factorization passing the
    acceptance criteria (transparent robust retry), or raises;
  * ``check='defer'`` — either passes criteria or is LOUDLY poisoned
    (NaN canary in R[0,0]); silent garbage is the only failure.

Input classes chosen for structure the random-calibration path never
sees (the round-7 head-panel stall came from exactly such a class —
the reference's own positive-uniform generator).

Run: JAX_PLATFORMS=cpu python experiments/r7_hostile_battery.py
Writes experiments/r7_hostile_battery.jsonl
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import mixedprecisionblockqr_tpu as mpq  # noqa: E402
from mixedprecisionblockqr_tpu.ops import metrics  # noqa: E402

N = 512
R_BLK = 64


def inputs():
    rng = np.random.default_rng(0)
    yield "posuni", rng.random((N, N))
    yield "rademacher", rng.choice([-1.0, 1.0], (N, N))
    g = rng.standard_normal((N, N))
    yield "colgraded", g * np.logspace(-6, 6, N)[None, :]
    yield "rowgraded", g * np.logspace(-6, 6, N)[:, None]
    U = np.linalg.qr(rng.standard_normal((N, 50)))[0]
    V = np.linalg.qr(rng.standard_normal((N, 50)))[0]
    yield "lowrank50+1e-6", U @ V.T * 1.0 + 1e-6 * rng.standard_normal((N, N))
    A = rng.standard_normal((N, N))
    A[:, 100] = A[:, 99]  # exact duplicate column
    yield "dupcol", A
    A = rng.standard_normal((N, N))
    A[:, 7] = 0.0
    yield "zerocol", A
    i = np.arange(1, N + 1)
    yield "hilbert", 1.0 / (i[:, None] + i[None, :] - 1.0)
    t = np.linspace(0, 1, N)
    yield "vandermonde16", np.vander(t, 16, increasing=True) @ rng.standard_normal((16, N)) + 1e-4 * rng.standard_normal((N, N))
    yield "rank1+noise", np.outer(i, i) / N + 1e-3 * rng.standard_normal((N, N))
    yield "near-eye", np.eye(N) + 1e-6 * rng.standard_normal((N, N))
    yield "posuni-x1e6", rng.random((N, N)) * 1e6
    yield "normal-x1e-12", rng.standard_normal((N, N)) * 1e-12
    yield "bierlaire1e6", mpq.utils.datagen.conditioned_matrix(
        N, condition_number=1e6, seed=3
    )


#  NOTE: auto dispatch resolves to 'householder' off-TPU by design (the
#  CPU is the oracle surface), so the tiers are driven EXPLICITLY here.
TIERS = ("bgs1", "bgs2", "bgs", "polar", "cholqr1", "cholqr2s",
         "householder")


def run_case(name, a, pm, check):
    a = np.ascontiguousarray(a, np.float32)
    try:
        Q, R = mpq.qr(a, policy=mpq.POLICY_MIXED, mode="reduced",
                      panel_method=pm, check=check)
    except Exception as e:  # noqa: BLE001
        return {"input": name, "pm": pm, "check": check,
                "outcome": "raised", "err": f"{type(e).__name__}: {e}"[:120]}
    Rn = np.asarray(R, np.float32)
    if not np.isfinite(Rn[0, 0]):
        return {"input": name, "pm": pm, "check": check,
                "outcome": "poisoned"}
    rep = metrics.evaluate(a, np.asarray(Q, np.float32), Rn,
                           precision_bits=8)
    return {
        "input": name, "pm": pm, "check": check,
        "outcome": "ok" if rep.all_ok else "SILENT-FAIL",
        "backward": float(rep.backward),
        "orth": float(rep.orthogonality),
    }


def main():
    out = []
    bad = 0
    for name, a in inputs():
        for pm in TIERS:
            for check in ("sync", "defer"):
                rec = run_case(name, a, pm, check)
                out.append(rec)
                flag = ""
                if check == "sync" and rec["outcome"] not in ("ok", "raised"):
                    flag = "  <-- SYNC CONTRACT VIOLATION"
                    bad += 1
                if rec["outcome"] == "SILENT-FAIL":
                    flag = "  <-- SILENT FAILURE"
                    bad += 1
                print(f"{name:16s} {rec['pm']:12s} {check:5s} -> "
                      f"{rec['outcome']:12s}"
                      + (f" bw={rec.get('backward', 0):.1e}"
                         f" orth={rec.get('orth', 0):.1e}"
                         if "backward" in rec else "")
                      + flag)
    with open(os.path.join(os.path.dirname(__file__),
                           "r7_hostile_battery.jsonl"), "w") as f:
        for rec in out:
            f.write(json.dumps(rec) + "\n")
    print(f"\n{bad} contract violations")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
