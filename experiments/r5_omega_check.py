"""Round-5b prototype: omega-scheduled (over-relaxed) triangular NS chains.

Motivation: the aspect-calibrated iteration budgets (``tri_iters_for_
aspect``) were measured on RANDOM panels, whose Grams are nearly perfectly
conditioned (cond(G) ~ 3-9).  Panels of STRUCTURED matrices (the Bierlaire
conditioned generator, SLAM Jacobians) carry cond(G) ~ 40-700 at the same
aspect, and the plain chain's small-eigenvalue escape rate — the scalar
map ``mu <- mu (1 + (1-mu)/2)^2``, i.e. x2.25/iteration — runs out of
budget: measured one-behind residual 6e-2 at 7 iterations on a cond-1e3
512^2 draw, which tripped the poison canary on EVERY conditioned input.

Over-relaxing the early corrections (``X <- X + 2 X C``) lifts the escape
rate to x4/iteration at identical dot count.  This sweep measures the
(iters, omega_iters, omega) design space on random + conditioned panels;
findings (baked into ``ops/polar.py::ns_omega_iters``):

  * omega = 2 escape, >= 4-5 plain tail iterations for the quadratic
    finish (shorter tails plateau at ~1e-4);
  * burst capped at 4: eigenvalues that reached ~1 under omega = 2
    oscillate 1 +/- eps without converging (the map flips the error sign),
    and a 9-omega-iteration burst inside the 14-iteration shifted robust
    pass DIVERGED to NaN via the non-normal triangular coupling;
  * basin at 7-9 iterations grows from cond(G) ~ 10 to ~ 200-700 with the
    final residual floor unchanged on random panels.

Writes experiments/r5_omega_check.jsonl.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from mixedprecisionblockqr_tpu.utils.datagen import conditioned_matrix

OUT = "/root/repo/experiments/r5_omega_check.jsonl"


def tri_ns(G, iters, omega_iters=0, omega=2.0):
    r = G.shape[0]
    d = 1.0 / np.sqrt(np.diag(G))
    M0 = G * d[:, None] * d[None, :]
    v = M0.sum(1)
    v1 = M0 @ v
    v2 = M0 @ v1
    est = 1.05 * np.linalg.norm(v2) / max(np.linalg.norm(v1), 1e-30)
    X = np.diag(d / np.sqrt(est)).astype(np.float32)
    G = G.astype(np.float32)
    for it in range(iters):
        W = (G @ X).astype(np.float32)
        M = (X.T @ W).astype(np.float32)
        E = np.eye(r, dtype=np.float32) - M
        C = np.triu(E, 1) + np.diag(np.diag(E)) * 0.5
        om = omega if it < omega_iters else 1.0
        X = (X + om * (X @ C)).astype(np.float32)
    Ex = np.eye(r) - X.T.astype(np.float64) @ G.astype(np.float64) @ X.astype(
        np.float64
    )
    return X, float(np.max(np.abs(Ex)))


def main():
    rng = np.random.default_rng(0)
    panels = [("random", rng.standard_normal((512, 64)).astype(np.float32))]
    for cond in (1e3, 1e5, 1e7):
        panels.append((
            f"cond{cond:.0e}",
            conditioned_matrix(512, condition_number=cond, seed=7)[:, :64]
            .astype(np.float32),
        ))
    scheds = [(7, 0, 2.0), (7, 2, 2.0), (7, 3, 2.0), (8, 3, 2.0),
              (9, 3, 2.0), (9, 4, 2.0), (7, 3, 1.5), (11, 0, 1.0),
              (14, 9, 2.0)]
    with open(OUT, "w") as f:
        for label, P in panels:
            G = (P.T @ P).astype(np.float32)
            c = float(np.linalg.cond(G.astype(np.float64)))
            for iters, oi, om in scheds:
                X, resid = tri_ns(G, iters, oi, om)
                row = {"panel": label, "condG": c, "iters": iters,
                       "omega_iters": oi, "omega": om, "true_resid": resid}
                f.write(json.dumps(row) + "\n")
                print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
