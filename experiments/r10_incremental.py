"""Round-10: on-chip timings for the incremental/streaming QR family
(round-4 VERDICT item 4).

The SLAM streaming story (reference ``README.md:11-12``: each
Gauss-Newton iterate perturbs/appends Jacobian rows) is served by
`qr_rank1_update`, `qr_append_row`, `rls_update`, and the
insert/delete structural edits — all O(n^2) Givens chains vs the O(n^3)
refactorization each replaces.  Correctness is CPU-tested
(tests/test_givens.py, test_lstsq.py); this measures the actual
crossover on one v5e chip so a user can see when streaming beats
refactorizing.

Method: every op is timed with `time_step_amortized` (in-jit fori,
difference timing — CLAUDE.md forbids single-call walls on the tunneled
backend).  Shape-preserving ops carry their own factors; shape-changing
ops (delete_row) re-enter via a scalar feedback perturbation; the
col edit is timed as an insert+delete PAIR (shape-round-trip, report
~half each).  `rls_update` folds K=16 rows per step — the per-row
number is sec/16.  Baselines: a fresh `block_qr` auto refactorization
at the same size, POLICY_FP32 (fp32-roundoff class, what the Givens
ops deliver) and POLICY_MIXED_FAST (the cheapest refactor rung).

One quality sanity per op at n=1024 before timing counts.

Usage: python experiments/r10_incremental.py [sizes...]
Appends to experiments/r10_incremental.jsonl.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402

from mixedprecisionblockqr_tpu.models.lstsq import (  # noqa: E402
    RLSState,
    rls_update,
)
from mixedprecisionblockqr_tpu.ops.blockqr import block_qr  # noqa: E402
from mixedprecisionblockqr_tpu.ops.givens import (  # noqa: E402
    qr_append_row,
    qr_delete_col,
    qr_delete_row,
    qr_insert_col,
    qr_rank1_update,
)
from mixedprecisionblockqr_tpu.ops.policy import (  # noqa: E402
    POLICY_FP32,
    POLICY_MIXED_FAST,
)
from mixedprecisionblockqr_tpu.utils.timing import (  # noqa: E402
    time_step_amortized,
)

OUT = "/root/repo/experiments/r10_incremental.jsonl"
K_RLS = 16


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def factors(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.random((n, n), dtype=np.float32) - 0.5
    q, r = np.linalg.qr(a, mode="complete")
    return a, jnp.asarray(q, jnp.float32), jnp.asarray(r, jnp.float32)


def sanity(n=1024):
    """One on-chip quality check per op (CPU tests own full coverage)."""
    a, Q, R = factors(n)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(n), jnp.float32)
    v = jnp.asarray(rng.standard_normal(n), jnp.float32)

    def rep(name, A2, Qp, Rp):
        Qp = np.asarray(Qp, np.float64)
        Rp = np.asarray(Rp, np.float64)
        back = np.linalg.norm(A2 - Qp @ Rp) / max(np.linalg.norm(A2), 1e-30)
        orth = np.linalg.norm(Qp.T @ Qp - np.eye(Qp.shape[1]))
        emit({"op": name, "kind": "sanity", "n": n,
              "backward": float(back), "orth": float(orth)})
        assert back < 1e-5 and orth < 1e-4, (name, back, orth)

    Qp, Rp = qr_rank1_update(Q, R, u, v)
    rep("rank1_update", a + np.outer(u, v), Qp, Rp)

    Qp, Rp = qr_insert_col(Q, R, 7, u)
    a_ins = np.insert(a, 7, np.asarray(u), axis=1)
    rep("insert_col", a_ins, Qp, Rp)
    Qp2, Rp2 = qr_delete_col(Qp, Rp, 7)
    rep("delete_col", a, Qp2, Rp2)

    Qp, Rp = qr_delete_row(Q, R, 0)
    rep("delete_row", a[1:], Qp, Rp)

    Rp = qr_append_row(R, u)
    a_app = np.vstack([a, np.asarray(u)[None, :]])
    g = a_app.T @ a_app
    gp = np.asarray(Rp, np.float64).T @ np.asarray(Rp, np.float64)
    err = np.linalg.norm(g - gp) / np.linalg.norm(g)
    emit({"op": "append_row", "kind": "sanity", "n": n,
          "gram_err": float(err)})
    assert err < 1e-5, err


def time_size(n):
    a, Q, R = factors(n)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 1e-3)
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 1e-3)
    rows = jnp.asarray(
        rng.standard_normal((K_RLS, n)).astype(np.float32) * 1e-3)
    betas = jnp.asarray(rng.standard_normal(K_RLS).astype(np.float32))
    qtb = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def t(name, step, x0, iters, per=1.0, shapes=None):
        sec = time_step_amortized(step, x0, iters=iters, repeats=2)
        emit({"op": name, "n": n, "sec": sec, "sec_per_unit": sec / per,
              "iters": iters})

    # Shape-preserving: carry the factors themselves.
    t("rank1_update", lambda c: qr_rank1_update(c[0], c[1], u, v),
      (Q, R), 8)
    t("append_row",
      lambda c: qr_append_row(c[0], u, qtb=c[1], beta=1.0),
      (R, qtb), 8)
    t("rls_update_k16",
      lambda s: rls_update(s, rows, betas),
      RLSState(R, qtb), 4, per=K_RLS)
    # Structural col edit: insert+delete round trip (report the pair).
    t("insert_plus_delete_col",
      lambda c: qr_delete_col(*qr_insert_col(c[0], c[1], 5, u), 5),
      (Q, R), 4)
    # delete_row shrinks shapes: scalar-feedback re-entry.
    def step_delrow(c):
        Qd, Rd = qr_delete_row(c[0], c[1], 0)
        eps = 1e-30
        return (c[0] * (1.0 + eps * Qd[0, 0]),
                c[1] * (1.0 + eps * Rd[0, 0]))
    t("delete_row", step_delrow, (Q, R), 4)

    # Refactorization baselines (the thing each op replaces).
    A = jnp.asarray(a)
    for pname, pol in (("fp32_high", POLICY_FP32),
                      ("mixed_fast", POLICY_MIXED_FAST)):
        def step(x, pol=pol):
            Qf, Rf = block_qr(x, 128, pol, mode="complete",
                              panel_method="auto", check="defer")
            return x * (1.0 + 1e-12 * Rf[0, 0].astype(jnp.float32))
        t(f"refactor_{pname}", step, A, 8)


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [1024, 2048]
    sanity()
    for n in sizes:
        time_size(n)


if __name__ == "__main__":
    main()
