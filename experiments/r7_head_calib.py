"""Head-panel chain calibration (round 7): how many triangular-NS
iterations does the omega chain need on OUTLIER-spectrum Grams?

Background: a driver's FIRST panel factors raw, unprojected data.  On
positively-correlated inputs — the reference's uniform [0,1) generator
(``h_generate_random_matrix``, ``Cuda/mmult.cuh:38-68``), SLAM Jacobians —
its Jacobi-scaled Gram M0 = D G D has ONE outlier eigenvalue
~ 1 + (r-1) rho and a tight bulk at ~ 1 - rho.  Diagonal scaling cannot
touch that structure (log-spaced synthetic spectra, by contrast, are
EQUALIZED by the Jacobi step and converge in ~4 iterations at any
cond(G) — the calibration variable is cond(M0), not cond(G)).  The
spectral-guard init then lands the whole bulk at 1/cond(M0) and the
escape phase (x2.25/iter plain, x3.06 omega) runs out of the aspect
budget: measured stall (one-behind 0.5) on 1024^2 uniform at the
6-7-iteration budgets — every unrolled NS fast tier NaN-poisoned on the
reference's default input class until round 7.

This script prints iterations-to-pass (one-behind < 1e-2, i.e. the
canary's squared-residual tolerance) for the measured positive-uniform
panels and synthetic outlier spectra at cond(M0) in {1e3, 3e3, 1e4}.
Result (committed run):

    posuni 1024 r128   cond(M0)=8.8e2   10 iters
    posuni 512  r64    cond(M0)=4.4e2    9
    outlier, cond(M0)=4.7e3             12
    outlier, cond(M0)=1.7e4             14
    outlier, cond(M0)=6.1e4             16

i.e. iters ~= 10 + log(cond(M0)/8.8e2)/log(2.25).
=> ``tri_head_iters`` = base + 6 (covers ~5e3-class at the aspect-16
base of 6; smaller aspects have higher bases and reach ~1e4).
Run on the CPU backend: python experiments/r7_head_calib.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

_HI = jax.lax.Precision.HIGHEST


def one_behind_history(G, max_it=24, n_om=4):
    """tri_inv_chol's iteration with the one-behind residual recorded."""
    r = G.shape[0]
    G = jnp.asarray(G, jnp.float32)
    I = jnp.eye(r, dtype=jnp.float32)
    d = jax.lax.rsqrt(jnp.maximum(jnp.diag(G), 1e-38))
    M0 = G * d[:, None] * d[None, :]
    v1 = M0 @ jnp.sum(M0, axis=1, keepdims=True)
    v2 = M0 @ v1
    sg = 1.05 * jnp.linalg.norm(v2) / (jnp.linalg.norm(v1) + 1e-30)
    X = jnp.diag(d * jax.lax.rsqrt(sg))
    hist = []
    for it in range(max_it):
        W = jnp.matmul(G, X, precision=_HI)
        M = jnp.matmul(X.T, W, precision=_HI)
        E = I - M
        C = jnp.triu(E, 1) + jnp.diag(jnp.diag(E)) * 0.5
        om = 1.5 if it < n_om else 1.0
        X = X + om * jnp.matmul(X, C, precision=_HI)
        hist.append(float(jnp.max(jnp.abs(E))))
    return hist


def outlier_gram(r, cond, seed=0):
    """SPD Gram with ONE outlier eigenvalue (uniform diagonal, so Jacobi
    scaling is a no-op — the hard class)."""
    rng = np.random.default_rng(seed)
    Q = np.linalg.qr(rng.standard_normal((r, r)))[0]
    ev = np.full(r, 1.0)
    ev[0] = cond
    G = (Q * ev) @ Q.T
    # re-uniform the diagonal (keeps the spectrum's SHAPE, kills the
    # Jacobi escape hatch)
    d = np.sqrt(np.diag(G))
    return G / d[:, None] / d[None, :]


def main():
    cases = {}
    A = np.random.default_rng(2).random((1024, 1024))
    cases["posuni 1024 r128"] = A[:, :128].T @ A[:, :128]
    A5 = np.random.default_rng(5).random((512, 512))
    cases["posuni 512 r64"] = A5[:, :64].T @ A5[:, :64]
    for c in (1e3, 3e3, 1e4):
        cases[f"outlier {c:.0e}"] = outlier_gram(128, c)
    for name, G in cases.items():
        ev = np.linalg.eigvalsh(G)
        d = np.sqrt(np.diag(G))
        M0 = G / d[:, None] / d[None, :]
        evm = np.linalg.eigvalsh(M0)
        hist = one_behind_history(np.asarray(G, np.float32))
        k = next((i + 1 for i, e in enumerate(hist) if e < 1e-2), None)
        print(
            f"{name:18s} cond(G)={ev[-1]/ev[0]:.1e} "
            f"cond(M0)={evm[-1]/evm[0]:.1e} iters-to-pass={k}"
        )


if __name__ == "__main__":
    main()
