"""CPU validation of the triangular Newton-Schulz inverse-Cholesky.

Iteration: X upper-triangular, X0 = c * diag(G)^{-1/2};
  M = X^T G X; E = I - M; C = triu(E,1) + diag(E)/2; X <- X (I + C).
Scalar case reduces to the NS map lam <- lam (3-lam)^2 / 4.

Checks convergence (iters to ||X^T G X - I|| < tol) on:
  a) Grams of random tall panels (aspects 16/4/2),
  b) the ACTUAL panels of the 2048^2 bench matrix mid-factorization,
  c) the final 128x128 block (the Pallas-final-panel replacement), with a
     second refinement pass (cholqr2-style).
"""

import numpy as np

rng = np.random.default_rng(0)


def tri_ns(G, iters, X=None):
    r = G.shape[0]
    G = G.astype(np.float64)
    if X is None:
        d = 1.0 / np.sqrt(np.diag(G))
        X = np.diag(d)
        M = X.T @ G @ X
        # power-iteration lambda_max estimate, 1.05 guard
        v = M.sum(1)
        v1 = M @ v
        v2 = M @ v1
        lmax = 1.05 * np.linalg.norm(v2) / np.linalg.norm(v1)
        X = X / np.sqrt(lmax)
    errs = []
    for i in range(iters):
        W = G @ X
        M = X.T @ W
        E = np.eye(r) - M
        errs.append(np.abs(E).max())
        C = np.triu(E, 1) + np.diag(np.diag(E)) / 2
        X = X + X @ C
    return X, errs


def report(name, G, iters=20):
    X, errs = tri_ns(G, iters)
    need = next((i for i, e in enumerate(errs) if e < 1e-6), None)
    print(f"{name}: cond(G)={np.linalg.cond(G):.1e} "
          f"errs[0,4,8,12]={[f'{errs[i]:.1e}' for i in (0, 4, 8, 12)]} "
          f"iters_to_1e-6={need}")
    return X


# a) random tall panels
for m, r in [(2048, 128), (512, 128), (256, 128), (1024, 256), (512, 256)]:
    P = rng.standard_normal((m, r)).astype(np.float32)
    report(f"random {m}x{r}", P.T @ P)

# b/c) actual panels of the bench matrix (simulate the factorization with
# numpy Householder QR and take trailing blocks)
A = rng.standard_normal((2048, 2048))
Rfull = np.linalg.qr(A, mode="r")
for lam in (0, 1024, 1792, 1920):
    # the updated panel at offset lam is R[lam:, lam:lam+128] of the exact
    # factorization (same Gram as the in-driver panel)
    blk = Rfull[lam : lam + 128, lam : lam + 128]
    G = blk.T @ blk
    X = report(f"bench panel lam={lam} (square block)", G)
    # two-pass: Q1 = P X, G2 = Q1^T Q1 = X^T G X; X2 = tri_ns(G2, few)
    M1 = X.T @ G @ X
    X2, errs2 = tri_ns(M1, 4, X=np.eye(128))
    Xt = X @ X2
    final = np.abs(Xt.T @ G @ Xt - np.eye(128)).max()
    print(f"   2-pass final err: {final:.2e}")

# tall actual panels (rows lam:, updated) - Gram equals R-block Gram
for lam in (0, 512, 1536):
    blk = Rfull[lam : lam + 128 if False else 2048, lam : lam + 128]
    blk = Rfull[lam:, lam : lam + 128]
    G = blk.T @ blk
    report(f"bench tall panel lam={lam}", G)
