"""Bench-only blocked Cholesky / triangular-inverse (MXU-tiled).

Relocated out of the shipped package (convex_mpc_tpu.ops.linalg): measured
~1.4x vs XLA's monolithic triangular solve at n = 192 / block 64 on TPU
(tools/solve_ablation.py), which was not enough to displace the
refactor-on-demand strategy (mpc/admm.py solve_adaptive) or the fused Pallas
SPD inverse (ops/chol_kernel.py) on the hot path. Kept here for the
kkt_microbench comparison grid only.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

PRECISION = lax.Precision.HIGHEST


def mm(a, b):
    return jnp.matmul(a, b, precision=PRECISION)


def blocked_cholesky(A, block: int = 64):
    """Right-looking blocked Cholesky factorization (lower).

    XLA's monolithic batched Cholesky serializes a column-at-a-time inner
    loop over all n columns; the blocked form runs the same serial loop only
    inside ``block``-sized diagonal blocks while every panel/trailing update
    is a batched matmul on the MXU:

        L_kk       = chol(A_kk - sum_j L_kj L_kj')
        L_ik       = (A_ik - sum_j L_ij L_kj') L_kk^-T,   i > k

    Requires n to be a multiple of ``block``.
    """
    import jax

    n = A.shape[-1]
    assert n % block == 0, (n, block)
    nb = n // block
    eye = jnp.eye(block, dtype=A.dtype)

    def blk(i, j):
        return A[..., i * block : (i + 1) * block, j * block : (j + 1) * block]

    L = [[None] * nb for _ in range(nb)]
    for k in range(nb):
        Akk = blk(k, k)
        for j in range(k):
            Akk = Akk - mm(L[k][j], jnp.swapaxes(L[k][j], -1, -2))
        Lkk = jnp.linalg.cholesky(Akk)
        L[k][k] = Lkk
        if k + 1 < nb:
            Lkk_invT = jnp.swapaxes(
                jax.scipy.linalg.solve_triangular(
                    Lkk, jnp.broadcast_to(eye, Lkk.shape), lower=True
                ),
                -1,
                -2,
            )
        for i in range(k + 1, nb):
            Aik = blk(i, k)
            for j in range(k):
                Aik = Aik - mm(L[i][j], jnp.swapaxes(L[k][j], -1, -2))
            L[i][k] = mm(Aik, Lkk_invT)

    zero = jnp.zeros_like(L[0][0])
    rows = [
        jnp.concatenate(
            [L[i][j] if j <= i else jnp.broadcast_to(zero, L[i][i].shape) for j in range(nb)],
            axis=-1,
        )
        for i in range(nb)
    ]
    return jnp.concatenate(rows, axis=-2)


def blocked_tri_inverse(L, block: int = 64):
    """Inverse of a lower-triangular matrix via block back-substitution.

    XLA's batched ``solve_triangular`` with n right-hand sides serializes
    over all n columns; with X = L^-1 computed blockwise only the diagonal
    blocks need triangular solves (at block-size RHS count) and every
    off-diagonal block is a plain matmul chain that maps onto the MXU:

        X_ii = L_ii^-1
        X_ij = -X_ii (sum_k L_ik X_kj),   i > j

    Measured ~1.4x vs the monolithic triangular solve for n = 192 at
    block 64 on TPU (in-program ablation, tools/solve_ablation.py) — not
    enough to displace refactor-on-demand (mpc/admm.py solve_adaptive),
    which attacks refactor *frequency* instead; kept as a bench-only
    kernel. Requires n to be a multiple of ``block``.
    """
    import jax

    n = L.shape[-1]
    assert n % block == 0, (n, block)
    nb = n // block

    def blk(i, j):
        return L[..., i * block : (i + 1) * block, j * block : (j + 1) * block]

    eye = jnp.eye(block, dtype=L.dtype)
    diag_inv = []
    for i in range(nb):
        d = blk(i, i)
        rhs = jnp.broadcast_to(eye, d.shape)
        diag_inv.append(jax.scipy.linalg.solve_triangular(d, rhs, lower=True))

    X = [[None] * nb for _ in range(nb)]
    for i in range(nb):
        X[i][i] = diag_inv[i]
        for j in range(i - 1, -1, -1):
            acc = mm(blk(i, j), X[j][j])
            for k in range(j + 1, i):
                acc = acc + mm(blk(i, k), X[k][j])
            X[i][j] = -mm(diag_inv[i], acc)

    zero = jnp.zeros_like(diag_inv[0])
    rows = [
        jnp.concatenate(
            [X[i][j] if j <= i else jnp.broadcast_to(zero, X[i][i].shape) for j in range(nb)],
            axis=-1,
        )
        for i in range(nb)
    ]
    return jnp.concatenate(rows, axis=-2)
