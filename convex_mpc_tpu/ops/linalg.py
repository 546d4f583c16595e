"""Precision-pinned contraction helpers.

On TPU the *default* matmul precision truncates f32 operands to bfloat16
(~3e-3 relative error). For control-stack numerics — kinematics, dynamics,
QP data, solver iterations — that error is unacceptable (it exceeds the 2%
force-parity budget and corrupts foot positions by ~0.5 mm). Every
numeric-critical contraction in this package goes through these helpers so
full f32 precision is explicit. Bulk ML-style matmuls that can tolerate bf16
should NOT use these.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

PRECISION = lax.Precision.HIGHEST


def mm(a, b):
    """Precision-pinned matmul (batched ok)."""
    return jnp.matmul(a, b, precision=PRECISION)


def ein(subscripts, *operands):
    """Precision-pinned einsum."""
    return jnp.einsum(subscripts, *operands, precision=PRECISION)


def inv3(A):
    """Closed-form inverse of a (..., 3, 3) matrix (adjugate / determinant).

    Replaces the serialized LU/Cholesky inner loop XLA emits for tiny
    batched inverses with pure elementwise arithmetic — exact in f32 for
    the well-conditioned 3x3 blocks of robot dynamics (leg inertia blocks,
    operational-space inertias).
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    r0 = jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1)
    r1 = jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1)
    r2 = jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1)
    adj = jnp.stack([r0, r1, r2], axis=-2)
    det = a * r0[..., 0] + b * r1[..., 0] + c * r2[..., 0]
    return adj / det[..., None, None]


def inv_small_unrolled(A):
    """Unrolled SPD inverse of a small (..., n, n) batch (static n).

    XLA lowers batched `jnp.linalg.inv` of tiny matrices through a pivoted
    LU custom call that serializes catastrophically on TPU for large
    batches of small blocks — profiled at ~57 ms per solve for the
    (B, nb, 7, 7) active-set Gram blocks of the certified polish
    (mpc/admm.py) vs ~0.1 ms for this unrolled form, whose every step is
    an elementwise/tiny-matmul op over the batch axes.

    Method: unrolled Cholesky + unrolled triangular inverse + Gram —
    Cholesky is backward-stable for SPD matrices WITHOUT pivoting, so the
    polish's near-singular rank<=3 Grams (+1e-7*trace ridge) keep
    f32-pivoted-LU-level accuracy (plain Gauss-Jordan without pivoting
    was measured 10%+ off there; tests/test_linalg.py covers both the
    well-conditioned and the real active-set regimes).
    """
    n = A.shape[-1]
    idx = jnp.arange(n)
    L = jnp.zeros_like(A)
    nan = jnp.asarray(jnp.nan, A.dtype)
    for k in range(n):
        pivot = A[..., k, k]
        # NaN is the intended non-SPD signal (mirrors chol_kernel._chol_unrolled):
        # a block driven indefinite by f32 cancellation yields NaN rows that the
        # downstream certify() rejects explicitly, instead of a silent sqrt(-x)
        lkk = jnp.where(pivot > 0, jnp.sqrt(jnp.maximum(pivot, 0.0)), nan)
        col = A[..., :, k] / lkk[..., None]  # (..., n)
        col = jnp.where(idx >= k, col, 0.0)
        L = L.at[..., :, k].set(col)
        A = A - col[..., :, None] * col[..., None, :]
    # X = L^-1 by unrolled forward substitution (rows of X filled top-down;
    # rows >= k of X are still zero, so the matmul sums only j < k)
    eye = jnp.eye(n, dtype=L.dtype)
    X = jnp.zeros_like(L)
    for k in range(n):
        s = jnp.einsum("...j,...jc->...c", L[..., k, :], X)
        row = (eye[k] - s) / L[..., k, k][..., None]
        X = X.at[..., k, :].set(row)
    # A^-1 = L^-T L^-1 = X' X
    return jnp.einsum("...ki,...kj->...ij", X, X)


def inv6_spd_block(S):
    """Closed-form inverse of a (..., 6, 6) SPD matrix via 3x3-block Schur.

    S = [[P, Q], [Q', R]] with SPD P:  S^-1 = [[Pi + W Ti W', -W Ti],
    [-Ti W', Ti]] where Pi = P^-1, W = Pi Q, T = R - Q' W, Ti = T^-1.
    Two adjugate 3x3 inverses + a few tiny matmuls — all wide fused
    elementwise arithmetic, no serial sqrt/divide chain (the unrolled 6x6
    Cholesky's 6 dependent column steps dominated the 1 kHz plant-step
    latency at B = 512). SPD blocks of robot mass matrices are far from
    the f32 adjugate's conditioning limits (tests/test_linalg.py).
    """
    P, Q = S[..., :3, :3], S[..., :3, 3:]
    R = S[..., 3:, 3:]
    Pi = inv3(P)
    W = ein("...ij,...jk->...ik", Pi, Q)
    T = R - ein("...ji,...jk->...ik", Q, W)
    Ti = inv3(T)
    WTi = ein("...ij,...jk->...ik", W, Ti)
    top_left = Pi + ein("...ij,...kj->...ik", WTi, W)
    top = jnp.concatenate([top_left, -WTi], axis=-1)
    bot = jnp.concatenate([-jnp.swapaxes(WTi, -1, -2), Ti], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spd_inverse_recursive(M):
    """SPD inverse of (..., n, n) by recursive 2x2 block-Schur elimination.

    Pure-XLA batched-matmul form: at every level the work is a handful of
    large batched matmuls (MXU) plus concatenates — no serialized
    per-column factorization.

        S = [[P, Q], [Q', R]]:  S^-1 from P^-1 and the Schur complement
        T = R - Q' P^-1 Q (recursively), leaves via the closed-form
        3x3 / 6x6 adjugate inverses.

    STABILITY LIMIT (adjudicated round 5, do not use for ADMM KKT
    systems): unlike sqrt-pivot Cholesky, the explicit-inverse sandwich
    T = R - Q' P^-1 Q accumulates f32 formation error ~eps * |Q|^2 *
    |P^-1| at every level; on matrices mixing stiff and nearly-flat
    directions (the Ruiz-scaled condensed MPC KKT at attractor rho — the
    flat R = 1e-5 force directions) a deep Schur block is driven
    indefinite and the adjugate leaf explodes (measured resid 7e10 where
    blocked Cholesky gives 1.4e-4, cond(M) only ~6e3). Fine for
    uniformly-conditioned SPD batches (robot mass matrices, covariances);
    the production KKT path stays on ops/chol_kernel.spd_inverse.
    Any n: uneven splits are fine; non-3/6 small leaves use the unrolled
    Cholesky.
    """
    n = M.shape[-1]
    if n == 3:
        return inv3(M)
    if n == 6:
        return inv6_spd_block(M)
    if n <= 8:
        return inv_small_unrolled(M)
    h = n // 2
    P, Q = M[..., :h, :h], M[..., :h, h:]
    R = M[..., h:, h:]
    Pi = spd_inverse_recursive(P)
    W = mm(Pi, Q)
    T = R - mm(jnp.swapaxes(Q, -1, -2), W)
    Ti = spd_inverse_recursive(T)
    WTi = mm(W, Ti)
    TL = Pi + mm(WTi, jnp.swapaxes(W, -1, -2))
    top = jnp.concatenate([TL, -WTi], axis=-1)
    bot = jnp.concatenate([-jnp.swapaxes(WTi, -1, -2), Ti], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


class ArrowFactor(NamedTuple):
    """Factorization of an 18x18 SPD matrix with Go2 'arrow' structure.

    A quadruped's kinematic tree makes every joint-space SPD system here —
    the mass matrix M and the implicit velocity-solve matrix
    M + dt (J'CJ + diag) — block-sparse: a dense 6x6 base block, 6x3
    base-leg couplings, per-leg 3x3 diagonal blocks, and EXACT zeros
    between different legs (legs are sibling branches; foot Jacobians touch
    only base + own-leg columns). XLA's monolithic 18x18 Cholesky serializes
    18 column steps and ignores this; the Schur-complement factorization
    needs closed-form 3x3 inverses, a single 6x6 Cholesky (6 serial steps),
    and batched matmuls — measured ~46 ms -> ~6 ms for the two per-tick
    solves of a batch-512 engine cycle. Asserted against the dense solve in
    tests/test_linalg.py; the cross-leg zero structure is asserted in
    tests/test_dynamics_vs_mujoco.py.
    """

    S_inv: jnp.ndarray  # (..., 6, 6) inverse of the base Schur complement
    Dinv: jnp.ndarray  # (..., 4, 3, 3) per-leg joint-block inverses
    B: jnp.ndarray  # (..., 4, 6, 3) base-leg coupling blocks
    BDinv: jnp.ndarray  # (..., 4, 6, 3) B_l D_l^-1


def arrow_factor(A) -> ArrowFactor:
    """Factor a (..., 18, 18) SPD matrix with the Go2 arrow structure.

    Only the structured blocks are read; cross-leg entries are assumed zero
    (exact for tree dynamics — see :class:`ArrowFactor`). The 6x6 Schur
    complement is inverted by the UNROLLED Cholesky (`inv_small_unrolled`):
    XLA's batched `cholesky` + `triangular_solve` custom calls serialize
    their column steps and profiled as the dominant cost of the whole 1 kHz
    plant step at B = 512 (~23 ms/cycle, tools/cycle_ablation.py round 5);
    the unrolled form is straight-line elementwise/tiny-matmul code. The
    Schur complement of a quadruped mass matrix is well-conditioned
    (cond ~ 1e2), far from the method's f32 limits (tests/test_linalg.py).
    """
    A_bb = A[..., :6, :6]
    B_flat = A[..., :6, 6:]  # (..., 6, 12)
    batch = A.shape[:-2]
    B = jnp.moveaxis(B_flat.reshape(*batch, 6, 4, 3), -2, -3)  # (..., 4, 6, 3)
    Dblk = jnp.stack(
        [A[..., 6 + 3 * l : 9 + 3 * l, 6 + 3 * l : 9 + 3 * l] for l in range(4)],
        axis=-3,
    )  # (..., 4, 3, 3)
    Dinv = inv3(Dblk)
    BDinv = ein("...lij,...ljk->...lik", B, Dinv)  # (..., 4, 6, 3)
    S = A_bb - ein("...lik,...ljk->...ij", BDinv, B)
    return ArrowFactor(S_inv=inv6_spd_block(S), Dinv=Dinv, B=B, BDinv=BDinv)


def arrow_solve(fac: ArrowFactor, r):
    """Solve A x = r for (..., 18, k) right-hand sides (k static)."""
    batch = r.shape[:-2]
    k = r.shape[-1]
    r_b = r[..., :6, :]
    r_j = r[..., 6:, :].reshape(*batch, 4, 3, k)
    rhs_b = r_b - ein("...lij,...ljk->...ik", fac.BDinv, r_j)
    x_b = ein("...ij,...jk->...ik", fac.S_inv, rhs_b)
    Bt_xb = ein("...lji,...jk->...lik", fac.B, x_b)  # (..., 4, 3, k)
    x_j = ein("...lij,...ljk->...lik", fac.Dinv, r_j - Bt_xb)
    return jnp.concatenate([x_b, x_j.reshape(*batch, 12, k)], axis=-2)
