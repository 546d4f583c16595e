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
    for k in range(n):
        lkk = jnp.sqrt(A[..., k, k])
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

    S_chol: jnp.ndarray  # (..., 6, 6) Cholesky of the base Schur complement
    Dinv: jnp.ndarray  # (..., 4, 3, 3) per-leg joint-block inverses
    B: jnp.ndarray  # (..., 4, 6, 3) base-leg coupling blocks
    BDinv: jnp.ndarray  # (..., 4, 6, 3) B_l D_l^-1


def arrow_factor(A) -> ArrowFactor:
    """Factor a (..., 18, 18) SPD matrix with the Go2 arrow structure.

    Only the structured blocks are read; cross-leg entries are assumed zero
    (exact for tree dynamics — see :class:`ArrowFactor`).
    """
    import jax

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
    with jax.default_matmul_precision("highest"):
        S_chol = jnp.linalg.cholesky(S)
    return ArrowFactor(S_chol=S_chol, Dinv=Dinv, B=B, BDinv=BDinv)


def arrow_solve(fac: ArrowFactor, r):
    """Solve A x = r for (..., 18, k) right-hand sides (k static)."""
    import jax

    batch = r.shape[:-2]
    k = r.shape[-1]
    r_b = r[..., :6, :]
    r_j = r[..., 6:, :].reshape(*batch, 4, 3, k)
    Dinv_rj = ein("...lij,...ljk->...lik", fac.Dinv, r_j)
    rhs_b = r_b - ein("...lij,...ljk->...ik", fac.BDinv, r_j)
    with jax.default_matmul_precision("highest"):
        x_b = jax.scipy.linalg.cho_solve((fac.S_chol, True), rhs_b)
    Bt_xb = ein("...lji,...jk->...lik", fac.B, x_b)  # (..., 4, 3, k)
    x_j = ein("...lij,...ljk->...lik", fac.Dinv, r_j - Bt_xb)
    return jnp.concatenate([x_b, x_j.reshape(*batch, 12, k)], axis=-2)
