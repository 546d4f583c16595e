"""Pallas TPU kernel: batched SPD inverse via blocked Cholesky.

Why a kernel: the ADMM KKT refactorization and the polish reduced solve both
need M^-1 for (B, n, n) SPD batches (n = 192 for the condensed Go2 MPC QP).
XLA's batched ``cholesky`` serializes a column-at-a-time loop of ~n separate
HLO steps over the full (B, n, n) buffer — measured ~19 ms at B = 512 on
TPU v5e, ~40x off the arithmetic bound — and ``triangular_solve`` with n
right-hand sides is another ~13 ms of the same serialization. Inside one
Pallas program the whole factorization for a batch tile is straight-line
VPU/MXU code on VMEM-resident data: the serial chain costs instruction
latency, not per-HLO dispatch.

Algorithm per batch tile (all shapes static, ``blk``-blocked, lower form):

  1. right-looking blocked Cholesky: unrolled scalar elimination inside the
     ``blk x blk`` diagonal blocks; panel and trailing-Schur updates are
     ``dot_general`` MXU ops;
  2. diagonal-block triangular inverses via the finite Neumann product —
     for unit-lower U = I + X with X strictly lower and nilpotent
     (X^blk = 0):  U^-1 = (I - X)(I + X^2)(I + X^4)...  — log2(blk) matmuls
     instead of a serial substitution;
  3. blocked lower-triangular inverse by back-substitution over blocks
     (matmul chains);
  4. M^-1 = L^-T L^-1 as one fused Gram matmul, so only M^-1 leaves VMEM.

This replaces the capability OSQP gets from its cached native LDL'
factorization (reference centroidal_mpc.py:20-38 via CasADi's OSQP conic
plugin). Equivalence vs the XLA factorization path is asserted in
tests/test_kernels.py (interpret mode on CPU; tolerance at the f32
reassociation level).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _dot(a, b, transpose_b=False):
    """Batched (K, p, q) @ (K, q, r) -> (K, p, r) on the MXU, f32 accum."""
    contract = ((2,), (2,) if transpose_b else (1,))
    return jax.lax.dot_general(
        a, b, (contract, ((0,), (0,))),
        preferred_element_type=_F32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _iota_eye(blk: int):
    """(blk, blk) identity built from iota (pallas kernels cannot capture
    array constants — they must be computed in-kernel or passed as inputs)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    return (r == c).astype(_F32)


def _chol_unrolled(Akk, blk: int):
    """Unrolled Cholesky of a (K, blk, blk) SPD block (lower factor)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (blk,), 0)
    cols = []
    for k in range(blk):
        col_raw = Akk[:, :, k]  # (K, blk)
        pivot = col_raw[:, k]
        # non-SPD input => NaN pivot column, like XLA's cholesky (the NaN
        # then spreads through the trailing update and the output, so a bad
        # matrix is detectable downstream instead of silently producing
        # large finite garbage)
        lkk_inv = jnp.where(
            pivot > 0.0,
            jax.lax.rsqrt(jnp.maximum(pivot, 1e-30)),
            jnp.float32(jnp.nan),
        )
        col = col_raw * lkk_inv[:, None]
        col = col * (rows >= k).astype(_F32)
        Akk = Akk - col[:, :, None] * col[:, None, :]
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def _tri_inv_neumann(L, blk: int):
    """Inverse of (K, blk, blk) lower-triangular L, finite Neumann product.

    L = D(I + X) with X = D^-1 L - I strictly lower => X^blk = 0 and
    (I + X)^-1 = prod_j (I + (-X)^(2^j)) truncates exactly.
    """
    eye = _iota_eye(blk)
    # diagonal via mask-sum (jnp.diagonal lowers to an unsupported gather)
    d_inv = 1.0 / jnp.sum(L * eye, axis=-1)  # (K, blk)
    X = L * d_inv[:, :, None] - eye
    acc = eye - X
    P = X
    p2 = 2
    while p2 < blk:
        P = _dot(P, P)
        acc = _dot(acc, eye + P)
        p2 *= 2
    return acc * d_inv[:, None, :]


def _spd_inverse_kernel(a_ref, out_ref, *, n: int, blk: int):
    """Per-tile body. Structured to keep MXU ops few and panel-wide:

    - right-looking Cholesky: per block-column ONE panel dot + ONE trailing
      Schur dot (not per-(i,j) chains);
    - full triangular inverse via the block-level Neumann product — with
      Db = blockdiag(L_kk) and X = Db^-1 L - I strictly block-lower
      (X^nb = 0), L^-1 = [(I-X)(I+X^2)(I+X^4)...] Db^-1: a handful of
      full-tile MXU matmuls instead of O(nb^2) small back-substitution
      chains;
    - M^-1 = L^-T L^-1 as one fused Gram matmul.
    """
    K = a_ref.shape[0]
    nb = n // blk
    A = a_ref[:]  # (K, n, n)

    cols = []  # per block-column (K, n, blk) pieces of L
    dinv_blocks = []  # (K, blk, blk) inverses of the diagonal blocks
    for k in range(nb):
        kb = k * blk
        Akk = A[:, kb : kb + blk, kb : kb + blk]
        Lkk = _chol_unrolled(Akk, blk)
        Ld = _tri_inv_neumann(Lkk, blk)
        dinv_blocks.append(Ld)
        if k + 1 < nb:
            rest = A[:, kb + blk :, kb : kb + blk]  # (K, n-kb-blk, blk)
            panel = _dot(rest, Ld, transpose_b=True)  # L below the diagonal
            # trailing Schur update, applied panel-wide
            upd = _dot(panel, panel, transpose_b=True)
            trail = A[:, kb + blk :, kb + blk :] - upd
            A = jnp.concatenate(
                [
                    A[:, : kb + blk, :],
                    jnp.concatenate([A[:, kb + blk :, : kb + blk], trail], axis=-1),
                ],
                axis=-2,
            )
            pieces = [Lkk, panel]
        else:
            pieces = [Lkk]
        if kb > 0:  # Mosaic rejects zero-size arrays — only pad when nonempty
            pieces = [jnp.zeros((K, kb, blk), _F32)] + pieces
        cols.append(jnp.concatenate(pieces, axis=-2) if len(pieces) > 1 else pieces[0])
    Lfull = jnp.concatenate(cols, axis=-1)  # (K, n, n) lower

    # block-diagonal Db^-1, assembled dense (zeros elsewhere)
    db_cols = []
    for k in range(nb):
        kb = k * blk
        pieces = []
        if kb > 0:
            pieces.append(jnp.zeros((K, kb, blk), _F32))
        pieces.append(dinv_blocks[k])
        if n - kb - blk > 0:
            pieces.append(jnp.zeros((K, n - kb - blk, blk), _F32))
        db_cols.append(
            jnp.concatenate(pieces, axis=-2) if len(pieces) > 1 else pieces[0]
        )
    Dbinv = jnp.concatenate(db_cols, axis=-1)  # (K, n, n)

    eye_n = _iota_eye(n)
    X = _dot(Dbinv, Lfull) - eye_n  # strictly block-lower, X^nb = 0
    acc = eye_n - X
    P = X
    p2 = 2
    while p2 < nb:
        P = _dot(P, P)
        acc = _dot(acc, eye_n + P)
        p2 *= 2
    Linv = _dot(acc, Dbinv)  # (K, n, n)

    # M^-1 = L^-T L^-1 (one Gram matmul; contraction over rows of Linv)
    out_ref[:] = jax.lax.dot_general(
        Linv, Linv, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=_F32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("blk", "block_k", "interpret"))
def spd_inverse(
    A: jnp.ndarray,  # (B, n, n) SPD batch
    blk: int = 32,
    block_k: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched SPD inverse, Pallas on TPU / XLA elsewhere.

    ``n`` must be a multiple of ``blk``. On non-TPU backends (CPU tests)
    the XLA Cholesky path is used unless ``interpret=True`` forces the
    kernel through the Pallas interpreter (for equivalence tests).
    """
    b, n, n2 = A.shape
    assert n == n2 and n % blk == 0, (A.shape, blk)
    # f32 only: the kernel accumulates in f32 on the MXU; silently casting
    # an f64 input would discard precision the caller asked for
    assert A.dtype == jnp.float32, f"spd_inverse is f32-only, got {A.dtype}"
    if interpret is None:
        interpret = False
    if jax.default_backend() != "tpu" and not interpret:
        eye = jnp.eye(n, dtype=A.dtype)
        with jax.default_matmul_precision("highest"):
            L = jnp.linalg.cholesky(A)
            Linv = jax.scipy.linalg.solve_triangular(
                L, jnp.broadcast_to(eye, L.shape), lower=True
            )
            return jnp.matmul(
                jnp.swapaxes(Linv, -1, -2), Linv,
                precision=jax.lax.Precision.HIGHEST,
            )

    bp = ((b + block_k - 1) // block_k) * block_k
    A_p = jnp.pad(A, ((0, bp - b), (0, 0), (0, 0)))
    if bp > b:
        # keep padded problems SPD so the factorization stays finite
        A_p = A_p + jnp.concatenate(
            [jnp.zeros((b, n, n), A.dtype),
             jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (bp - b, n, n))]
        )

    out = pl.pallas_call(
        partial(_spd_inverse_kernel, n=n, blk=blk),
        grid=(bp // block_k,),
        in_specs=[
            pl.BlockSpec(
                (block_k, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (block_k, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, n, n), _F32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
        ),
        interpret=interpret,
    )(A_p.astype(_F32))
    return out[:b]
