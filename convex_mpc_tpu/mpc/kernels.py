"""Pallas TPU kernel for the batched ADMM iteration loop.

Why a kernel: one ADMM iteration per scenario is two GEMVs against the
scenario's constraint matrix A (m x n ~ 448 x 192, ~340 KB f32) plus one
against the KKT inverse (n x n, ~150 KB) and elementwise projections. Under
XLA the (B, m, n) batched matvecs re-stream every matrix from HBM on every
iteration — for B = 512 and 150+ iterations that is tens of GB of HBM
traffic for ~16 GFLOP of math: the solver is bandwidth-bound. This kernel
blocks K scenarios per grid program, pins their A / Minv (and the small
vectors) in VMEM, and runs the whole iteration loop on-chip — each matrix is
read from HBM exactly once per solve.

Shapes are padded to TPU tiles (last dim 128-aligned). Padding is
constructed to be exactly inert:
- padded constraint rows have rho = 0 and l = u = 0, so z = y = 0 there and
  they contribute nothing to A'(rho z - y);
- padded variable columns have Minv = 0 and q = 0, so x stays 0 there.

The iteration math matches mpc.admm.solve's inner loop bit-for-bit in
structure (over-relaxed OSQP splitting); equivalence is tested in
tests/test_kernels.py, and admm.solve(use_pallas=True) swaps it in.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(A_ref, Minv_ref, q_ref, l_ref, u_ref, rho_ref, inv_rho_ref,
            x0_ref, z0_ref, y0_ref, x_out, z_out, y_out,
            *, iters: int, sigma: float, alpha: float, precision):
    # vectors carried as (K, 1, dim) so block shapes satisfy TPU tiling
    A = A_ref[:]          # (K, M, N)
    Minv = Minv_ref[:]    # (K, N, N)
    q = q_ref[:]          # (K, 1, N)
    l = l_ref[:]          # (K, 1, M)
    u = u_ref[:]          # (K, 1, M)
    rho = rho_ref[:]      # (K, 1, M)
    inv_rho = inv_rho_ref[:]  # (K, 1, M) pseudo-inverse of rho (0 on padding)

    def body(_, carry):
        x, z, y = carry  # (K, 1, N), (K, 1, M), (K, 1, M)
        t = rho * z - y  # (K, 1, M)
        # rhs = sigma x - q + A' t   : contract over M
        At_t = jax.lax.dot_general(
            t, A, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (K, 1, N)
        rhs = sigma * x - q + At_t
        xt = jax.lax.dot_general(
            rhs, Minv, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (K, 1, N)  (Minv symmetric: contracting either side is equivalent)
        axt = jax.lax.dot_general(
            xt, A, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (K, 1, M)
        x_new = alpha * xt + (1.0 - alpha) * x
        ax_rel = alpha * axt + (1.0 - alpha) * z
        # true division to match the XLA chunk path's rounding exactly
        # (reciprocal-multiply differs in the last ulp, which is enough to
        # re-roll chaos-marginal closed-loop transitions); padded rows have
        # rho = 0 — inv_rho carries their mask (0 there, 1 elsewhere is not
        # available, so gate the division on it)
        y_over_rho = jnp.where(inv_rho > 0, y / jnp.where(rho > 0, rho, 1.0), 0.0)
        z_new = jnp.clip(ax_rel + y_over_rho, l, u)
        y_new = y + rho * (ax_rel - z_new)
        return x_new, z_new, y_new

    x, z, y = jax.lax.fori_loop(
        0, iters, body, (x0_ref[:], z0_ref[:], y0_ref[:])
    )
    x_out[:] = x
    z_out[:] = z
    y_out[:] = y


@partial(jax.jit, static_argnames=("iters", "sigma", "alpha", "block_k", "interpret", "precision"))
def admm_iterations(
    A: jnp.ndarray,  # (B, m, n) scaled constraint matrices
    Minv: jnp.ndarray,  # (B, n, n) KKT inverses
    q: jnp.ndarray,  # (B, n)
    l: jnp.ndarray,  # (B, m)
    u: jnp.ndarray,  # (B, m)
    rho: jnp.ndarray,  # (B, m) per-row penalties
    x0: jnp.ndarray,  # (B, n)
    z0: jnp.ndarray,  # (B, m)
    y0: jnp.ndarray,  # (B, m)
    iters: int,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    block_k: int = 4,
    interpret: bool | None = None,
    precision=jax.lax.Precision.HIGHEST,
):
    """Run `iters` over-relaxed ADMM iterations entirely in VMEM.

    Returns (x, z, y) with the original (unpadded) shapes.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, m, n = A.shape
    mp = _round_up(m, 128)
    np_ = _round_up(n, 128)
    bp = _round_up(b, block_k)

    def pad(arr, tgt):
        cfg = [(0, bp - b)] + [(0, t - s) for t, s in zip(tgt, arr.shape[1:])]
        return jnp.pad(arr, cfg)

    A_p = pad(A, (mp, np_))
    Minv_p = pad(Minv, (np_, np_))
    q_p = pad(q, (np_,))[:, None, :]
    l_p = pad(l, (mp,))[:, None, :]
    u_p = pad(u, (mp,))[:, None, :]
    rho_p = pad(rho, (mp,))[:, None, :]
    x0_p = pad(x0, (np_,))[:, None, :]
    z0_p = pad(z0, (mp,))[:, None, :]
    y0_p = pad(y0, (mp,))[:, None, :]
    # inert padding: rho = 0 on padded rows => y stays 0; l = u = 0 => z = 0
    inv_rho_p = jnp.where(rho_p > 0, 1.0 / jnp.maximum(rho_p, 1e-30), 0.0)

    grid = (bp // block_k,)

    def bspec(shape):
        ndim = len(shape)
        return pl.BlockSpec(
            (block_k,) + shape,
            lambda i: (i,) + (0,) * ndim,
            memory_space=pltpu.VMEM,
        )

    out_shapes = (
        jax.ShapeDtypeStruct((bp, 1, np_), jnp.float32),
        jax.ShapeDtypeStruct((bp, 1, mp), jnp.float32),
        jax.ShapeDtypeStruct((bp, 1, mp), jnp.float32),
    )
    x, z, y = pl.pallas_call(
        partial(_kernel, iters=iters, sigma=sigma, alpha=alpha, precision=precision),
        grid=grid,
        in_specs=[
            bspec((mp, np_)),  # A
            bspec((np_, np_)),  # Minv
            bspec((1, np_)),  # q
            bspec((1, mp)),  # l
            bspec((1, mp)),  # u
            bspec((1, mp)),  # rho
            bspec((1, mp)),  # inv_rho
            bspec((1, np_)),  # x0
            bspec((1, mp)),  # z0
            bspec((1, mp)),  # y0
        ],
        out_specs=(bspec((1, np_)), bspec((1, mp)), bspec((1, mp))),
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
        ),
        interpret=interpret,
    )(A_p, Minv_p, q_p, l_p, u_p, rho_p, inv_rho_p, x0_p, z0_p, y0_p)
    return x[:b, 0, :n], z[:b, 0, :m], y[:b, 0, :m]
