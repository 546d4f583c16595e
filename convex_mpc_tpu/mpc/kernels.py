"""Pallas TPU kernels for the batched ADMM iteration loop.

Why a kernel: one ADMM iteration per scenario is two GEMVs against the
scenario's constraint matrix A (m x n ~ 448 x 192, ~340 KB f32) plus one
against the KKT inverse (n x n, ~150 KB) and elementwise projections. Under
XLA the (B, m, n) batched matvecs re-stream every matrix from HBM on every
iteration — for B = 512 and 150+ iterations that is tens of GB of HBM
traffic for ~16 GFLOP of math: the solver is bandwidth-bound. These kernels
block K scenarios per grid program, pin their data in VMEM, and run the
whole iteration loop on-chip.

Two kernels:

- :func:`admm_iterations` — legacy dense-A form used by the fixed-segment
  ``admm.solve`` path (generic QPs, tests).
- :func:`admm_iterations_structured` — the production form for the
  condensed MPC QP (``admm.solve_adaptive``), consuming the friction
  blocks directly. Its arithmetic is **bitwise identical** to
  :func:`admm_iterations_structured_xla` (the XLA chunk path), which is
  what makes the kernel certifiable by the same closed-loop evidence:

  * the block matvecs are explicitly unrolled 4-term / 3-term elementwise
    sums — no compiler-chosen contraction order. In the kernel the operand
    spreads between row- and variable-layout use 0/1 selection matmuls,
    which are exact (a single nonzero per output element);
  * the KKT matvec is an elementwise broadcast product plus a fixed
    binary-tree fold over the lane axis padded to a power of two (padding
    terms are exact zeros), identical bracketing in both paths. Probing
    showed NO dense MXU contraction agrees bitwise between XLA and Mosaic
    (each schedules the f32(bf16x3) accumulation differently), so the
    reduction order must be pinned in source;
  * the final column->row transpose is an identity-matrix contraction —
    again exact.

  Bitwise equivalence over 100+ iterations on real condensed QPs is
  asserted in tests/test_kernels.py. Caveat: equivalence holds for FINITE
  iterates. A diverging solve (inf/NaN) contaminates the kernel's inert
  zero padding (0 * inf = NaN inside the fold) differently from the twin's
  post-hoc jnp.pad, so non-finite trajectories may differ elementwise —
  irrelevant for real solves, which the solver keeps finite.

Padding is constructed to be exactly inert: padded constraint rows have
rho = 0 and l = u = 0 so z = y = 0 there; padded variable columns have
Minv = 0 and q = 0 so x stays 0 there; fold padding contributes exact
zeros. This replaces the capability OSQP's native ADMM hot loop provides
to the reference (centroidal_mpc.py:20-38,98).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# Legacy dense-A kernel (fixed-segment admm.solve path)
# ---------------------------------------------------------------------------
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
        # (reciprocal-multiply differs in the last ulp); padded rows have
        # rho = 0 — inv_rho carries their mask
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
    """Run `iters` over-relaxed ADMM iterations entirely in VMEM (dense A).

    Returns (x, z, y) with the original (unpadded) shapes.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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


# ---------------------------------------------------------------------------
# Structured condensed-QP iteration pair (solve_adaptive path)
# ---------------------------------------------------------------------------
def _structured_kernel(cf_ref, dr_ref, boxv_ref, Minv_ref, q_ref, l_ref,
                       u_ref, rho_ref, x0_ref, z0_ref, y0_ref,
                       x_out, z_out, y_out, *, iters, sigma, alpha, np_, nb):
    cf = cf_ref[:]        # (K, 4, np_)  C by face, variable layout
    dr = dr_ref[:]        # (K, 3, mp)   C by coord, row layout
    boxv = boxv_ref[:]    # (K, 1, np_)  box diag, variable layout
    Minv = Minv_ref[:]    # (K, np_, np_) zero-padded
    q = q_ref[:]          # (K, 1, np_)
    l = l_ref[:]
    u = u_ref[:]
    rho = rho_ref[:]      # (K, 1, mp), 0 on padding
    rho_safe = jnp.where(rho > 0, rho, 1.0)
    mp = l.shape[-1]
    nz, m_fr = nb * 3, nb * 4

    # 0/1 spread matrices between row layout (m) and variable layout (nz),
    # built from iota IN VMEM: passing them as (broadcast) operands was
    # measured to re-stream ~4.5 MB into every grid program (~10 ms/chunk
    # at B = 512, block_k = 4); as loop-invariant kernel values they are
    # materialized once per program. Selection matmuls are exact — each
    # output element is a sum with at most one nonzero term — so they
    # carry values between layouts without rounding, which the bitwise
    # XLA/Pallas equivalence relies on.
    # All five row->var spreads ride ONE dot against a (mp, 5*np_) matrix
    # (and the four var->row spreads one dot against (np_, 4*mp)): a
    # (K, 1, a) @ (a, b) selection matmul has M = 1, so its cost is pure
    # issue latency — 8 separate dots per iteration measured ~11 ms per
    # 25-iteration chunk at B = 512; combined, 2 dots. Slicing the wide
    # exact result afterwards yields bit-identical values.
    rm = jax.lax.broadcasted_iota(jnp.int32, (mp, 5 * np_), 0)  # constraint row
    cw = jax.lax.broadcasted_iota(jnp.int32, (mp, 5 * np_), 1)
    f_id = cw // np_  # which spread: face 0..3, then box
    cv = cw % np_     # variable col
    fr_block = (rm // 4 == cv // 3) & (rm < m_fr) & (cv < nz)
    # logical composition, not jnp.where: Mosaic cannot lower selects over
    # wide i1 vectors ("unsupported target bitwidth for truncation")
    sel_row2var = (
        ((f_id < 4) & fr_block & (rm % 4 == f_id))
        | ((f_id == 4) & (rm - m_fr == cv) & (rm >= m_fr) & (cv < nz))
    ).astype(jnp.float32)

    rv = jax.lax.broadcasted_iota(jnp.int32, (np_, 4 * mp), 0)  # variable row
    cw2 = jax.lax.broadcasted_iota(jnp.int32, (np_, 4 * mp), 1)
    r_id = cw2 // mp  # which spread: coord 0..2, then box
    cm = cw2 % mp     # constraint col
    vr_block = (cm // 4 == rv // 3) & (cm < m_fr) & (rv < nz)
    sel_var2row = (
        ((r_id < 3) & vr_block & (rv % 3 == r_id))
        | ((r_id == 3) & (cm - m_fr == rv) & (rv < nz))
    ).astype(jnp.float32)

    def _spread(vec, sel):
        # (K, 1, a) @ (a, b): 0/1 selection — exact
        return jax.lax.dot_general(
            vec, sel, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC)

    def mv_AT(w):  # (K, 1, mp) -> (K, 1, np_): same 4-term order as XLA twin
        wide = _spread(w, sel_row2var)  # (K, 1, 5*np_)
        acc = None
        for f in range(4):
            term = cf[:, f:f + 1, :] * wide[:, :, f * np_:(f + 1) * np_]
            acc = term if acc is None else acc + term
        return acc + boxv * wide[:, :, 4 * np_:]

    # box diag in ROW layout, via the same exact spread (loop-invariant);
    # (boxv * v) spread = spread(boxv) * spread(v) elementwise — the same
    # two floats multiply either way, so this is bit-identical to the
    # twin's boxv * v in variable space
    boxr = _spread(boxv, sel_var2row[:, 3 * mp:])  # (K, 1, mp)

    def mv_A(v):  # (K, 1, np_) -> (K, 1, mp): same 3-term order as XLA twin
        wide = _spread(v, sel_var2row)  # (K, 1, 4*mp)
        acc = None
        for r in range(3):
            term = dr[:, r:r + 1, :] * wide[:, :, r * mp:(r + 1) * mp]
            acc = term if acc is None else acc + term
        return acc + boxr * wide[:, :, 3 * mp:]

    # identity for the exact column->row transpose (kernels cannot capture
    # array constants — compute from iota)
    _ri = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    _ci = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    eyeN = (_ri == _ci).astype(jnp.float32)

    def kkt_matvec(rhs):  # (K, 1, np_) -> (K, 1, np_)
        # prod[n, m] = rhs[m] * Minv[n, m] broadcasts with no transpose;
        # binary-tree fold over lanes, bracketing shared with the XLA twin
        prod = rhs * Minv  # (K, np_, np_)
        k = np_
        while k > 1:
            h = k // 2
            prod = prod[:, :, :h] + prod[:, :, h:k]
            k = h
        # (K, np_, 1) -> (K, 1, np_): single nonzero per output — exact
        return jax.lax.dot_general(
            prod, eyeN, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC)

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q + mv_AT(rho * z - y)
        xt = kkt_matvec(rhs)
        axt = mv_A(xt)
        x_new = alpha * xt + (1.0 - alpha) * x
        ax_rel = alpha * axt + (1.0 - alpha) * z
        z_new = jnp.clip(ax_rel + jnp.where(rho > 0, y / rho_safe, 0.0), l, u)
        y_new = y + rho * (ax_rel - z_new)
        return x_new, z_new, y_new

    x, z, y = jax.lax.fori_loop(0, iters, body, (x0_ref[:], z0_ref[:], y0_ref[:]))
    x_out[:] = x
    z_out[:] = z
    y_out[:] = y


@partial(jax.jit, static_argnames=("iters", "sigma", "alpha"))
def admm_iterations_structured_xla(
    C: jnp.ndarray,        # (B, nb, 4, 3) scaled friction blocks
    box_diag: jnp.ndarray,  # (B, nz) scaled box diagonal
    Minv: jnp.ndarray,     # (B, nz, nz) KKT inverses
    q: jnp.ndarray,        # (B, nz)
    l: jnp.ndarray,        # (B, m)
    u: jnp.ndarray,        # (B, m)
    rho_vec: jnp.ndarray,  # (B, m)
    x0, z0, y0,
    iters: int,
    sigma: float = 1e-6,
    alpha: float = 1.6,
):
    """XLA twin of the structured kernel — bitwise-identical iterates.

    Every reduction is either explicitly unrolled (block matvecs) or a
    fixed binary tree (KKT matvec), so XLA has no contraction-order
    freedom; tests/test_kernels.py asserts bit-equality vs the kernel.
    """
    B, nb = C.shape[0], C.shape[1]
    nz, m_fr = nb * 3, nb * 4
    np2 = _next_pow2(max(nz, 128))

    def mv_AT(w):
        wf = w[:, :m_fr].reshape(B, nb, 4)
        acc = C[:, :, 0, :] * wf[:, :, 0:1]
        for f in range(1, 4):
            acc = acc + C[:, :, f, :] * wf[:, :, f:f + 1]
        return acc.reshape(B, nz) + box_diag * w[:, m_fr:]

    def mv_A(v):
        vr = v.reshape(B, nb, 3)
        acc = C[:, :, :, 0] * vr[:, :, 0:1]
        for r in range(1, 3):
            acc = acc + C[:, :, :, r] * vr[:, :, r:r + 1]
        return jnp.concatenate([acc.reshape(B, m_fr), box_diag * v], axis=-1)

    def kkt_matvec(rhs):
        # out[b, n] = sum_m Minv[b, n, m] * rhs[b, m], fixed binary tree
        # over the lane axis padded to a power of two (exact zeros)
        prod = rhs[:, None, :] * Minv  # (B, nz, nz) [n, m]
        prod = jnp.pad(prod, ((0, 0), (0, 0), (0, np2 - nz)))
        k = np2
        while k > 1:
            h = k // 2
            prod = prod[:, :, :h] + prod[:, :, h:k]
            k = h
        return prod[:, :, 0]

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q + mv_AT(rho_vec * z - y)
        xt = kkt_matvec(rhs)
        axt = mv_A(xt)
        x_new = alpha * xt + (1.0 - alpha) * x
        ax_rel = alpha * axt + (1.0 - alpha) * z
        z_new = jnp.clip(ax_rel + y / rho_vec, l, u)
        y_new = y + rho_vec * (ax_rel - z_new)
        return (x_new, z_new, y_new)

    return jax.lax.fori_loop(0, iters, body, (x0, z0, y0))


@partial(jax.jit, static_argnames=("iters", "sigma", "alpha", "block_k", "interpret"))
def admm_iterations_structured(
    C: jnp.ndarray,        # (B, nb, 4, 3) scaled friction blocks
    box_diag: jnp.ndarray,  # (B, nz)
    Minv: jnp.ndarray,     # (B, nz, nz)
    q: jnp.ndarray,        # (B, nz)
    l: jnp.ndarray,        # (B, m)
    u: jnp.ndarray,        # (B, m)
    rho_vec: jnp.ndarray,  # (B, m)
    x0, z0, y0,
    iters: int,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    block_k: int = 32,
    interpret: bool | None = None,
):
    """VMEM-resident structured ADMM chunk, bitwise == the XLA twin.

    Consumes the condensed QP's block coefficients directly — the dense
    (B, m, nz) constraint matrix is never materialized anywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, nb = C.shape[0], C.shape[1]
    nz, m_fr = nb * 3, nb * 4
    m = m_fr + nz
    assert l.shape[-1] == m, (l.shape, m)
    # lane width: power of two >= nz so the tree fold halves exactly
    np_ = _next_pow2(max(nz, 128))
    mp = _round_up(m, 128)
    # VMEM cap: per-program scoped allocation scales with block_k * np_^2
    # (Minv block + the in-kernel rhs*Minv product + double buffering);
    # block_k=32 at np_=512 (horizon 32) measured 111 MB > the 100 MB limit
    # — the silent reason the round-4 multi-config grid never recorded its
    # n=32 config. Per-scenario results are block-size-independent
    # (scenarios are independent lanes), so shrinking block_k for large
    # horizons preserves bitwise outputs.
    block_k = max(1, min(block_k, (24 * 2**20) // (np_ * np_ * 4)))
    bp = _round_up(B, block_k)

    def padb(a):  # pad batch axis
        return jnp.pad(a, [(0, bp - B)] + [(0, 0)] * (a.ndim - 1))

    cf = jnp.zeros((B, 4, np_), jnp.float32).at[:, :, :nz].set(
        jnp.transpose(C, (0, 2, 1, 3)).reshape(B, 4, nz))
    dr = jnp.zeros((B, 3, mp), jnp.float32).at[:, :, :m_fr].set(
        jnp.transpose(C, (0, 3, 1, 2)).reshape(B, 3, m_fr))
    boxv = jnp.pad(box_diag, ((0, 0), (0, np_ - nz)))[:, None, :]
    Minv_p = jnp.pad(Minv, ((0, 0), (0, np_ - nz), (0, np_ - nz)))
    pad_v = lambda a: jnp.pad(a, ((0, 0), (0, np_ - nz)))[:, None, :]
    pad_r = lambda a: jnp.pad(a, ((0, 0), (0, mp - m)))[:, None, :]

    grid = (bp // block_k,)

    def bs(shape):
        nd = len(shape)
        return pl.BlockSpec((block_k,) + shape, lambda i: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    out_sh = (jax.ShapeDtypeStruct((bp, 1, np_), jnp.float32),
              jax.ShapeDtypeStruct((bp, 1, mp), jnp.float32),
              jax.ShapeDtypeStruct((bp, 1, mp), jnp.float32))
    x, z, y = pl.pallas_call(
        partial(_structured_kernel, iters=iters, sigma=sigma, alpha=alpha,
                np_=np_, nb=nb),
        grid=grid,
        in_specs=[bs((4, np_)), bs((3, mp)), bs((1, np_)),
                  bs((np_, np_)), bs((1, np_)), bs((1, mp)), bs((1, mp)),
                  bs((1, mp)), bs((1, np_)), bs((1, mp)), bs((1, mp))],
        out_specs=(bs((1, np_)), bs((1, mp)), bs((1, mp))),
        out_shape=out_sh,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
        ),
        interpret=interpret,
    )(padb(cf), padb(dr), padb(boxv),
      padb(Minv_p), padb(pad_v(q)), padb(pad_r(l)), padb(pad_r(u)),
      padb(pad_r(rho_vec)), padb(pad_v(x0)), padb(pad_r(z0)), padb(pad_r(y0)))
    return x[:B, 0, :nz], z[:B, 0, :m], y[:B, 0, :m]
