"""Batched OSQP-style ADMM QP solver in pure JAX.

Solves  min 1/2 z'Pz + q'z  s.t.  l <= Az <= u  (P diagonal positive) — the
capability the reference delegates to the native OSQP C solver via CasADi
(reference centroidal_mpc.py:20-38,98,213). TPU-first design decisions:

- **Ruiz equilibration + cost normalization** (OSQP `scaling`, reference opts
  set scaling=5): the raw MPC QP mixes R = 1e-5 force costs with Q up to 50
  state costs and ~100 N forces with ~0.3 m states; unscaled f32 ADMM stalls
  near 10% force error. A few Ruiz sweeps restore fast convergence at f32.
- **Segment-wise adaptive rho** (OSQP `adaptive_rho`): the solve runs a small
  static number of segments; between segments the scalar rho is re-tuned from
  the primal/dual residual ratio and the linear system is re-factorized —
  matching OSQP's refactor-on-rho-update behavior with static shapes.
- **One factorization per segment, matmul-only iterations.** M = P + sigma*I
  + A' R A is Cholesky-inverted once per segment; each iteration is then two
  dense matvecs plus elementwise projections. Under ``vmap`` these become
  (B, m, n) @ (B, n) batched matmuls that map straight onto the MXU; no
  triangular solves or data-dependent shapes in the loop.
- **Per-row rho** with equality rows boosted 1e3x (OSQP `rho_eq` convention).
- **Warm starting** of (x, y, rho) carried across MPC control steps exactly
  like the reference (centroidal_mpc.py:92-95,108-110).
- **Fixed iteration count + masked convergence**: termination inside jit is
  shape-static; the solver reports unscaled residuals and the iteration at
  which the OSQP criterion was first met.

Precision: all contractions pin f32 (HIGHEST) — TPU default matmul precision
is bf16, which wrecks dual-residual convergence.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from convex_mpc_tpu.mpc.qp import QpData
from convex_mpc_tpu.ops.linalg import inv_small_unrolled

_PRECISION = lax.Precision.HIGHEST


def _mv(A, x):
    return jnp.matmul(A, x, precision=_PRECISION)


class AdmmState(NamedTuple):
    """Carried solver state (warm start between MPC steps). Unscaled."""

    x: jnp.ndarray  # (nz,) primal
    z: jnp.ndarray  # (m,) split variable (constraint space)
    y: jnp.ndarray  # (m,) dual
    rho: jnp.ndarray  # () adapted scalar penalty, carried across solves


class AdmmSolution(NamedTuple):
    x: jnp.ndarray  # (nz,) primal solution
    y: jnp.ndarray  # (m,) duals for constraint rows
    prim_res: jnp.ndarray  # () final max|Ax - z| (unscaled)
    dual_res: jnp.ndarray  # () final max|Px + q + A'y| (unscaled)
    iters: jnp.ndarray  # () iteration at which termination criterion held (or total)
    state: AdmmState  # carry for warm start


class ScaledQp(NamedTuple):
    p_diag: jnp.ndarray
    q: jnp.ndarray
    A: jnp.ndarray
    l: jnp.ndarray
    u: jnp.ndarray
    d: jnp.ndarray  # (nz,) variable scaling:   x = d * x_hat
    e: jnp.ndarray  # (m,) constraint scaling:  z = z_hat / e,  y = e * y_hat / c
    c: jnp.ndarray  # () cost scaling
    p_dense: jnp.ndarray | None = None


def _px(p_diag, p_dense, x):
    """P @ x for diagonal or dense P."""
    if p_dense is None:
        return p_diag * x
    return _mv(p_dense, x)


def init_state(qp: QpData, rho: float = 0.1) -> AdmmState:
    nz = qp.q.shape[-1]
    m = qp.l.shape[-1]
    dtype = qp.q.dtype
    return AdmmState(
        x=jnp.zeros((nz,), dtype),
        z=jnp.zeros((m,), dtype),
        y=jnp.zeros((m,), dtype),
        rho=jnp.asarray(rho, dtype),
    )


def ruiz_equilibrate(qp: QpData, iters: int = 10) -> ScaledQp:
    """Modified Ruiz equilibration of [P A'; A 0] + OSQP cost normalization.

    Returns the scaled problem and the diagonal scalings (d, e, c) with
    P_s = c D P D, q_s = c D q, A_s = E A D, l_s = E l, u_s = E u.
    """
    dense = qp.p_dense is not None
    p = qp.p_dense if dense else qp.p_diag
    A = qp.A
    q = qp.q
    nz = q.shape[-1]
    m = qp.l.shape[-1]
    dtype = q.dtype
    d = jnp.ones((nz,), dtype)
    e = jnp.ones((m,), dtype)
    c = jnp.asarray(1.0, dtype)

    def col_norms_P(p):
        return jnp.max(jnp.abs(p), axis=0) if dense else jnp.abs(p)

    def sweep(carry, _):
        p, A, q, d, e, c = carry
        col_norm = jnp.maximum(jnp.max(jnp.abs(A), axis=0), col_norms_P(p))
        dd = 1.0 / jnp.sqrt(jnp.maximum(col_norm, 1e-12))
        dd = jnp.clip(dd, 1e-6, 1e6)
        row_norm = jnp.max(jnp.abs(A * dd[None, :]), axis=1)
        ee = 1.0 / jnp.sqrt(jnp.maximum(row_norm, 1e-12))
        ee = jnp.clip(ee, 1e-6, 1e6)
        A = ee[:, None] * (A * dd[None, :])
        p = (dd[:, None] * p * dd[None, :]) if dense else (dd * dd * p)
        q = dd * q
        # cost normalization (OSQP): gamma = 1/max(mean(|P| col norms), |q|_inf)
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(jnp.mean(col_norms_P(p)), jnp.max(jnp.abs(q))), 1e-12
        )
        gamma = jnp.clip(gamma, 1e-6, 1e6)
        p = gamma * p
        q = gamma * q
        return (p, A, q, d * dd, e * ee, c * gamma), None

    (p, A, q, d, e, c), _ = lax.scan(sweep, (p, A, q, d, e, c), None, length=iters)
    scale = jnp.where(jnp.isfinite(qp.l), e, 1.0)
    l_s = qp.l * scale
    u_s = qp.u * jnp.where(jnp.isfinite(qp.u), e, 1.0)
    if dense:
        return ScaledQp(
            p_diag=jnp.diagonal(p), q=q, A=A, l=l_s, u=u_s, d=d, e=e, c=c, p_dense=p
        )
    return ScaledQp(p_diag=p, q=q, A=A, l=l_s, u=u_s, d=d, e=e, c=c)


@partial(
    jax.jit,
    static_argnames=(
        "max_iter", "check_every", "segments", "scaling_iters", "adaptive_rho",
        "scaled_termination", "use_pallas", "pallas_precision", "box_tail",
        "setup_precision",
    ),
)
def solve(
    qp: QpData,
    state: AdmmState,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    eq_scale: float = 1e3,
    eps_abs: float = 1e-4,
    eps_rel: float = 1e-4,
    eps_eq_abs: float = 3e-4,
    eps_dual_abs: float = 4e-5,
    max_iter: int = 200,
    check_every: int = 10,
    segments: int = 4,
    scaling_iters: int = 10,
    adaptive_rho: bool = True,
    scaled_termination: bool = False,
    use_pallas: bool = False,
    pallas_precision=lax.Precision.HIGHEST,
    box_tail: int = 0,
    setup_precision=lax.Precision.HIGHEST,
) -> AdmmSolution:
    """Solve one QP from a warm-start state.

    Single-scenario shapes; ``vmap`` over a leading batch axis for batches.
    ``max_iter`` is split into ``segments`` equal chunks; rho adapts (and the
    system is refactorized) between chunks.

    ``box_tail``: declare that the LAST box_tail rows of A form an identity
    block over the variables (the condensed MPC QP's per-force box rows).
    Those rows stay diagonal under Ruiz scaling, so the solver applies them
    analytically — the KKT assembly and the per-iteration matvecs then only
    touch the dense upper rows (~40% fewer FLOPs for the condensed QP).

    Tolerances/``sigma``/``alpha`` are trace-time constants: each distinct
    value compiles a distinct program when the caller jits this function.
    Sweep them via explicit per-value jits (as ``tools/solve_ablation.py``
    does), not as runtime arrays.
    """
    with jax.default_matmul_precision("highest"):
        return _solve_impl(
            qp, state, sigma, alpha, eq_scale, eps_abs, eps_rel, eps_eq_abs,
            eps_dual_abs, max_iter, check_every, segments, scaling_iters,
            adaptive_rho, scaled_termination, use_pallas, pallas_precision,
            box_tail, setup_precision,
        )


def _solve_impl(
    qp, state, sigma, alpha, eq_scale, eps_abs, eps_rel, eps_eq_abs,
    eps_dual_abs, max_iter, check_every, segments, scaling_iters,
    adaptive_rho, scaled_termination, use_pallas, pallas_precision,
    box_tail, setup_precision,
) -> AdmmSolution:
    # NOTE: jnp.linalg.cholesky / solve_triangular lower to *internal*
    # matmuls at the ambient default precision — bf16 on TPU unless this
    # scope pins it. A bf16-factored KKT inverse silently degrades solver
    # accuracy on TPU only (CPU defaults are exact), which shifted marginal
    # closed-loop maneuvers. The explicit-precision matmuls elsewhere are
    # unaffected by the ambient default.
    dtype = qp.q.dtype
    nz = qp.q.shape[-1]
    s = ruiz_equilibrate(qp, scaling_iters)
    is_eq = (qp.u - qp.l) < 1e-9

    # scale warm start into the scaled space
    x = state.x / s.d
    z = jnp.clip(state.z * s.e, s.l, s.u)
    y = s.c * state.y / s.e  # y = E y_hat / c  =>  y_hat = c E^{-1} y
    rho = jnp.clip(state.rho, 1e-6, 1e6)

    eye = jnp.eye(nz, dtype=dtype)
    iters_per_seg = max_iter // segments

    # structured box block: scaled identity rows stay diagonal under Ruiz
    if box_tail:
        m_fr = s.l.shape[-1] - box_tail
        A_fr = s.A[:m_fr]
        box_diag = jnp.diagonal(s.A[m_fr:])  # (nz,) = e_box * d

        def mv_A(v):
            return jnp.concatenate([_mv(A_fr, v), box_diag * v])

        def mv_AT(w):
            return _mv(A_fr.T, w[:m_fr]) + box_diag * w[m_fr:]
    else:
        def mv_A(v):
            return _mv(s.A, v)

        def mv_AT(w):
            return _mv(s.A.T, w)

    # rho enters A' R A as a scalar times a FIXED matrix (R = rho * diag(w),
    # w = eq_scale pattern): hoist K = A' diag(w) A out of the segment loop —
    # one large matmul per solve instead of one per refactorization.
    # Setup precision note: after Ruiz + cost normalization the tiny R-scale
    # diagonal of P (the only curvature in the flat force directions) sits
    # ~1e-4..1e-6 below the rho A'A terms; bf16 formation rounds it away and
    # shifts the optimum by tens of percent (measured). Keep HIGHEST.
    w_vec = jnp.where(is_eq, eq_scale, 1.0).astype(dtype)
    if s.p_dense is None:
        P_mat = jnp.diag(s.p_diag + sigma)
    else:
        P_mat = s.p_dense + sigma * jnp.eye(nz, dtype=dtype)
    if box_tail:
        m_fr_ = s.l.shape[-1] - box_tail
        K = jnp.matmul(
            A_fr.T, A_fr * w_vec[:m_fr_, None], precision=setup_precision
        )
        K_box_diag = w_vec[-box_tail:] * box_diag * box_diag  # (nz,)
    else:
        K = jnp.matmul(s.A.T, s.A * w_vec[:, None], precision=setup_precision)
        K_box_diag = None

    def run_segment(seg, carry):
        x, z, y, rho, conv_iter = carry
        rho_vec = rho * w_vec
        M = P_mat + rho * K
        if K_box_diag is not None:
            M = M + jnp.diag(rho * K_box_diag)
        L = jnp.linalg.cholesky(M)
        Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        Minv = jnp.matmul(Linv.T, Linv, precision=setup_precision)

        if use_pallas:
            # VMEM-resident iteration kernel (mpc.kernels): no per-iteration
            # convergence checks — residuals are evaluated at segment ends
            from convex_mpc_tpu.mpc import kernels

            x1, z1, y1 = kernels.admm_iterations(
                s.A[None], Minv[None], s.q[None], s.l[None], s.u[None],
                rho_vec[None], x[None], z[None], y[None],
                iters=iters_per_seg, sigma=sigma, alpha=alpha, block_k=1,
                precision=pallas_precision,
            )
            x, z, y = x1[0], z1[0], y1[0]
        else:
            def body(k, inner):
                x, z, y, conv_iter = inner
                rhs = sigma * x - s.q + mv_AT(rho_vec * z - y)
                xt = _mv(Minv, rhs)
                axt = mv_A(xt)
                x_new = alpha * xt + (1.0 - alpha) * x
                ax_relaxed = alpha * axt + (1.0 - alpha) * z
                z_new = jnp.clip(ax_relaxed + y / rho_vec, s.l, s.u)
                y_new = y + rho_vec * (ax_relaxed - z_new)

                def check():
                    pr, dr = _residuals(
                        qp, s, is_eq, x_new, z_new, y_new,
                        eps_abs, eps_rel, eps_eq_abs, eps_dual_abs, scaled_termination,
                    )
                    return (pr <= 1.0) & (dr <= 1.0)

                it = seg * iters_per_seg + k + 1
                do_check = (it % check_every) == 0
                converged = lax.cond(do_check, check, lambda: jnp.array(False))
                conv_iter = jnp.where(converged & (conv_iter < 0), it, conv_iter)
                return (x_new, z_new, y_new, conv_iter)

            x, z, y, conv_iter = lax.fori_loop(
                0, iters_per_seg, body, (x, z, y, conv_iter)
            )

        if adaptive_rho:
            pr, dr = _residuals(
                qp, s, is_eq, x, z, y,
                eps_abs, eps_rel, eps_eq_abs, eps_dual_abs, scaled_termination,
            )
            ratio = jnp.sqrt(pr / jnp.maximum(dr, 1e-12))
            rho = jnp.clip(rho * jnp.clip(ratio, 0.1, 10.0), 1e-6, 1e6)
        return (x, z, y, rho, conv_iter)

    conv0 = jnp.asarray(-1, jnp.int32)
    carry = (x, z, y, rho, conv0)
    for seg in range(segments):  # static unroll: refactorization points
        carry = run_segment(seg, carry)
    x, z, y, rho, conv_iter = carry

    rp, rd = _raw_residuals(qp, s, x, z, y)
    x_out = s.d * x
    y_out = s.e * y / s.c
    z_out = z / s.e
    iters = jnp.where(conv_iter < 0, max_iter, conv_iter)
    return AdmmSolution(
        x=x_out,
        y=y_out,
        prim_res=rp,
        dual_res=rd,
        iters=iters,
        state=AdmmState(x=x_out, z=z_out, y=y_out, rho=rho),
    )


def _raw_residuals(qp: QpData, s: ScaledQp, x_hat, z_hat, y_hat):
    """Unscaled max-abs primal/dual residuals (for reporting)."""
    x = s.d * x_hat
    z = z_hat / s.e
    y = s.e * y_hat / s.c
    ax = _mv(qp.A, x)
    rp = jnp.max(jnp.abs(ax - z))
    rd = jnp.max(jnp.abs(_px(qp.p_diag, qp.p_dense, x) + qp.q + _mv(qp.A.T, y)))
    return rp, rd


def _residuals(
    qp, s, is_eq, x_hat, z_hat, y_hat,
    eps_abs, eps_rel, eps_eq_abs, eps_dual_abs, scaled: bool,
):
    """Dispatch: unscaled row-type-aware criterion (full form) or OSQP-style
    scaled-space criterion (condensed form; the reference's own OSQP options
    set scaled_termination=True, centroidal_mpc.py:34). The scaled variant is
    the right choice when the unscaled dense-P matvec has an f32 noise floor
    above the force-accuracy-implied tolerance."""
    if scaled:
        ax = _mv(s.A, x_hat)
        aty = _mv(s.A.T, y_hat)
        px = _px(s.p_diag, s.p_dense, x_hat)
        r = jnp.abs(ax - z_hat)
        rp = jnp.max(r)
        ep = eps_abs + eps_rel * jnp.maximum(jnp.max(jnp.abs(ax)), jnp.max(jnp.abs(z_hat)))
        rd = jnp.max(jnp.abs(px + s.q + aty))
        ed = eps_abs + eps_rel * jnp.maximum(
            jnp.max(jnp.abs(px)), jnp.maximum(jnp.max(jnp.abs(aty)), jnp.max(jnp.abs(s.q)))
        )
        return rp / ep, rd / ed
    return _unscaled_residuals(
        qp, s, is_eq, x_hat, z_hat, y_hat, eps_abs, eps_rel, eps_eq_abs, eps_dual_abs
    )


def _unscaled_residuals(
    qp: QpData, s: ScaledQp, is_eq, x_hat, z_hat, y_hat, eps_abs, eps_rel, eps_eq_abs, eps_dual_abs
):
    """Normalized termination quantities on the *unscaled* problem.

    Returns (pr, dr): residuals divided by their tolerances; <= 1 means met.
    The tolerances are row-type aware, targeted at the BASELINE 2% force
    parity budget for the reference cost structure:

    - dynamics equality rows get a tight *absolute* primal tolerance
      (eps_eq_abs): slack r in an equality row implies a force inconsistency
      ~ ||Bd^-1|| r ~ (m/dt) r ~ 700 r, so OSQP's relative criterion
      (eps_rel * |z|_inf with |z| ~ 100 N) would admit multi-Newton errors;
    - inequality rows use OSQP's eps_abs + eps_rel * scale;
    - the dual criterion is *absolute* (eps_dual_abs): with R = 1e-5 the
      force directions are nearly flat, so force error scales like
      dual_res / (2R); 4e-5 = 2R * (2% of a 100 N force scale).
    """
    x = s.d * x_hat
    z = z_hat / s.e
    y = s.e * y_hat / s.c
    ax = _mv(qp.A, x)
    aty = _mv(qp.A.T, y)
    px = _px(qp.p_diag, qp.p_dense, x)
    r = jnp.abs(ax - z)
    rp_eq = jnp.max(jnp.where(is_eq, r, 0.0))
    rp_in = jnp.max(jnp.where(is_eq, 0.0, r))
    ep_in = eps_abs + eps_rel * jnp.maximum(jnp.max(jnp.abs(ax)), jnp.max(jnp.abs(z)))
    rd = jnp.max(jnp.abs(px + qp.q + aty))
    pr = jnp.maximum(rp_eq / eps_eq_abs, rp_in / ep_in)
    dr = rd / eps_dual_abs
    return pr, dr


def solve_batch(qp: QpData, state: AdmmState, **kwargs) -> AdmmSolution:
    """Batched solve: every leaf of qp/state has a leading batch axis."""
    return jax.vmap(lambda q, st: solve(q, st, **kwargs))(qp, state)


class ScaledStructuredQp(NamedTuple):
    """Ruiz-equilibrated condensed QP in block form (batched)."""

    p_diag: jnp.ndarray  # (B, nz)
    p_dense: jnp.ndarray  # (B, nz, nz)
    q: jnp.ndarray  # (B, nz)
    C: jnp.ndarray  # (B, nb, 4, 3) scaled friction blocks
    box_diag: jnp.ndarray  # (B, nz) scaled box-row diagonal
    l: jnp.ndarray  # (B, m)
    u: jnp.ndarray  # (B, m)
    d: jnp.ndarray  # (B, nz)
    e: jnp.ndarray  # (B, m)
    c: jnp.ndarray  # (B,)


def ruiz_equilibrate_structured(
    p_dense, q, C, box_diag, l, u, iters: int = 10
) -> ScaledStructuredQp:
    """Ruiz + OSQP cost normalization on the block-form condensed QP.

    Same fixed point as :func:`ruiz_equilibrate` on the equivalent dense
    matrix (asserted in tests/test_condensed.py at f32 reassociation
    tolerance): column/row max-norms only ever see the nonzero entries,
    which live in the friction blocks and the box diagonal.

    Deferred-scaling formulation: the sweeps carry only the cumulative
    scalings (d, e, c) and recompute every norm from the RAW data — the
    scaled (B, nz, nz) Hessian is materialized exactly once at the end.
    The naive per-sweep rescale streamed the dense P several times per
    sweep (~41 ms of a ~91 ms solve at B = 512 on v5e); here each sweep is
    two fused multiply+max reductions over |P| plus small vector/block
    ops, and the cumulative products also accumulate less rounding than
    sequentially rescaled matrices. All inputs batched (leading B).
    """
    B, nz = q.shape
    nb = C.shape[1]
    m_fr = 4 * nb
    dtype = q.dtype
    P0a = jnp.abs(p_dense)
    C0a = jnp.abs(C)  # (B, nb, 4, 3)
    q0a = jnp.abs(q)
    b0a = jnp.abs(box_diag)

    d0 = jnp.ones((B, nz), dtype)
    e_fr0 = jnp.ones((B, nb, 4), dtype)
    e_box0 = jnp.ones((B, nz), dtype)
    c0 = jnp.ones((B,), dtype)

    def colP_at(d, c):
        # column norms of the currently-scaled Hessian:
        # c * d[col] * max_row(d[row] |P0|)
        return c[:, None] * d * jnp.max(d[:, :, None] * P0a, axis=-2)

    def sweep(carry, _):
        d, e_fr, e_box, c = carry
        d_blk = d.reshape(B, nb, 1, 3)
        colC = (
            d * jnp.max(e_fr[:, :, :, None] * C0a, axis=-2).reshape(B, nz)
        )
        box_s = e_box * b0a * d
        col_norm = jnp.maximum(jnp.maximum(colC, box_s), colP_at(d, c))
        dd = jnp.clip(1.0 / jnp.sqrt(jnp.maximum(col_norm, 1e-12)), 1e-6, 1e6)
        d = d * dd
        d_blk = d.reshape(B, nb, 1, 3)
        row_fr = jnp.max(e_fr[:, :, :, None] * C0a * d_blk, axis=-1)
        row_box = e_box * b0a * d
        ee_fr = jnp.clip(1.0 / jnp.sqrt(jnp.maximum(row_fr, 1e-12)), 1e-6, 1e6)
        ee_box = jnp.clip(1.0 / jnp.sqrt(jnp.maximum(row_box, 1e-12)), 1e-6, 1e6)
        e_fr = e_fr * ee_fr
        e_box = e_box * ee_box
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(
                jnp.mean(colP_at(d, c), axis=-1),
                c * jnp.max(d * q0a, axis=-1),
            ),
            1e-12,
        )
        gamma = jnp.clip(gamma, 1e-6, 1e6)
        return (d, e_fr, e_box, c * gamma), None

    (d, e_fr, e_box, c), _ = lax.scan(
        sweep, (d0, e_fr0, e_box0, c0), None, length=iters
    )

    # materialize the scaled problem once
    p = (c[:, None, None] * d[:, :, None] * d[:, None, :]) * p_dense
    q_s = c[:, None] * d * q
    C_s = e_fr[:, :, :, None] * C * d.reshape(B, nb, 1, 3)
    box_s = e_box * box_diag * d
    e = jnp.concatenate([e_fr.reshape(B, m_fr), e_box], axis=-1)
    l_s = l * jnp.where(jnp.isfinite(l), e, 1.0)
    u_s = u * jnp.where(jnp.isfinite(u), e, 1.0)
    return ScaledStructuredQp(
        p_diag=jnp.diagonal(p, axis1=-2, axis2=-1), p_dense=p, q=q_s, C=C_s,
        box_diag=box_s, l=l_s, u=u_s, d=d, e=e, c=c,
    )


# ---------------------------------------------------------------------------
# Certified active-set polish (module-level, sub-batch capable)
# ---------------------------------------------------------------------------
class PolishOps(NamedTuple):
    """Per-scenario operands of the polish — gatherable into a compacted
    sub-batch (every leaf carries the same leading batch axis)."""

    p_dense: jnp.ndarray  # (B, nz, nz) RAW Hessian
    q: jnp.ndarray  # (B, nz) RAW linear cost
    l: jnp.ndarray  # (B, m) RAW bounds
    u: jnp.ndarray  # (B, m)
    is_eq: jnp.ndarray  # (B, m)
    C: jnp.ndarray  # (B, nb, 4, 3) RAW friction blocks
    box: jnp.ndarray  # (B, nz) RAW box-row diagonal
    x_it: jnp.ndarray  # (B, nz) RAW-space iterate
    o_x: jnp.ndarray  # (B,) iterate objective
    v_x: jnp.ndarray  # (B,) iterate max constraint violation


def _polish_ax(o: PolishOps, xc):
    B, nz = o.q.shape
    nb = nz // 3
    m_fr = 4 * nb
    fr = jnp.einsum(
        "bnfr,bnr->bnf", o.C, xc.reshape(B, nb, 3), precision=_PRECISION
    ).reshape(B, m_fr)
    return jnp.concatenate([fr, o.box * xc], axis=-1)


def _polish_viol(o: PolishOps, xc):
    ax = _polish_ax(o, xc)
    v = jnp.maximum(o.l - ax, ax - o.u)
    return jnp.max(v.clip(min=0.0), axis=-1)


def _polish_obj(o: PolishOps, xc):
    pxc = jnp.einsum("bnm,bm->bn", o.p_dense, xc, precision=_PRECISION)
    return 0.5 * jnp.sum(xc * pxc, -1) + jnp.sum(o.q * xc, -1)


def _polish_core(o: PolishOps, a_lo, a_hi, reduced: bool, setup_precision):
    """Project the iterate onto the active manifold; LS duals.

    Returns (x_pol, y_rows, stat_res): the snapped point, the per-row
    least-squares multipliers of the active rows, and the per-scenario
    stationarity-support residual max_blocks |C' y - (-(P x + q))| — the
    part of the gradient the active rows cannot support. A correct set
    supports the gradient up to matvec noise; a set that pins a stiff
    direction wrongly (or misses an active row) leaves an
    O(curvature x displacement) unsupported component.

    ``reduced`` (static) selects the null-space component:

    - True: solve the reduced equality-constrained subproblem exactly
      (batched nz x nz formation + SPD inverse — the expensive certified
      path);
    - False: KEEP the iterate's null-space component and only snap the
      active-row component (pure block-local 7x7/3x3 arithmetic — no
      nz x nz work at all). At a settled warm-started iterate the flat
      directions are already placed by the contracting ADMM steps
      (measured round 3: 0.02-0.06% from the f64 optimum, CLOSER than
      the reduced solve's f32 Pi-P-Pi noise floor of ~1%).

    See the design discussion in solve_adaptive's attempt_polish (null-
    space form, no penalty absorption, the f32 Pi-P-Pi limit).
    """
    B, nz = o.q.shape
    nb = nz // 3
    m_fr = 4 * nb
    dtype = o.q.dtype
    face_rows = jnp.asarray(np.arange(m_fr).reshape(nb, 4))
    blk_cols = jnp.asarray(np.arange(nz).reshape(nb, 3))
    eye3 = jnp.eye(3, dtype=dtype)
    eye = jnp.eye(nz, dtype=dtype)

    t_all = jnp.where(a_lo, o.l, jnp.where(a_hi, o.u, 0.0))
    m_face = (a_lo | a_hi)[:, :m_fr][:, face_rows]
    t_face = t_all[:, :m_fr][:, face_rows] * m_face
    m_pin = (a_lo | a_hi)[:, m_fr:][:, blk_cols]
    t_pin = t_all[:, m_fr:][:, blk_cols] * m_pin
    coef_pin = o.box[:, blk_cols]
    C = jnp.concatenate(
        [
            o.C * m_face[..., None],
            eye3 * (coef_pin * m_pin)[..., :, None],
        ],
        axis=2,
    )  # (B, nb, 7, 3)
    b7 = jnp.concatenate([t_face, t_pin], axis=2)  # (B, nb, 7)
    # One batched 7x7 factorization per block serves all three uses:
    # minimum-norm particular solution, null-space projector, and the
    # least-squares multipliers. (A 3x3 eigendecomposition formulation is
    # mathematically cleaner but jnp.linalg.eigh lowers to an iterative
    # algorithm that is catastrophically slow for 32k tiny matrices on TPU.)
    CC = jnp.einsum("bnkr,bnlr->bnkl", C, C, precision=_PRECISION)
    ridge = 1e-7 * jnp.maximum(
        jnp.einsum("bnkk->bn", CC)[..., None, None], 1e-2
    )
    # unrolled elimination: XLA's batched LU custom call for these
    # (B, nb, 7, 7) blocks profiled at ~57 ms/solve on TPU (serialized
    # pivoting) vs ~0.1 ms unrolled
    CCi = inv_small_unrolled(CC + ridge * jnp.eye(7, dtype=dtype))

    def cc_solve(v):  # (B, nb, 7) -> (B, nb, 7)
        return jnp.einsum("bnkl,bnl->bnk", CCi, v)

    # min-norm particular solution x_p = C'(CC')^+ b
    x_p_b = jnp.einsum("bnkr,bnk->bnr", C, cc_solve(b7))
    x_p = x_p_b.reshape(B, nz)
    # orthogonal projector onto the active rows' null space, per block:
    # Pi = I - C'(CC')^+ C  (B, nb, 3, 3)
    Pi_b = eye3 - jnp.einsum(
        "bnkr,bnkl,bnls->bnrs", C, CCi, C, precision=_PRECISION
    )
    if reduced:
        Pi = jnp.zeros((B, nz, nz), dtype).at[
            :, blk_cols[:, :, None], blk_cols[:, None, :]
        ].set(Pi_b)
        # reduced problem over the null space: x = x_p + Pi w with
        # (Pi P Pi + (I - Pi)) d = -Pi (q + P x_p). H carries the
        # objective's own curvature only — no penalty term, so the flat
        # R-scale curvature survives f32 formation; Jacobi scaling then
        # normalizes the stiff/flat disparity for the f32 Cholesky.
        PPi = jnp.matmul(o.p_dense, Pi, precision=setup_precision)
        H = jnp.matmul(Pi, PPi, precision=setup_precision) + (eye - Pi)
        rhs_r = -jnp.einsum(
            "bnm,bn->bm", Pi,
            o.q + jnp.einsum(
                "bnm,bm->bn", o.p_dense, x_p, precision=_PRECISION
            ),
            precision=_PRECISION,
        )
        djr = jnp.sqrt(jnp.maximum(
            jnp.diagonal(H, axis1=-2, axis2=-1), 1e-30
        ))
        Hn = H / (djr[:, :, None] * djr[:, None, :]) + 1e-6 * eye
        # XLA's batched Cholesky + 1-RHS triangular solves serialize ~32 ms
        # of column steps at B=512; the fused Pallas SPD inverse
        # (ops/chol_kernel.py) runs the factorization in VMEM (see the
        # factorize note for the rejected XLA-recursion alternative)
        if nz % 32 == 0:
            from convex_mpc_tpu.ops.chol_kernel import spd_inverse

            Hinv = spd_inverse(Hn)
        else:
            Lr = jnp.linalg.cholesky(Hn)
            Lri = jax.scipy.linalg.solve_triangular(
                Lr, jnp.broadcast_to(eye, Lr.shape), lower=True
            )
            Hinv = jnp.matmul(
                jnp.swapaxes(Lri, -1, -2), Lri, precision=setup_precision
            )
        zr = jnp.einsum(
            "bnm,bn->bm", Hinv, rhs_r / djr, precision=_PRECISION
        ) / djr
        x_pol = x_p + jnp.einsum("bmn,bn->bm", Pi, zr, precision=_PRECISION)
    else:
        # snap: keep the iterate's null-space component — block-local 3x3
        # projector application only
        x_pol = x_p + jnp.einsum(
            "bnrs,bns->bnr", Pi_b, o.x_it.reshape(B, nb, 3),
            precision=_PRECISION,
        ).reshape(B, nz)
    # block least-squares multipliers of the active rows
    g_b = -(
        jnp.einsum("bnm,bm->bn", o.p_dense, x_pol, precision=_PRECISION)
        + o.q
    ).reshape(B, nb, 3)
    y7 = cc_solve(jnp.einsum("bnkr,bnr->bnk", C, g_b))
    stat = jnp.einsum("bnkr,bnk->bnr", C, y7) - g_b
    stat_res = jnp.max(jnp.abs(stat), axis=(-2, -1))
    y_rows = jnp.concatenate(
        [y7[..., :4].reshape(B, m_fr), y7[..., 4:].reshape(B, nz)],
        axis=-1,
    ) * (a_lo | a_hi)
    return x_pol, y_rows, stat_res


def _polish_refine(o: PolishOps, a_lo, a_hi, x_r, y_r):
    """Add violated rows, drop wrong-sign-multiplier rows."""
    fin_l = jnp.isfinite(o.l)
    fin_u = jnp.isfinite(o.u)
    ax_r = _polish_ax(o, x_r)
    add_lo = fin_l & (o.l - ax_r > 1e-6)
    add_hi = fin_u & (ax_r - o.u > 1e-6)
    ysc = 1e-3 * jnp.maximum(jnp.max(jnp.abs(y_r), -1, keepdims=True), 1.0)
    drop = (a_lo & ~o.is_eq & (y_r > ysc)) | (a_hi & (y_r < -ysc))
    n_lo = (a_lo | add_lo) & ~drop
    n_hi = ((a_hi | add_hi) & ~drop) & ~n_lo
    return n_lo, n_hi


def _polish_certify(o: PolishOps, a_lo, a_hi, x_c, y_c, stat_c, eps_abs):
    feas = (_polish_viol(o, x_c) <= o.v_x + eps_abs) & jnp.isfinite(x_c).all(-1)
    ysc = 1e-3 * jnp.maximum(jnp.max(jnp.abs(y_c), -1, keepdims=True), 1.0)
    sign_ok = jnp.where(
        a_lo & ~o.is_eq, y_c <= ysc, jnp.where(a_hi, y_c >= -ysc, True)
    ).all(-1)
    # unsupported-gradient tolerance: generous vs the f32 P matvec noise
    # floor (~1e-3), sharp vs a mis-pinned stiff direction
    stat_ok = stat_c <= 0.05 * jnp.maximum(1.0, jnp.max(jnp.abs(o.q), -1))
    o_ok = _polish_obj(o, x_c) <= o.o_x + 1e-3 * jnp.abs(o.o_x) + 1e-6
    return feas & sign_ok & stat_ok & o_ok


def _polish_ladder(o: PolishOps, act_lo, act_hi, polish_rounds: int,
                   eps_abs, setup_precision):
    """The reduced-solve refinement ladder (round 1 + gated rounds 2-3).

    Later rounds only execute when some scenario in THIS (possibly
    compacted) batch is still uncertified — each round carries a batched
    nz x nz formation + SPD inverse, which is most of the polish cost.
    Returns (x_pol_raw, ok_pol).
    """
    B = o.q.shape[0]
    big = jnp.asarray(jnp.finfo(o.q.dtype).max, o.q.dtype)

    def round_body(rcarry):
        a_lo, a_hi, x_pol_raw, best_obj, ok_pol, r = rcarry
        x_k, y_k, st_k = _polish_core(
            o, a_lo, a_hi, reduced=True, setup_precision=setup_precision
        )
        ok_k = _polish_certify(o, a_lo, a_hi, x_k, y_k, st_k, eps_abs)
        o_k = jnp.where(ok_k, _polish_obj(o, x_k), big)
        # freeze a scenario's certified point: later rounds (running only
        # because some OTHER scenario is uncertified) must not swap an
        # already-certified result
        take = (o_k < best_obj) & ~ok_pol
        x_pol_raw = jnp.where(take[:, None], x_k, x_pol_raw)
        best_obj = jnp.where(take, o_k, best_obj)
        ok_pol = ok_pol | ok_k
        a_lo, a_hi = _polish_refine(o, a_lo, a_hi, x_k, y_k)
        return (a_lo, a_hi, x_pol_raw, best_obj, ok_pol, r + 1)

    def round_cond(rcarry):
        ok_pol, r = rcarry[4], rcarry[5]
        return (r < polish_rounds) & ~ok_pol.all()

    rcarry0 = (
        act_lo, act_hi, jnp.zeros_like(o.x_it), jnp.full((B,), big),
        jnp.zeros((B,), bool), jnp.asarray(0, jnp.int32),
    )
    rcarry = round_body(rcarry0)
    out = lax.while_loop(round_cond, round_body, rcarry)
    return out[2], out[4]


# ---------------------------------------------------------------------------
# Batch-global adaptive solver (OSQP-faithful refactor-on-demand)
# ---------------------------------------------------------------------------
@partial(
    jax.jit,
    static_argnames=(
        "max_iter", "check_every", "scaling_iters", "box_tail",
        "rho_refactor_ratio", "setup_precision", "debug", "polish",
        "polish_rounds", "use_pallas", "nu", "small_force_scale",
        "return_polished", "snap_first", "polish_cap_div",
    ),
)
def solve_adaptive(
    qp: QpData,
    state: AdmmState,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    eq_scale: float = 1e3,
    eps_abs: float = 1e-4,
    eps_rel: float = 1e-4,
    max_iter: int = 600,
    check_every: int = 25,
    scaling_iters: int = 5,  # reference OSQP setting (centroidal_mpc.py:33 'scaling': 5); each deferred sweep
    # re-streams the (B, nz, nz) Hessian for its norms (~1.8 ms/sweep at B=512)
    box_tail: int = 0,
    rho_refactor_ratio: float = 5.0,
    stall_tol: float = 0.02,
    stall_dual_cap: float = 2.5,
    rho_accept_max: float = 5e-4,
    setup_precision=lax.Precision.HIGHEST,
    debug: bool = False,
    polish: bool = True,
    polish_rounds: int = 3,
    use_pallas: bool = False,
    nu: int = 12,
    small_force_scale: float = 50.0,
    return_polished: bool = True,
    snap_first: bool = False,
    polish_cap_div: int = 4,
) -> AdmmSolution:
    """Batched adaptive-iteration ADMM with refactor-on-demand.

    This is the faithful TPU re-architecture of OSQP's runtime behavior
    (reference centroidal_mpc.py:20-38: check_termination=10,
    adaptive_rho_interval=25, scaled termination, refactor on rho update),
    replacing the fixed segment schedule of :func:`solve`:

    - **every leaf of ``qp``/``state`` carries a leading batch axis** and the
      whole batch runs as ONE program (no vmap): per-scenario convergence
      flags and rho live inside the loop, while the *control flow* is
      batch-global;
    - a ``lax.while_loop`` runs ``check_every``-iteration chunks until every
      scenario meets the OSQP scaled termination criterion (or ``max_iter``):
      steady-state cycles stop early, hard gait-transition cycles escalate to
      the full budget — per-cycle parity spikes get iterations instead of a
      fixed truncation;
    - rho adapts per scenario from the residual ratio each chunk, but the KKT
      matrix is only re-factorized when some unconverged scenario's rho moved
      by more than ``rho_refactor_ratio`` — a scalar predicate, so the
      ``lax.cond`` refactorization is genuinely skipped (not select-ed) in
      the common all-stable case. A warm-started trot cycle typically pays
      ONE factorization; the old path paid ``segments`` of them always.

    Requires a dense-P QP with ``box_tail`` identity rows (the condensed
    MPC form). Returns per-scenario :class:`AdmmSolution` with batch axes.
    """
    with jax.default_matmul_precision("highest"):
        dtype = qp.q.dtype
        B, nz = qp.q.shape
        m = qp.l.shape[-1]
        m_fr = m - box_tail
        assert box_tail > 0, "solve_adaptive requires the condensed box_tail form"
        nb = nz // 3
        assert m_fr == 4 * nb, "condensed layout: 4 pyramid rows per block"
        assert nz % nu == 0, "nu must divide nz (per-step force block width)"
        first_step_vars = nu  # applied-force block: the first horizon step
        face_rows = jnp.asarray(np.arange(m_fr).reshape(nb, 4))
        blk_cols = jnp.asarray(np.arange(nz).reshape(nb, 3))

        # block form of the constraint matrix: the condensed QP's friction
        # rows are local to one (step, leg) 3-force block and the box rows
        # are the identity — the dense (B, m, nz) matrix is never needed.
        # Every pass over it (Ruiz sweeps, iteration matvecs) was pure HBM
        # traffic for ~1% nonzeros (measured: Ruiz alone ~54 ms of a ~95 ms
        # solve at B = 512).
        if hasattr(qp, "C"):  # condensed.StructuredQp
            C_raw = qp.C  # (B, nb, 4, 3)
            box_diag_raw = jnp.ones((B, nz), dtype)
        else:  # dense QpData: extract the blocks once
            # CONTRACT: a dense A must carry the condensed block structure —
            # friction rows local to one (step, leg) 3-column block followed
            # by a diagonal box tail. Off-block nonzeros are NOT represented
            # (all matvecs below run blockwise) and would be silently
            # dropped; under debug=True the reconstruction is checked.
            C_raw = qp.A[:, face_rows[:, :, None], blk_cols[:, None, :]]
            box_diag_raw = jnp.diagonal(qp.A[:, m_fr:, :], axis1=-2, axis2=-1)
            if debug:
                A_rec = (
                    jnp.zeros_like(qp.A)
                    .at[:, face_rows[:, :, None], blk_cols[:, None, :]]
                    .set(C_raw)
                )
                A_rec = A_rec.at[:, m_fr:, :].set(
                    box_diag_raw[:, :, None] * jnp.eye(nz, dtype=dtype)
                )
                off_block = jnp.max(jnp.abs(qp.A - A_rec))
                jax.debug.print(
                    "solve_adaptive dense-A off-block max |a| = {v} "
                    "(must be 0: off-block entries are dropped)",
                    v=off_block,
                )

        s = ruiz_equilibrate_structured(
            qp.p_dense, qp.q, C_raw, box_diag_raw, qp.l, qp.u,
            iters=scaling_iters,
        )
        is_eq = (qp.u - qp.l) < 1e-9  # (B, m)

        # warm start into scaled space
        x = state.x / s.d
        z = jnp.clip(state.z * s.e, s.l, s.u)
        y = s.c[:, None] * state.y / s.e
        rho = jnp.clip(state.rho, 1e-6, 1e6)  # (B,)
        if rho.ndim == 0:
            rho = jnp.full((B,), rho, dtype)

        box_diag = s.box_diag  # (B, nz)
        w_vec = jnp.where(is_eq, eq_scale, 1.0).astype(dtype)  # (B, m)
        w_fr, w_box = w_vec[:, :m_fr], w_vec[:, m_fr:]

        def bmm(a, b):
            return jnp.matmul(a, b, precision=setup_precision)

        P_mat = s.p_dense + sigma * jnp.eye(nz, dtype=dtype)
        # K = A_fr' W A_fr is block-diagonal: one (3, 3) Gram per block
        K_blocks = jnp.einsum(
            "bnfr,bnf,bnfs->bnrs", s.C, w_fr.reshape(B, nb, 4), s.C,
            precision=setup_precision,
        )  # (B, nb, 3, 3)
        # materialize once as dense block-diagonal (broadcast against the
        # block identity — no scatter)
        eye_nb = jnp.eye(nb, dtype=dtype)
        K = (
            K_blocks[:, :, :, None, :] * eye_nb[None, :, None, :, None]
        ).reshape(B, nz, nz)
        K_box_diag = w_box * box_diag * box_diag  # (B, nz)
        eye = jnp.eye(nz, dtype=dtype)

        def factorize(rho):
            M = (
                P_mat
                + rho[:, None, None] * K
                + (rho[:, None] * K_box_diag)[:, :, None] * eye
            )
            if nz % 32 == 0:
                # fused Pallas SPD inverse: XLA's batched Cholesky
                # serializes ~nz HLO column steps (~19 ms at B=512 for
                # nz=192 on v5e) and the 192-RHS triangular solve another
                # ~13 ms; the kernel runs the blocked factorization as
                # straight-line VPU/MXU code in VMEM. In-program xplane
                # cost ~10.7 ms/call at B=512 (64 serial grid programs,
                # tools/solve_profile.py); an explicit-inverse block-Schur
                # recursion in pure XLA (ops/linalg.py
                # spd_inverse_recursive) was adjudicated OUT: on the
                # attractor-rho KKT its f32 Schur formation drives deep
                # leaf blocks indefinite (resid 7e10 vs the kernel's
                # 1.4e-4) and the stabilized variant needs ~as many small
                # ops as the kernel. Falls back to the XLA path off-TPU
                # (ops/chol_kernel.py), equivalence in tests/test_kernels.
                from convex_mpc_tpu.ops.chol_kernel import spd_inverse

                return spd_inverse(M)
            L = jnp.linalg.cholesky(M)
            Linv = jax.scipy.linalg.solve_triangular(
                L, jnp.broadcast_to(eye, L.shape), lower=True
            )
            return bmm(jnp.swapaxes(Linv, -1, -2), Linv)

        def mv_A(v):  # (B, nz) -> (B, m)
            fr = jnp.einsum(
                "bnfr,bnr->bnf", s.C, v.reshape(B, nb, 3), precision=_PRECISION
            ).reshape(B, m_fr)
            return jnp.concatenate([fr, box_diag * v], axis=-1)

        def mv_AT(w):  # (B, m) -> (B, nz)
            fr = jnp.einsum(
                "bnfr,bnf->bnr", s.C, w[:, :m_fr].reshape(B, nb, 4),
                precision=_PRECISION,
            ).reshape(B, nz)
            return fr + box_diag * w[:, m_fr:]

        def residuals(x, z, y):
            """OSQP scaled-space termination quantities, per scenario."""
            ax = mv_A(x)
            aty = mv_AT(y)
            px = jnp.einsum("bnm,bm->bn", s.p_dense, x, precision=_PRECISION)
            rp = jnp.max(jnp.abs(ax - z), axis=-1)
            ep = eps_abs + eps_rel * jnp.maximum(
                jnp.max(jnp.abs(ax), axis=-1), jnp.max(jnp.abs(z), axis=-1)
            )
            rd = jnp.max(jnp.abs(px + s.q + aty), axis=-1)
            ed = eps_abs + eps_rel * jnp.maximum(
                jnp.max(jnp.abs(px), axis=-1),
                jnp.maximum(jnp.max(jnp.abs(aty), axis=-1), jnp.max(jnp.abs(s.q), axis=-1)),
            )
            return rp / ep, rd / ed

        def chunk_iters(x, z, y, rho, Minv):
            # Iteration engine: the VMEM-resident structured Pallas kernel
            # (use_pallas=True) or its XLA twin. The two are BITWISE
            # identical (every reduction is an unrolled block sum or a
            # fixed binary tree — see mpc/kernels.py and
            # tests/test_kernels.py), so the choice is pure performance:
            # under XLA each iteration re-streams Minv (B, nz, nz) from
            # HBM (~75 MB/iter at B=512) — bandwidth-bound; the kernel
            # pins it in VMEM for the whole chunk (~3.5x faster chunks).
            from convex_mpc_tpu.mpc import kernels

            rho_vec = rho[:, None] * w_vec
            fn = (
                kernels.admm_iterations_structured
                if use_pallas
                else kernels.admm_iterations_structured_xla
            )
            return fn(
                s.C, box_diag, Minv, s.q, s.l, s.u, rho_vec, x, z, y,
                iters=check_every, sigma=sigma, alpha=alpha,
            )

        Minv0 = factorize(rho)
        conv0 = jnp.zeros((B,), bool)
        conv_iter0 = jnp.full((B,), -1, jnp.int32)
        n_chunks = max_iter // check_every
        # rho policy: for this QP family (flat R = 1e-5 force directions) the
        # dual residual dr(rho) has a minimum near rho ~ 1e-4 in the scaled
        # space, and the classic OSQP ratio sqrt(pr/dr) says "shrink" on BOTH
        # sides of it — following it overshoots into a regime where ADMM
        # stalls (measured: dr sticks at ~6x tolerance at rho = 1e-6). So:
        # descend rho (ratio-guided, at most 10x per step) at most
        # `max_adapts` times, one step every `adapt_stride` chunks — the same
        # 100-iteration settling period per rho as the proven fixed-segment
        # path (adapting every chunk was measured to degrade both
        # convergence and closed-loop margins: ADMM needs ~100 iterations at
        # a rho before its residuals are informative). The bounded descent
        # cannot overshoot the optimum. After the adaptation window: pure
        # iteration escalation to max_iter.
        adapt_stride = max(1, 100 // check_every)
        max_adapts = 3

        def attempt_polish(x, z, y, rho, Minv, step):
            """Certified accept: snap-first, compacted reduced ladder.

            The QP's force directions are nearly flat (R = 1e-5 vs Q ~
            1-50), so ADMM residual criteria admit iterates several % from
            the optimum in those directions; mask-edge warm starts were
            measured accepting 2-7% off (tools/loop_parity.py). OSQP-style:
            identify active rows from THRESHOLDED dual signs (complementary
            slackness), then solve the active-set subproblem exactly and
            certify (machinery: _polish_core / _polish_certify /
            _polish_ladder at module level; design notes there).

            Round-5 structure (the round-4 adjudication's "per-scenario
            compaction path"):

            1. SNAP proposal for the whole batch — keep the iterate's
               null-space component, snap only the active-row component
               (block-local arithmetic, no nz x nz work). Accepted only for
               SETTLED iterates (step <= stall_tol): the f32 certificate
               cannot see flat-direction displacement, and mask-edge warm
               starts certify while 2-7% off (tests/test_polish_regression
               — cycle 151); settled iterates measure 0.02-0.06% off
               (round 3), CLOSER than the reduced solve's f32 noise floor.
            2. Scenarios failing the snap are COMPACTED into a B/4-capacity
               sub-batch and only that sub-batch pays the reduced ladder
               (batched nz x nz formation + SPD inverse — most of the old
               batch-global polish's ~18 ms at B = 512). In steady trot a
               handful of movers fail snap; at transitions (count > B/4)
               the full-batch ladder runs as before.

            Failed scenarios keep iterating — identification is what they
            lack, and it needs iterations. The reference runs OSQP with
            polish disabled (centroidal_mpc.py:20-38); this recovers the
            capability at batch scale.
            """
            fin_l = jnp.isfinite(qp.l)
            fin_u = jnp.isfinite(qp.u)
            y_raw = s.e * y / s.c[:, None]
            y_tol = 1e-3 * jnp.max(jnp.abs(y_raw), axis=-1, keepdims=True)
            act_lo = fin_l & (is_eq | (y_raw < -y_tol))
            act_hi = fin_u & (~act_lo) & (y_raw > y_tol)
            x_it_raw = s.d * x

            ops = PolishOps(
                p_dense=qp.p_dense, q=qp.q, l=qp.l, u=qp.u, is_eq=is_eq,
                C=C_raw, box=box_diag_raw, x_it=x_it_raw,
                o_x=jnp.zeros((B,), dtype), v_x=jnp.zeros((B,), dtype),
            )
            ops = ops._replace(
                o_x=_polish_obj(ops, x_it_raw), v_x=_polish_viol(ops, x_it_raw)
            )

            # stage 1 (OPTIONAL, default OFF — adjudicated round 5): snap
            # proposal + compacted ladder. Measured on warm steady trot at
            # B = 512: >B/2 scenarios are still moving (step > stall_tol)
            # at the first accept attempt, so the compact branch never
            # triggers and the snap adds ~5 ms of dead weight
            # (54.5 vs 49.3 ms/solve). Kept behind the flag for
            # de-synchronized workloads where a minority needs the ladder.
            if snap_first:
                x_sn, y_sn, st_sn = _polish_core(
                    ops, act_lo, act_hi, reduced=False,
                    setup_precision=setup_precision,
                )
                ok_sn = _polish_certify(
                    ops, act_lo, act_hi, x_sn, y_sn, st_sn, eps_abs
                ) & (step <= stall_tol)
                x_base = jnp.where(ok_sn[:, None], x_sn, jnp.zeros_like(x_sn))
            else:
                ok_sn = jnp.zeros((B,), bool)
                x_base = jnp.zeros_like(x_it_raw)
            need = ~ok_sn
            count = jnp.sum(need)

            # stage 2: reduced ladder for snap failures only
            cap = B if (B < 16 or not snap_first) else max(
                B // polish_cap_div, 8
            )

            def no_ladder():
                return x_base, ok_sn

            def full_ladder():
                x_f, ok_f = _polish_ladder(
                    ops, act_lo, act_hi, polish_rounds, eps_abs,
                    setup_precision,
                )
                x_o = jnp.where(ok_sn[:, None], x_base, x_f)
                return x_o, ok_sn | ok_f

            if cap >= B:
                x_pol_raw, ok_pol = lax.cond(
                    count > 0, full_ladder, no_ladder
                )
            else:
                def compact_ladder():
                    idx = jnp.nonzero(need, size=cap, fill_value=0)[0]
                    valid = jnp.arange(cap) < count
                    o_sub = jax.tree.map(lambda a: a[idx], ops)
                    x_s, ok_s = _polish_ladder(
                        o_sub, act_lo[idx], act_hi[idx], polish_rounds,
                        eps_abs, setup_precision,
                    )
                    take = valid & ok_s
                    # duplicate gather indices (the fill rows) all write the
                    # unchanged base value -> deterministic scatter
                    x_o = x_base.at[idx].set(
                        jnp.where(take[:, None], x_s, x_base[idx])
                    )
                    ok = ok_sn.at[idx].set(ok_sn[idx] | take)
                    return x_o, ok

                x_pol_raw, ok_pol = lax.cond(
                    count > 0,
                    lambda: lax.cond(
                        count <= cap, compact_ladder, full_ladder
                    ),
                    no_ladder,
                )
            if debug:
                jax.debug.print(
                    "polish: snap_ok {ns}/{b} viol x={vx} pol={vp} ok={ok}",
                    ns=ok_sn.sum(), b=B, vx=ops.v_x,
                    vp=_polish_viol(ops, x_pol_raw), ok=ok_pol,
                )
            # buffer carries the SCALED-space point (selected pre-unscale)
            x_pol = x_pol_raw / s.d
            return x_pol, ok_pol

        def cond(carry):
            converged, it = carry[5], carry[7]
            return (~converged).any() & (it < n_chunks)

        def body(carry):
            (x, z, y, rho, Minv, converged, conv_iter, it, n_fact, d_count,
             x_pol_buf, pol_ok) = carry
            x_prev = x
            x, z, y = chunk_iters(x, z, y, rho, Minv)
            pr, dr = residuals(x, z, y)
            # Fixed-point stall exit: the dual criterion sits at the f32
            # dense-P matvec noise floor (dr wanders ~0.8-6x tolerance while
            # forces are already ~1e-4 relative — 100x inside the 2% parity
            # budget). When the primal criterion holds, the dual residual is
            # within a small multiple of its floor, and the UNSCALED iterate
            # moved < stall_tol Newtons over a whole chunk, further
            # iterations change nothing physical: accept. The dual cap
            # matters: a far-from-optimal iterate can also crawl slowly
            # (small step) during hard command transitions, but its dual
            # residual is then large — without the cap, those premature
            # accepts measurably degrade closed-loop margins.
            # Accepts are gated on rho having reached the attractor region
            # (<= rho_accept_max): in the flat R = 1e-5 force directions a
            # gradient-based tolerance admits x displacements of
            # ~residual/curvature, and at rho >= 1e-3 the OSQP criterion was
            # measured to fire at points still ~2% from the f64 optimum.
            # Warm-started cycles carry rho ~ 1e-4 and may accept from the
            # first chunk; cold walks may not accept until the descent
            # reaches the accurate regime.
            rho_ok = rho <= rho_accept_max
            step = jnp.max(jnp.abs(s.d * (x - x_prev)), axis=-1)
            stalled = (
                rho_ok & (pr <= 1.0) & (dr <= stall_dual_cap) & (step <= stall_tol)
            )
            if debug:
                jax.debug.print(
                    "chunk {it} rho={rho} pr={pr} dr={dr} step={st}",
                    it=it, rho=rho, pr=pr, dr=dr, st=step,
                )
            # EVERY accept path is gated on rho <= rho_accept_max — including
            # polish proposals. An earlier build let a full residual pass
            # propose at any rho with the polish certificate as the
            # acceptance authority; closed-loop parity then measured 3-4%
            # force errors certified OK at rho = 1.2e-3/1.6e-3: above the
            # attractor no f32 certificate can see flat-direction
            # displacement (the stationarity residual scales with the same
            # ~2e-5 curvature that makes the directions flat, and the
            # polish's reduced f32 solve loses that curvature to matmul
            # noise when forming Pi P Pi). High-rho convergence is instead
            # handled by the gate descent below.
            newly = (rho_ok & (pr <= 1.0) & (dr <= 1.0)) | stalled
            iters_done = (it + 1) * check_every
            conv_iter = jnp.where(newly & (conv_iter < 0), iters_done, conv_iter)
            converged = converged | newly
            if polish:
                # acceptance is certified by a successful polish: attempt
                # it when the whole batch meets the residual criterion (or
                # at the iteration cap); scenarios whose polish is rejected
                # (active set not yet identified) un-converge and keep
                # iterating — identification is what they lack, and it
                # needs iterations, not tighter residual tests.
                at_cap = (it + 1) >= n_chunks
                want_pol = converged.all() | at_cap
                x_pol_buf, pol_ok = lax.cond(
                    want_pol,
                    lambda: attempt_polish(x, z, y, rho, Minv, step),
                    lambda: (x_pol_buf, pol_ok),
                )
                # SMALL-FORCE scenarios additionally require a settled
                # iterate (step <= stall_tol over the last chunk): on
                # low-force QPs (stop-phase ringdown, near-flight) the
                # polish certificate's f32 stationarity test cannot see
                # ~1 N of flat-direction displacement, which is >2% of a
                # ~35 N force scale — measured: such cycles certified at
                # 75-100 iters sat 1-2.8% from the f64 optimum while the
                # stall path reached 0.02-0.06% by iterating to ~375 at
                # the same rho (tools/loop_parity capture, round 3).
                # Normal-scale cycles (>= 50 N, where 1 N is deep inside
                # the 2% budget) accept on the certificate alone — the
                # unconditional step gate was measured to double steady-
                # state iteration counts for accuracy beyond need. The
                # scale is the FIRST-STEP force block's (the only forces
                # applied to the plant and the ones parity measures): a
                # stop-phase cycle can command ~34 N now with >100 N later
                # in the horizon, and it is the 34 N that must be accurate.
                # The block width is the per-step force count from the
                # layout (4 legs x 3 = 12 for Go2); the threshold scales
                # with the robot (small_force_scale ~ m g / 3 for Go2).
                x_scale = jnp.max(
                    jnp.abs((s.d * x)[:, :first_step_vars]), axis=-1
                )
                step_ok = (step <= stall_tol) | (x_scale >= small_force_scale)
                converged = converged & jnp.where(
                    want_pol & ~at_cap, pol_ok & step_ok, True
                )
                # a rejected polish un-converges the scenario: clear its
                # provisional conv_iter so reported iteration counts are
                # certified accepts, not first proposals (a cap-out then
                # reports max_iter, not the chunk of its earliest proposal)
                conv_iter = jnp.where(converged, conv_iter, -1)
            # descend at the 100-iteration boundaries only, at most
            # max_adapts times: 0.1 * (0.1)^3 bounds the walk at 1e-4 (the
            # measured dr(rho) optimum) — no overshoot is possible, so no
            # revert logic is needed (an earlier revert-on-worse-dr guard
            # mis-froze rho from noisy boundary comparisons on cold starts)
            at_boundary = ((it + 1) % adapt_stride) == 0
            can = (~converged) & at_boundary & (d_count < max_adapts)
            ratio = jnp.sqrt(pr / jnp.maximum(dr, 1e-12))
            rho_desc = jnp.clip(rho * jnp.clip(ratio, 0.1, 1.0), 1e-6, 1e6)
            moved = jnp.abs(jnp.log(rho_desc / rho)) > jnp.log(rho_refactor_ratio)
            descend = can & moved
            d_count = d_count + descend.astype(jnp.int32)
            rho_new = jnp.where(descend, rho_desc, rho)
            # rescue: a warm-started scenario stuck at attractor-region rho
            # without converging (bad warm start after a contact-mask edge)
            # restarts the full cold walk from 0.1 mid-solve — measured to
            # recover like a cold start (~350 more iters) where plain
            # escalation at the carried rho ran to the cap
            rescue = (
                ((it + 1) == rescue_chunk)
                & (~converged) & (rho <= rho_accept_max)
            )
            rho_new = jnp.where(rescue, 0.1, rho_new)
            d_count = jnp.where(rescue, 0, d_count)
            # gate descent: residuals passing at rho above the accept gate
            # mean the scenario is converged *for that rho* but measurably
            # untrustworthy in the flat force directions — walk rho one
            # decade per chunk into the accept region instead of accepting
            # (the flat-direction trap) or blocking forever (a post-rescue
            # solve converged at rho = 0.1 was measured to sit at dr = 0.05
            # for 14 chunks and cap out, blocked by the gate alone). The
            # residual pass itself is the evidence the walk is safe, and it
            # does not consume the ratio-walk descent budget.
            gate_desc = (~converged) & (pr <= 1.0) & (dr <= 1.0) & (~rho_ok)
            rho_new = jnp.where(
                gate_desc, jnp.maximum(rho * 0.1, 1e-4), rho_new
            )
            do_refactor = (descend | rescue | gate_desc).any()
            Minv = lax.cond(do_refactor, lambda: factorize(rho_new), lambda: Minv)
            n_fact = n_fact + do_refactor.astype(jnp.int32)
            return (x, z, y, rho_new, Minv, converged, conv_iter, it + 1, n_fact,
                    d_count, x_pol_buf, pol_ok)

        # cold starts (rho = 0.1 > rho_accept_max) have the full descent
        # budget; warm carries start with it too but typically accept first
        d_count0 = jnp.zeros((B,), jnp.int32)
        rescue_chunk = 10  # 250 iters: past any warm-accept grace period
        carry = (
            x, z, y, rho, Minv0, conv0, conv_iter0, jnp.asarray(0, jnp.int32),
            jnp.asarray(1, jnp.int32), d_count0,
            jnp.zeros_like(x), jnp.zeros((B,), bool),
        )
        out = lax.while_loop(cond, body, carry)
        x, z, y, rho, _, converged, conv_iter, it, n_fact = out[:9]
        x_pol_buf, pol_ok = out[10], out[11]

        if polish and return_polished:
            # use the certified polished point where one was accepted; a
            # cap-out whose final polish attempt failed keeps its ADMM
            # iterate (best effort, counted as non-converged).
            # NOTE (round 3, measured on captured stop-phase QPs): with
            # accepts now gated on a settled iterate, the raw iterate is
            # often closer to the f64 optimum (0.02-0.06%) than the
            # polished point (~0.9-1.1%, the f32 Pi-P-Pi formation noise
            # floor); both are far inside the 2% budget. The two choices
            # are adjudicated by closed-loop ENSEMBLE pass-rates over
            # perturbed initial states (tools/ensemble_cert.py,
            # return_polished=False returns the raw iterate), not by any
            # single trajectory — single 10 s rolls of the raw-weights
            # schedule are chaos-marginal at t=8 (PARITY.md) and a one-roll
            # landing is noise, not signal.
            x = jnp.where(pol_ok[:, None], x_pol_buf, x)

        # unscale + raw residual report (blockwise raw matvecs)
        x_out = s.d * x
        y_out = s.e * y / s.c[:, None]
        z_out = z / s.e
        ax = jnp.concatenate(
            [
                jnp.einsum(
                    "bnfr,bnr->bnf", C_raw, x_out.reshape(B, nb, 3),
                    precision=_PRECISION,
                ).reshape(B, m_fr),
                box_diag_raw * x_out,
            ],
            axis=-1,
        )
        # primal report: |Ax - z| for ADMM iterates (OSQP semantics); for
        # scenarios whose RETURNED point is the certified polished one, z is
        # the pre-polish iterate's split variable and |Ax_pol - z| is a
        # meaningless cross-point gap (measured up to ~15 N on fast accepts)
        # — report the actual bound violation of the returned point instead.
        viol_ret = jnp.max(
            jnp.maximum(qp.l - ax, ax - qp.u).clip(min=0.0), axis=-1
        )
        use_pol_point = (
            (pol_ok if (polish and return_polished) else jnp.zeros((B,), bool))
        )
        rp = jnp.where(
            use_pol_point, viol_ret, jnp.max(jnp.abs(ax - z_out), axis=-1)
        )
        px = jnp.einsum("bnm,bm->bn", qp.p_dense, x_out, precision=_PRECISION)
        aty = (
            jnp.einsum(
                "bnfr,bnf->bnr", C_raw, y_out[:, :m_fr].reshape(B, nb, 4),
                precision=_PRECISION,
            ).reshape(B, nz)
            + box_diag_raw * y_out[:, m_fr:]
        )
        rd = jnp.max(jnp.abs(px + qp.q + aty), axis=-1)
        iters = jnp.where(conv_iter < 0, it * check_every, conv_iter)
        return AdmmSolution(
            x=x_out,
            y=y_out,
            prim_res=rp,
            dual_res=rd,
            iters=iters,
            state=AdmmState(x=x_out, z=z_out, y=y_out, rho=rho),
        )
