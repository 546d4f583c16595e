"""Condensed centroidal MPC QP: states eliminated, forces only.

The reference solves the *non-condensed* 384-variable form (states +
forces, reference centroidal_mpc.py:44) because CasADi/OSQP exploit its
sparsity on CPU. On TPU the better shape is the classic Cheetah-3
condensation: substitute

    x_k = Ad^k x0 + sum_{j<=k} Ad^{k-j} (Bd_j u_j + gd)

into the cost, leaving a dense 12N-variable QP over the forces U alone:

    min_U  1/2 U' P U + q' U
    P = 2 (Su' Qbar Su + Rbar)
    q = 2 Su' Qbar (Sx x0 + Sg - Xref)
    s.t. friction-pyramid rows + per-force box rows (same as mpc.qp)

Advantages:
- half the variables, ~30% of the constraint rows -> the per-solve
  Cholesky factorization and per-iteration matvecs are ~4x cheaper;
- the dynamics hold *exactly* by construction (no equality rows), removing
  the eq-row primal-tolerance sensitivity entirely;
- P and q are built from batched 12x12 matmul chains that map onto the MXU.

The optimal forces are identical to the full form (exact elimination); the
optimal state trajectory is recovered as X = Sx x0 + Su U + Sg. Solved by
the same ``mpc.admm`` solver (it consumes generic ``QpData``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from convex_mpc_tpu.control.srb import SrbDynamics
from convex_mpc_tpu.mpc.qp import QpData, _friction_face_matrix
from convex_mpc_tpu.ops.linalg import ein, mm

NX = 12
NU = 12
FRICTION_FACES = 16

_BIG = jnp.inf


class CondensedAux(NamedTuple):
    """Recovery operators: X = Sx x0 + Su U + Sg."""

    Sx: jnp.ndarray  # (N, 12, 12) = Ad^(k+1)
    Su: jnp.ndarray  # (N, N, 12, 12) block (k, j) = Ad^(k-j) Bd_j (j <= k)
    Sg: jnp.ndarray  # (N, 12)


class StructuredQp(NamedTuple):
    """Condensed QP with the constraint matrix in its analytic block form.

    The condensed constraint matrix is never dense in substance: every
    friction-pyramid row touches only its own (step, leg) 3-force block and
    the box rows are the identity. Carrying the dense (m, nz) matrix makes
    Ruiz equilibration and the iteration matvecs stream ~176 MB per pass at
    B = 512 for data that compresses to ~1.5 MB of block coefficients —
    measured ~54 ms of a ~95 ms adaptive solve. This pytree carries only:

    - ``C``: (nb, 4, 3) friction-face coefficients per (step, leg) block,
      block-major in the same row order as the dense form's friction rows
      (nb = N * 4 legs); supports per-leg/per-step mu;
    - box rows are implicit identity (diagonal 1) — their Ruiz scaling is
      tracked separately inside the solver.

    Row order of ``l``/``u`` matches the dense condensed form exactly:
    [N*16 friction rows, N*12 box rows], so warm-start state (z, y) is
    layout-compatible with :class:`convex_mpc_tpu.mpc.qp.QpData`.
    """

    p_diag: jnp.ndarray  # (nz,)
    q: jnp.ndarray  # (nz,)
    C: jnp.ndarray  # (nb, 4, 3) friction block coefficients
    l: jnp.ndarray  # (m,)
    u: jnp.ndarray  # (m,)
    p_dense: jnp.ndarray  # (nz, nz)


def n_vars(n: int) -> int:
    return n * NU


def n_rows(n: int) -> int:
    return n * FRICTION_FACES + n * NU


def _prediction_operators(dyn: SrbDynamics, n: int) -> CondensedAux:
    """Build Sx, Su, Sg from (Ad, Bd, gd) with a scan over powers of Ad."""
    Ad, Bd, gd = dyn.Ad, dyn.Bd, dyn.gd

    # powers[k] = Ad^k for k = 0..n
    def pow_step(P, _):
        P2 = mm(Ad, P)
        return P2, P2

    eye = jnp.eye(NX, dtype=Ad.dtype)
    _, pows = jax.lax.scan(pow_step, eye, None, length=n)
    powers = jnp.concatenate([eye[None], pows], axis=0)  # (n+1, 12, 12)

    Sx = powers[1:]  # (n, 12, 12): x_k gets Ad^k x0 (k = 1..n)

    # Su[k, j] = Ad^(k-j) Bd_j for j <= k (0-indexed: x_{k+1} row uses
    # Bd[0..k]); build via gather of powers by (k - j)
    idx = np.arange(n)[:, None] - np.arange(n)[None, :]  # (n, n) k - j
    valid = idx >= 0
    idx_c = jnp.asarray(np.where(valid, idx, 0))
    P_kj = powers[idx_c]  # (n, n, 12, 12) = Ad^(k-j)
    Su = ein("kjab,jbc->kjac", P_kj, Bd)
    Su = jnp.where(jnp.asarray(valid)[:, :, None, None], Su, 0.0)

    # Sg[k] = sum_{j<=k} Ad^(k-j) gd
    g_kj = ein("kjab,b->kja", P_kj, gd)
    Sg = jnp.sum(jnp.where(jnp.asarray(valid)[:, :, None], g_kj, 0.0), axis=1)
    return CondensedAux(Sx=Sx, Su=Su, Sg=Sg)


def _friction_and_bounds(contact, mu, fz_min, n, dtype):
    """Friction block coefficients C and bounds (l, u) — shared assembly."""
    # friction block coefficients, block-major over (step, leg):
    # supports scalar mu or per-leg (4,) / per-(step,leg) (n, 4) mu
    mu_a = jnp.asarray(mu, dtype)
    mu_nl = jnp.broadcast_to(mu_a, (n, 4))
    C = _friction_face_matrix(mu_nl).reshape(n * 4, 4, 3)  # (nb, 4, 3)

    stance = jnp.asarray(contact, dtype=bool)
    stance_faces = jnp.repeat(stance.T, 4, axis=1).reshape(-1)
    u_fr = jnp.where(stance_faces, 0.0, _BIG).astype(dtype)
    l_fr = jnp.full((n * FRICTION_FACES,), -_BIG, dtype)

    swing_xyz = jnp.repeat(~stance.T, 3, axis=1).reshape(-1)
    is_fz = jnp.asarray(np.tile([False, False, True] * 4, n))
    stance_fz = (~swing_xyz) & is_fz
    l_box = jnp.where(swing_xyz, 0.0, jnp.where(stance_fz, fz_min, -_BIG)).astype(dtype)
    u_box = jnp.where(swing_xyz, 0.0, _BIG).astype(dtype)

    l = jnp.concatenate([l_fr, l_box])
    u = jnp.concatenate([u_fr, u_box])
    return C, l, u


def _cost_and_bounds(dyn, x0, x_ref, contact, q_diag, r_value, mu, fz_min):
    """Shared assembly: dense cost (P, q), block friction C, bounds (l, u)."""
    n = x_ref.shape[0]
    dtype = x_ref.dtype
    aux = _prediction_operators(dyn, n)

    qd = jnp.asarray(q_diag, dtype)  # per-step state weights
    # free response error: e = Sx x0 + Sg - Xref, (n, 12)
    e = ein("kab,b->ka", aux.Sx, x0) + aux.Sg - x_ref

    # Su viewed as (n*12, n*12) map from U to X
    Su_flat = aux.Su.transpose(0, 2, 1, 3).reshape(n * NX, n * NU)
    QSu = (jnp.tile(qd, n)[:, None]) * Su_flat  # Qbar @ Su
    P = 2.0 * (mm(Su_flat.T, QSu) + r_value * jnp.eye(n * NU, dtype=dtype))
    q = 2.0 * mm(Su_flat.T, (jnp.tile(qd, n) * e.reshape(-1)))

    C, l, u = _friction_and_bounds(contact, mu, fz_min, n, dtype)
    return P, q, C, l, u, aux


def _cost_suffix_recursion(dyn, x0, x_ref, q_diag, r_value):
    """(P, q) by suffix recursions over 12x12 blocks — no Su materialized.

    The naive path builds Su (n, n, 12, 12) by gathering powers of Ad and
    streams it through 5-6 relayout passes ((B, 16, 16, 12, 12) = 75 MB at
    B = 512 — measured ~8 ms of the cycle, 27x off speed-of-light). The
    whole cost is expressible in suffix form with only (n, 12, 12) tensors:

        P[j, i] (j <= i) = 2 Bd_j' (Ad^(i-j))' W_{n-i} Bd_i,
            W_m = sum_{d<m} (Ad^d)' Q Ad^d   (W_{m+1} = Q + Ad' W_m Ad)
        q[j] = 2 Bd_j' s_j,   s_j = Q e_j + Ad' s_{j+1}
        e_k  = f_k - x_ref_k, f_0 = Ad x0 + gd, f_{k+1} = Ad f_k + gd

    Three lax.scans of a few 12x12 matmuls each; the block-row scan emits P
    rows (j, 12, n, 12) directly in the dense layout, so the only (nz, nz)
    tensor ever touched is P itself. Equality with the Su form is asserted
    in tests/test_condensed.py (f32 reassociation tolerance).
    """
    n = x_ref.shape[0]
    dtype = x_ref.dtype
    Ad, Bd, gd = dyn.Ad, dyn.Bd, dyn.gd
    Q = jnp.diag(jnp.asarray(q_diag, dtype))

    # e_k via forward free-response recursion
    def f_step(f, xr):
        f2 = mm(Ad, f) + gd
        return f2, f2 - xr

    _, e = jax.lax.scan(f_step, x0, x_ref)  # (n, 12)

    # s_j via reverse suffix recursion; q_j = 2 Bd_j' s_j
    Qe = ein("ab,kb->ka", Q, e)

    def s_step(s, inp):
        qe_j, Bd_j = inp
        s_j = qe_j + mm(Ad.T, s)
        return s_j, 2.0 * mm(Bd_j.T, s_j)

    _, q_rows = jax.lax.scan(
        s_step, jnp.zeros(NX, dtype), (Qe, Bd), reverse=True
    )
    q = q_rows.reshape(n * NU)

    # W_{n-i} and T_i = W_{n-i} Bd_i, descending i (W grows as i shrinks)
    def w_step(W, Bd_i):
        T_i = mm(W, Bd_i)
        W2 = Q + mm(Ad.T, mm(W, Ad))
        return W2, T_i

    _, T = jax.lax.scan(w_step, Q, Bd, reverse=True)  # (n, 12, 12)

    # block rows of the upper triangle, descending j:
    # V_j[i] = (Ad')^(i-j) T_i for i >= j (zeros below), row_j = Bd_j' V_j
    def row_step(V, inp):
        j_onehot, T_j, Bd_j = inp
        V = ein("ab,iac->ibc", Ad, V)  # Ad' @ each block
        V = V + j_onehot[:, None, None] * T_j[None]
        return V, 2.0 * ein("ab,iac->bic", Bd_j, V)

    eye_n = jnp.eye(n, dtype=dtype)
    V0 = jnp.zeros((n, NX, NU), dtype)
    _, rows = jax.lax.scan(
        row_step, V0, (eye_n, T, Bd), reverse=True
    )  # (n, 12, n, 12) upper-triangle block rows (incl. diagonal)
    U = rows.reshape(n * NU, n * NU)
    # symmetrize: U holds the upper-triangle block rows (zeros below); the
    # diagonal blocks (themselves symmetric: 2 Bd' W Bd) appear in both U
    # and U', so subtract one copy
    blk = jnp.repeat(jnp.arange(n), NU)
    on_diag_blk = blk[:, None] == blk[None, :]
    P = U + U.T - jnp.where(on_diag_blk, U, 0.0)
    P = P + 2.0 * r_value * jnp.eye(n * NU, dtype=dtype)
    return P, q


def build_condensed(
    dyn: SrbDynamics,
    x0: jnp.ndarray,  # (12,)
    x_ref: jnp.ndarray,  # (N, 12)
    contact: jnp.ndarray,  # (4, N)
    q_diag,  # (12,)
    r_value,  # ()
    mu,  # ()
    fz_min,  # ()
) -> tuple[QpData, CondensedAux]:
    """Assemble the condensed QP (dense A) for one scenario. vmap for batches."""
    n = x_ref.shape[0]
    dtype = x_ref.dtype
    P, q, C, l, u, aux = _cost_and_bounds(
        dyn, x0, x_ref, contact, q_diag, r_value, mu, fz_min
    )

    # ---- dense constraint matrix (friction blocks scattered + identity) ----
    leg_of_block = np.arange(n * 4) % 4
    rows = (np.arange(n * 4)[:, None, None] * 4 + np.arange(4)[None, :, None])
    cols = (
        (np.arange(n * 4) // 4)[:, None, None] * NU
        + leg_of_block[:, None, None] * 3
        + np.arange(3)[None, None, :]
    )
    rows = jnp.asarray(np.broadcast_to(rows, (n * 4, 4, 3)))
    cols = jnp.asarray(np.broadcast_to(cols, (n * 4, 4, 3)))
    A_fr = jnp.zeros((n * FRICTION_FACES, n * NU), dtype).at[rows, cols].set(C)
    A = jnp.concatenate([A_fr, jnp.eye(n * NU, dtype=dtype)], axis=0)

    data = QpData(p_diag=jnp.diagonal(P), q=q, A=A, l=l, u=u, p_dense=P)
    return data, aux


def build_condensed_structured(
    dyn: SrbDynamics,
    x0: jnp.ndarray,
    x_ref: jnp.ndarray,
    contact: jnp.ndarray,
    q_diag,
    r_value,
    mu,
    fz_min,
) -> tuple[StructuredQp, CondensedAux]:
    """Assemble the condensed QP in block form (no dense A is ever built).

    Same QP as :func:`build_condensed` — identical cost, bounds, and row
    order — with the constraint matrix kept as the (nb, 4, 3) friction
    blocks + implicit identity box rows (see :class:`StructuredQp`), and
    the cost built by the suffix recursion (:func:`_cost_suffix_recursion`
    — Su is never materialized). ``mu`` may be a scalar, per-leg (4,), or
    per-(step, leg) (N, 4) array. The returned aux is None (the recovery
    operators require Su; use :func:`build_condensed` for diagnostics).
    """
    n = x_ref.shape[0]
    dtype = x_ref.dtype
    P, q = _cost_suffix_recursion(dyn, x0, x_ref, q_diag, r_value)
    C, l, u = _friction_and_bounds(contact, mu, fz_min, n, dtype)
    data = StructuredQp(
        p_diag=jnp.diagonal(P), q=q, C=C, l=l, u=u, p_dense=P
    )
    return data, None


def recover_states(aux: CondensedAux, x0: jnp.ndarray, u_flat: jnp.ndarray) -> jnp.ndarray:
    """X (N, 12) from the optimal forces."""
    n = aux.Sx.shape[0]
    Su_flat = aux.Su.transpose(0, 2, 1, 3).reshape(n * NX, n * NU)
    x = ein("kab,b->ka", aux.Sx, x0) + aux.Sg + mm(Su_flat, u_flat).reshape(n, NX)
    return x
