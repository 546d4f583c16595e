"""Centroidal MPC QP assembly.

Builds the same convex QP as the reference's CasADi/OSQP construction
(reference centroidal_mpc.py), as dense, statically-shaped arrays suitable
for a batched TPU solver. Decision variable z = [X; U]:

    X = [x_1 ... x_N]   N stacked 12-states (states *after* each step)
    U = [u_1 ... u_N]   N stacked 12-vectors of world contact forces

Constraint rows, in order (N = horizon):

    [0,          12N)   dynamics equalities: x_k - Ad x_{k-1} - Bd_k u_k = rhs_k
                        (x_0 term moves to the rhs: rhs_1 = Ad x0 + gd, else gd)
                        (reference centroidal_mpc.py:287-303,255-261)
    [12N,        28N)   friction pyramid, 4 faces per leg per step:
                        +-fx - mu fz <= 0, +-fy - mu fz <= 0 for stance legs,
                        +inf upper bound (inactive) for swing legs
                        (reference centroidal_mpc.py:324-359,264-279)
    [28N,        40N)   force box rows (identity on U): swing legs pinned to 0,
                        stance legs fz >= fz_min
                        (reference centroidal_mpc.py:122-176; the reference
                        passes these as OSQP variable bounds — states carry no
                        bounds so only the U rows are materialized here)

Cost: (1/2) z^T P z + q^T z with P = diag(2*Q ... 2*R ...) constant and
q_x = -2 Q x_ref (reference centroidal_mpc.py:183-200,247-253).

The assembly is fully vectorized (no Python loops over the horizon at trace
time beyond static block placement), and every output is a fixed-shape jnp
array — ``vmap`` over scenarios gives the batch dimension.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from convex_mpc_tpu.control.srb import SrbDynamics

NX = 12
NU = 12
FRICTION_FACES = 16  # 4 faces x 4 legs per step

_BIG = jnp.inf


class QpData(NamedTuple):
    """Dense QP: min 1/2 z'Pz + q'z  s.t.  l <= A z <= u. Batchable pytree.

    P is diagonal for the full-form MPC QP (p_dense None); the condensed
    formulation carries a dense P in ``p_dense`` (p_diag then holds its
    diagonal, used for preconditioning heuristics).
    """

    p_diag: jnp.ndarray  # (nz,) diagonal of P
    q: jnp.ndarray  # (nz,)
    A: jnp.ndarray  # (m, nz)
    l: jnp.ndarray  # (m,)
    u: jnp.ndarray  # (m,)
    p_dense: jnp.ndarray | None = None  # (nz, nz) dense P, if not diagonal


def n_vars(n: int) -> int:
    return n * (NX + NU)


def n_rows(n: int) -> int:
    return n * NX + n * FRICTION_FACES + n * NU


def cost_diag(n: int, q_diag, r_value) -> jnp.ndarray:
    """P diagonal: [2*Q]*N then [2*R]*N (reference centroidal_mpc.py:183-200)."""
    qq = jnp.tile(2.0 * jnp.asarray(q_diag), n)
    rr = jnp.full((n * NU,), 2.0 * r_value)
    return jnp.concatenate([qq, rr])


def _friction_face_matrix(mu) -> jnp.ndarray:
    """(4, 3) single-leg pyramid faces [fx,fy,fz] coefficients.

    Rows: [fx - mu fz, -fx - mu fz, fy - mu fz, -fy - mu fz]
    (reference centroidal_mpc.py:336-356).
    """
    one = jnp.ones_like(mu)
    zero = jnp.zeros_like(mu)
    return jnp.stack(
        [
            jnp.stack([one, zero, -mu], axis=-1),
            jnp.stack([-one, zero, -mu], axis=-1),
            jnp.stack([zero, one, -mu], axis=-1),
            jnp.stack([zero, -one, -mu], axis=-1),
        ],
        axis=-2,
    )


def build_qp(
    dyn: SrbDynamics,
    x0: jnp.ndarray,  # (12,) current centroidal state
    x_ref: jnp.ndarray,  # (N, 12) reference trajectory
    contact: jnp.ndarray,  # (4, N) int/bool, 1 = stance
    q_diag,  # (12,) state cost diagonal Q
    r_value,  # () input cost R scalar
    mu,  # () friction coefficient
    fz_min,  # () minimum stance normal force
) -> QpData:
    """Assemble the dense QP for one scenario. vmap for batches."""
    n = x_ref.shape[0]
    nz = n_vars(n)
    dtype = x_ref.dtype

    # ---- cost ----
    p_diag = cost_diag(n, q_diag, r_value).astype(dtype)
    q_x = (-2.0 * jnp.asarray(q_diag)[None, :] * x_ref).reshape(-1)
    q_vec = jnp.concatenate([q_x, jnp.zeros((n * NU,), dtype)])

    # ---- dynamics equality block [ I - shift(Ad) | -blkdiag(Bd) ] ----
    # X part: I on the diagonal, -Ad on the first block subdiagonal.
    eye_big = jnp.eye(n * NX, dtype=dtype)
    sub = jnp.zeros((n * NX, n * NX), dtype)
    # static placement of -Ad blocks (n-1 of them)
    if n > 1:
        rows = (np.arange(1, n)[:, None, None] * NX + np.arange(NX)[None, :, None])
        cols = (np.arange(0, n - 1)[:, None, None] * NX + np.arange(NX)[None, None, :])
        rows = jnp.asarray(np.broadcast_to(rows, (n - 1, NX, NX)))
        cols = jnp.asarray(np.broadcast_to(cols, (n - 1, NX, NX)))
        sub = sub.at[rows, cols].set(-jnp.broadcast_to(dyn.Ad, (n - 1, NX, NX)).astype(dtype))
    A_eq_x = eye_big + sub

    # U part: -Bd_k on the block diagonal.
    rows = (np.arange(n)[:, None, None] * NX + np.arange(NX)[None, :, None])
    cols = (np.arange(n)[:, None, None] * NU + np.arange(NU)[None, None, :])
    rows = jnp.asarray(np.broadcast_to(rows, (n, NX, NU)))
    cols = jnp.asarray(np.broadcast_to(cols, (n, NX, NU)))
    A_eq_u = jnp.zeros((n * NX, n * NU), dtype).at[rows, cols].set(-dyn.Bd.astype(dtype))

    A_eq = jnp.concatenate([A_eq_x, A_eq_u], axis=1)

    rhs = jnp.tile(dyn.gd.astype(dtype), n).reshape(n, NX)
    rhs = rhs.at[0].add(dyn.Ad.astype(dtype) @ x0.astype(dtype))
    beq = rhs.reshape(-1)

    # ---- friction pyramid rows (static coefficients; bounds gate activity) ----
    faces = _friction_face_matrix(jnp.asarray(mu, dtype))  # (4, 3)
    # per step: block-diag over 4 legs -> (16, 12)
    leg_block = jnp.zeros((FRICTION_FACES, NU), dtype)
    for leg in range(4):
        leg_block = leg_block.at[4 * leg : 4 * leg + 4, 3 * leg : 3 * leg + 3].set(faces)
    rows = (np.arange(n)[:, None, None] * FRICTION_FACES + np.arange(FRICTION_FACES)[None, :, None])
    cols = (np.arange(n)[:, None, None] * NU + np.arange(NU)[None, None, :])
    rows = jnp.asarray(np.broadcast_to(rows, (n, FRICTION_FACES, NU)))
    cols = jnp.asarray(np.broadcast_to(cols, (n, FRICTION_FACES, NU)))
    A_fr_u = jnp.zeros((n * FRICTION_FACES, n * NU), dtype).at[rows, cols].set(
        jnp.broadcast_to(leg_block, (n, FRICTION_FACES, NU))
    )
    A_fr = jnp.concatenate([jnp.zeros((n * FRICTION_FACES, n * NX), dtype), A_fr_u], axis=1)

    stance = jnp.asarray(contact, dtype=bool)  # (4, N)
    # upper bound 0 for stance faces, +inf for swing (reference :264-279)
    stance_faces = jnp.repeat(stance.T, 4, axis=1).reshape(-1)  # (N*16,) k-major, leg, face
    u_fr = jnp.where(stance_faces, 0.0, _BIG).astype(dtype)
    l_fr = jnp.full((n * FRICTION_FACES,), -_BIG, dtype)

    # ---- force box rows (identity on U) ----
    A_box = jnp.concatenate(
        [jnp.zeros((n * NU, n * NX), dtype), jnp.eye(n * NU, dtype=dtype)], axis=1
    )
    # layout per step: [FLx,FLy,FLz, FRx,..., RRz] (reference :137-170)
    swing_xyz = jnp.repeat(~stance.T, 3, axis=1).reshape(-1)  # (N*12,)
    is_fz = jnp.asarray(np.tile([False, False, True] * 4, n))
    stance_fz = (~swing_xyz) & is_fz
    l_box = jnp.where(swing_xyz, 0.0, jnp.where(stance_fz, fz_min, -_BIG)).astype(dtype)
    u_box = jnp.where(swing_xyz, 0.0, _BIG).astype(dtype)

    A = jnp.concatenate([A_eq, A_fr, A_box], axis=0)
    l = jnp.concatenate([beq, l_fr, l_box])
    u = jnp.concatenate([beq, u_fr, u_box])
    return QpData(p_diag=p_diag, q=q_vec, A=A, l=l, u=u)


def split_solution(z: jnp.ndarray, n: int):
    """z (..., nz) -> (X (..., N, 12), U (..., N, 12)).

    X[k] is the optimized state after step k+1; U[k] the force over step k+1.
    U[..., 0, :] is the force command applied by the harness
    (reference test_MPC.py:189-196).
    """
    x = z[..., : n * NX].reshape(*z.shape[:-1], n, NX)
    u = z[..., n * NX :].reshape(*z.shape[:-1], n, NU)
    return x, u
