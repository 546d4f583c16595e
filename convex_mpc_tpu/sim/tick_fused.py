"""Fused 1 kHz tick window: the whole 20-tick inner loop as ONE TPU program.

The batched engine cycle is op-issue-bound in its tick phase: 20 sequential
ticks of 18-dof arithmetic emit ~hundreds of small XLA ops each at B = 512
(~25 ms of the ~90 ms cycle, >80x off speed-of-light — STATUS.md roofline).
This module re-expresses the ENTIRE tick — ``dynamics.tick_model`` +
``leg.compute_torques`` + ``physics.step`` + the estimator/yaw/log glue of
``engine._run_ticks`` (engine.py tick()) — in a batch-LAST ("structure of
arrays") layout and runs the full window inside one Pallas kernel:

- every tensor is ``(small dims..., n)`` with the scenario batch ``n`` on
  the TPU lane axis, so each vector instruction processes 128 scenarios at
  full lane utilization (batch-first layouts put the tiny (3, 18)-ish
  trailing dims on the (8, 128) tile: ~5% utilization);
- all per-robot state stays in VMEM across the 20 ticks — HBM sees one
  block load and one store per window instead of ~2000 op round-trips;
- Jacobians are never concatenated to (3, 18): they stay split in the
  free-flyer block structure [L | A | Q] (base-linear = base_R for every
  point, base-angular, own-leg joint columns), so the mass matrix is built
  DIRECTLY in the arrow form the downstream solves consume (dense 6x6 base
  block, per-leg 6x3 couplings and 3x3 diagonals, exact cross-leg zeros —
  see ops.linalg.ArrowFactor) and the 18-wide padding/concat traffic of the
  dense layout never exists;
- velocity-product accelerations (bias) and foot J̇q̇ come from ONE
  ``jax.linearize`` tangent of the velocity map, exactly like
  ``dynamics.tick_model``.

The same ``_tick_soa`` body also runs as a plain-XLA ``lax.scan`` twin
(:func:`run_window_soa_xla`) used by the CPU equivalence tests against the
reference per-scenario path (``engine._run_ticks`` vmapped) — the Pallas
wrapper adds only layout transposes and block plumbing around it.

Capability: the reference's 1 kHz loop body
(/root/reference/convex_mpc/test_MPC.py:160-236 — mj_step + LegController
at sim dt 1e-3), batched. Numerical semantics match ``engine._run_ticks``
at f32 reassociation level (asserted in tests/test_tick_fused.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_G = -9.81  # world gravity z (models.dynamics.GRAVITY)


# ---------------------------------------------------------------------------
# batch-last small-matrix algebra (component axes lead, lane batch last)
# ---------------------------------------------------------------------------


def _m33(A, B):
    """(..., 3, 3, n) @ (..., 3, 3, n): sum_k A[i,k] B[k,j]."""
    return jnp.sum(A[..., :, :, None, :] * B[..., None, :, :, :], axis=-3)


def _m33T(A, B):
    """A' @ B: sum_k A[k,i] B[k,j]."""
    return jnp.sum(A[..., :, :, None, :] * B[..., :, None, :, :], axis=-4)


def _m3v(A, v):
    """(..., 3, 3, n) @ (..., 3, n)."""
    return jnp.sum(A * v[..., None, :, :], axis=-2)


def _m3Tv(A, v):
    """A' @ v: sum_k A[k,i] v[k]."""
    return jnp.sum(A * v[..., :, None, :], axis=-3)


def _t3(A):
    """Transpose of the trailing (3, 3) matrix dims, built from sublane
    slices + stack (Mosaic rejects swapaxes that move the sublane dim)."""
    return jnp.stack([A[..., :, j, :] for j in range(3)], axis=-3)


def _split43(x):
    """(12, n) -> (4, 3, n) without a sublane-splitting reshape (Mosaic
    rejects the shape cast: 'infer-vector-layout: unsupported shape cast')."""
    return jnp.stack([x[3 * l:3 * l + 3] for l in range(4)], axis=0)


def _merge43(x):
    """(4, 3, n) -> (12, n) (inverse of :func:`_split43`)."""
    return jnp.concatenate([x[l] for l in range(4)], axis=0)


def _cross(a, b):
    """(..., 3, n) x (..., 3, n)."""
    ax, ay, az = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    bx, by, bz = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-2
    )


def _eye3(n_like):
    """(3, 3, 1) identity built from iota in its FINAL shape (no captured
    array constants, no post-hoc reshape — both break Mosaic layouts)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (3, 3, 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (3, 3, 1), 1)
    return (r == c).astype(_F32)


def _inv3(A):
    """Adjugate 3x3 inverse, (..., 3, 3, n) (ops.linalg.inv3 transposed)."""
    a, b, c = A[..., 0, 0, :], A[..., 0, 1, :], A[..., 0, 2, :]
    d, e, f = A[..., 1, 0, :], A[..., 1, 1, :], A[..., 1, 2, :]
    g, h, i = A[..., 2, 0, :], A[..., 2, 1, :], A[..., 2, 2, :]
    r0 = jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-2)
    r1 = jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-2)
    r2 = jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-2)
    adj = jnp.stack([r0, r1, r2], axis=-3)
    det = a * r0[..., 0, :] + b * r1[..., 0, :] + c * r2[..., 0, :]
    return adj / det[..., None, None, :]


def _quat_to_R(quat):
    """xyzw (4, n) -> (3, 3, n) (ops.rotations.quat_to_rotmat transposed)."""
    x, y, z, w = quat[0], quat[1], quat[2], quat[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-2),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-2),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-2),
        ],
        axis=-3,
    )


def _atan(x):
    """Branchless Cephes atanf: |err| ~ 2 ulp f32 (Mosaic has no atan2/atan
    primitive — NotImplementedError at lowering — so the tick kernel carries
    its own; accuracy asserted against jnp.arctan2 in tests/test_tick_fused).
    """
    ax = jnp.abs(x)
    big = ax > 2.414213562373095  # tan(3pi/8)
    mid = ax > 0.4142135623730951  # tan(pi/8)
    # range reduction (applied branchlessly; division guards keep it finite)
    xr = jnp.where(
        big, -1.0 / jnp.where(ax > 1e-30, ax, 1.0),
        jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax),
    )
    y0 = jnp.where(big, jnp.pi / 2, jnp.where(mid, jnp.pi / 4, 0.0))
    z = xr * xr
    p = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    )
    r = y0 + p * z * xr + xr
    return jnp.where(x < 0, -r, r)


def _atan2(y, x):
    """Branchless f32 atan2 built on :func:`_atan` (quadrant-corrected)."""
    safe_x = jnp.where(jnp.abs(x) > 1e-30, x, 1e-30)
    base = _atan(y / safe_x)
    sgn_y = jnp.where(y < 0, -1.0, 1.0)
    res = jnp.where(x > 0, base, base + sgn_y * jnp.pi)
    # x == 0 exactly: +-pi/2 by sign of y
    res = jnp.where(jnp.abs(x) <= 1e-30, sgn_y * (jnp.pi / 2), res)
    return res


def _rpy_from_R(R):
    """(3, 3, n) -> roll, pitch, yaw (each (n,)) — rotations.rotmat_to_rpy."""
    pitch = _atan2(-R[2, 0], jnp.sqrt(R[0, 0] * R[0, 0] + R[1, 0] * R[1, 0]))
    yaw = _atan2(R[1, 0], R[0, 0])
    roll = _atan2(R[2, 1], R[2, 2])
    return roll, pitch, yaw


def _quat_mul(q1, q2):
    """Hamilton product, xyzw (4, n)."""
    x1, y1, z1, w1 = q1[0], q1[1], q1[2], q1[3]
    x2, y2, z2, w2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=0,
    )


def _quat_integrate(quat, omega_body, dt):
    """(4, n), (3, n) -> (4, n) — rotations.quat_integrate transposed."""
    ang = omega_body * dt
    theta = jnp.sqrt(jnp.sum(ang * ang, axis=0))
    half = 0.5 * theta
    small = theta < 1e-8
    k = jnp.where(small, 0.5, jnp.sin(half) / jnp.where(small, 1.0, theta))
    dq = jnp.concatenate([ang * k[None], jnp.cos(half)[None]], axis=0)
    out = _quat_mul(quat, dq)
    return out / jnp.sqrt(jnp.sum(out * out, axis=0))[None]


def _rot_about(axis: int, a):
    """Elementary rotation about x (axis=0) or y (axis=1): (..., n) -> (..., 3, 3, n)."""
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    if axis == 0:
        rows = [[o, z, z], [z, c, -s], [z, s, c]]
    else:
        rows = [[c, z, s], [z, o, z], [-s, z, c]]
    return jnp.stack(
        [jnp.stack(r, axis=-2) for r in rows], axis=-3
    )


# ---------------------------------------------------------------------------
# constants plumbing (arrays must be kernel INPUTS, not captured constants)
# ---------------------------------------------------------------------------


class TickConsts(NamedTuple):
    """Model constants PRE-SHAPED for the SoA tick (no batch axis).

    Every array already carries the exact unit dims its broadcast sites
    need: Mosaic cannot re-layout a loaded ref (reshapes / dim insertions
    that move the lane or sublane dim are 'unsupported shape cast'), so the
    host does all shaping up front.
    """

    hip_pos: jnp.ndarray  # (4, 3, 1)
    thigh_pos: jnp.ndarray  # (4, 3, 1)
    calf_pos: jnp.ndarray  # (3, 1)
    foot_in_calf: jnp.ndarray  # (3, 1)
    hip_off_x: jnp.ndarray  # (4, 1) hip-offset x components
    hip_off_y: jnp.ndarray  # (4, 1)
    m_trunk: jnp.ndarray  # (1, 1)
    m_legs5: jnp.ndarray  # (4, 3, 1, 1, 1)  [hip, thigh, calf] per leg
    m_legs4: jnp.ndarray  # (4, 3, 1, 1)
    com_trunk: jnp.ndarray  # (3, 1)
    com_legs: jnp.ndarray  # (4, 3, 3, 1) body-frame link COMs
    I_trunk: jnp.ndarray  # (3, 3, 1)
    I_legs: jnp.ndarray  # (4, 3, 3, 3, 1)
    total_mass: jnp.ndarray  # (1, 1)
    lim: jnp.ndarray  # (4, 3, 1) per-joint torque limits (incl. tau_max cap)


def make_consts(dyn, tau_max: float) -> TickConsts:
    """Build TickConsts from a Go2Dyn (dyn leaves may be traced)."""
    from convex_mpc_tpu.models.go2_params import DEFAULT_PARAMS as _gp

    kin = dyn.kin
    lim = jnp.minimum(
        jnp.tile(
            jnp.array(
                [_gp.hip_torque_max, _gp.thigh_torque_max, _gp.calf_torque_max],
                _F32,
            ),
            4,
        ).reshape(4, 3),
        tau_max,
    )
    m_legs = dyn.mass[1:].reshape(4, 3).astype(_F32)
    return TickConsts(
        hip_pos=kin.hip_pos.astype(_F32)[:, :, None],
        thigh_pos=kin.thigh_pos.astype(_F32)[:, :, None],
        calf_pos=kin.calf_pos.astype(_F32)[:, None],
        foot_in_calf=kin.foot_pos.astype(_F32)[:, None],
        hip_off_x=kin.hip_offset.astype(_F32)[:, 0:1],
        hip_off_y=kin.hip_offset.astype(_F32)[:, 1:2],
        m_trunk=dyn.mass[0].reshape(1, 1).astype(_F32),
        m_legs5=m_legs[:, :, None, None, None],
        m_legs4=m_legs[:, :, None, None],
        com_trunk=dyn.com[0].astype(_F32)[:, None],
        com_legs=dyn.com[1:].reshape(4, 3, 3).astype(_F32)[..., None],
        I_trunk=dyn.inertia[0].astype(_F32)[..., None],
        I_legs=dyn.inertia[1:].reshape(4, 3, 3, 3).astype(_F32)[..., None],
        total_mass=dyn.total_mass.reshape(1, 1).astype(_F32),
        lim=lim[..., None],
    )


class TickBatch(NamedTuple):
    """Per-scenario window inputs, batch-LAST (lane axis n)."""

    u0: jnp.ndarray  # (4, 3, n) MPC stance forces (first horizon step)
    pos_des: jnp.ndarray  # (3, n) COM position target
    vel_des: jnp.ndarray  # (3, n) commanded world velocity
    yaw_rate: jnp.ndarray  # (n,)
    g_period: jnp.ndarray  # (n,)
    g_duty: jnp.ndarray  # (n,)
    g_phase: jnp.ndarray  # (4, n)
    g_swing_h: jnp.ndarray  # (n,)
    g_td_z: jnp.ndarray  # (n,)
    c_kn: jnp.ndarray  # (n,)
    c_dn: jnp.ndarray  # (n,)
    c_mu: jnp.ndarray  # (n,)
    c_vtol: jnp.ndarray  # (n,)
    c_gz: jnp.ndarray  # (n,)
    c_fr: jnp.ndarray  # (n,)
    c_arm: jnp.ndarray  # (n,)
    c_jd: jnp.ndarray  # (n,)


class TickCarry(NamedTuple):
    """Loop-carried per-scenario state, batch-LAST."""

    q: jnp.ndarray  # (19, n)
    dq: jnp.ndarray  # (18, n)
    last_mask: jnp.ndarray  # (4, n) int32
    takeoff_time: jnp.ndarray  # (4, n)
    swing_p0: jnp.ndarray  # (4, 3, n)
    swing_td: jnp.ndarray  # (4, 3, n)
    yaw_cont: jnp.ndarray  # (n,)
    yaw_prev: jnp.ndarray  # (n,)
    vfilt: jnp.ndarray  # (6, n)
    t: jnp.ndarray  # (n,)


# ---------------------------------------------------------------------------
# the SoA model: FK + split Jacobians + arrow-block M + bias (one linearize)
# ---------------------------------------------------------------------------


def _fk_soa(cst: TickConsts, q):
    """FK of the 13-body tree, batch-last. Returns a dict of pose quantities.

    Mirrors kinematics.fk: leg chains are three elementary rotations (URDF
    joint origins carry no rotation), joint axes are hip-x / thigh-y /
    calf-y in the parent frame.
    """
    base_p = q[0:3]  # (3, n)
    base_R = _quat_to_R(q[3:7])  # (3, 3, n)
    qj = _split43(q[7:19])  # (4, 3joints, n)

    hp = cst.hip_pos  # (4, 3, 1)
    tp = cst.thigh_pos
    cp = cst.calf_pos  # (3, 1)
    fp = cst.foot_in_calf

    R_hip = _m33(base_R[None], _rot_about(0, qj[:, 0]))  # (4, 3, 3, n)
    p_hip = base_p[None] + _m3v(base_R[None], hp)  # (4, 3, n)
    R_thigh = _m33(R_hip, _rot_about(1, qj[:, 1]))
    p_thigh = p_hip + _m3v(R_hip, tp)
    R_calf = _m33(R_thigh, _rot_about(1, qj[:, 2]))
    p_calf = p_thigh + _m3v(R_thigh, cp[None])
    foot_w = p_calf + _m3v(R_calf, fp[None])  # (4, 3, n)

    R_legs = jnp.stack([R_hip, R_thigh, R_calf], axis=1)  # (4, 3b, 3, 3, n)
    p_legs = jnp.stack([p_hip, p_thigh, p_calf], axis=1)  # (4, 3b, 3, n)

    n1 = base_p.shape[-1]
    ax_hip = jnp.broadcast_to(base_R[:, 0], (4, 3, n1))  # base x column
    ax_thigh = R_hip[..., :, 1, :]  # hip y column
    ax_calf = R_thigh[..., :, 1, :]
    axes = jnp.stack([ax_hip, ax_thigh, ax_calf], axis=1)  # (4, 3j, 3, n)
    origins = p_legs  # joint j origin == body j frame origin (4, 3j, 3, n)
    return dict(
        base_p=base_p, base_R=base_R, R_legs=R_legs, p_legs=p_legs,
        foot_w=foot_w, axes=axes, origins=origins,
    )


def _anc_mask():
    """(3 bodies, 1, 3 joints, 1) lower-triangular ancestor mask, iota-built
    in its broadcast-ready shape (Pallas kernels cannot capture array
    constants, and reshaping a (3, 3) would be a Mosaic layout cast)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (3, 1, 3, 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (3, 1, 3, 1), 2)
    return (c <= r).astype(_F32)


def _split_jacobians(fkd, cst: TickConsts):
    """Split point/angular Jacobians for all body COMs + feet, batch-last.

    For a point p on body b the world point Jacobian in the pin free-flyer
    convention is [base_R | -hat(p - base_p) base_R | joint cols]; the
    base-linear block is base_R for EVERY point, so only A (base-angular)
    and Q (own-leg joint columns) are materialized per point. Angular
    Jacobians are [0 | base_R | W].
    """
    base_p, base_R = fkd["base_p"], fkd["base_R"]
    axes, origins = fkd["axes"], fkd["origins"]

    # body COM world positions
    com_tr = base_p + _m3v(base_R, cst.com_trunk)  # (3, n)
    com_legs = fkd["p_legs"] + _m3v(fkd["R_legs"], cst.com_legs)
    # (4, 3b, 3, n)

    def A_of(pts):  # base-angular block: cols_j = cross(R[:, j], p - base_p)
        rel = pts - base_p  # broadcast (..., 3, n)
        cols = [
            _cross(jnp.broadcast_to(base_R[..., :, j, :], rel.shape), rel)
            for j in range(3)
        ]
        return jnp.stack(cols, axis=-2)  # (..., 3, 3, n)

    def Q_of(pts):  # own-leg joint cols: cols_j = cross(axis_j, p - o_j)
        # pts (4, [3b,] 3, n); axes/origins (4, 3j, 3, n). Built by explicit
        # stack over j (a swapaxes through the sublane dim is a Mosaic
        # layout cast).
        if pts.ndim == 4:  # body COMs: broadcast over the 3b body dim
            cols = [
                _cross(
                    jnp.broadcast_to(axes[:, j][:, None], pts.shape),
                    pts - origins[:, j][:, None],
                )
                for j in range(3)
            ]
        else:  # feet
            cols = [
                _cross(jnp.broadcast_to(axes[:, j], pts.shape),
                       pts - origins[:, j])
                for j in range(3)
            ]
        return jnp.stack(cols, axis=-2)  # (..., 3, 3j, n)

    anc = _anc_mask()  # (3b, 1, 3j, 1)
    A_tr = A_of(com_tr)  # (3, 3, n)
    A_legs = A_of(com_legs)  # (4, 3b, 3, 3, n)
    A_feet = A_of(fkd["foot_w"])  # (4, 3, 3, n)
    Q_legs = Q_of(com_legs) * anc  # (4, 3b, 3, 3j, n)
    Q_feet = Q_of(fkd["foot_w"])  # (4, 3, 3j, n) (feet see all 3 joints)
    # angular joint cols W: axis_j masked to ancestors; axes_T[l, i, j, n]
    axes_T = jnp.stack([axes[:, j] for j in range(3)], axis=-2)  # (4, 3, 3j, n)
    W_legs = jnp.broadcast_to(axes_T[:, None] * anc, Q_legs.shape)

    # world inertias
    I_tr = _m33(_m33(base_R, cst.I_trunk), _t3(base_R))
    I_legs = _m33(
        _m33(fkd["R_legs"], cst.I_legs), _t3(fkd["R_legs"])
    )  # (4, 3b, 3, 3, n)

    return dict(
        com_tr=com_tr, com_legs=com_legs, A_tr=A_tr, A_legs=A_legs,
        A_feet=A_feet, Q_legs=Q_legs, Q_feet=Q_feet, W_legs=W_legs,
        I_tr=I_tr, I_legs=I_legs,
    )


def _qdot_soa(q, dq):
    """(19, n) time derivative of q (kinematics.qdot transposed)."""
    R = _quat_to_R(q[3:7])
    pos_dot = _m3v(R, dq[0:3])
    zeros1 = jnp.zeros_like(q[0:1])
    omega_quat = jnp.concatenate([dq[3:6], zeros1], axis=0)
    quat_dot = 0.5 * _quat_mul(q[3:7], omega_quat)
    return jnp.concatenate([pos_dot, quat_dot, dq[6:18]], axis=0)


class ModelSoa(NamedTuple):
    """Everything one tick consumes, arrow-block form, batch-last."""

    # arrow-block mass matrix (no armature)
    Mtt: jnp.ndarray  # (3, 3, n) == m_tot * I
    Mtr: jnp.ndarray  # (3, 3, n)
    Mrr: jnp.ndarray  # (3, 3, n)
    Bt: jnp.ndarray  # (4, 3, 3, n) base-lin x leg-joint couplings
    Br: jnp.ndarray  # (4, 3, 3, n) base-ang x leg-joint couplings
    Dl: jnp.ndarray  # (4, 3, 3, n) per-leg joint blocks
    # bias rows
    bias_t: jnp.ndarray  # (3, n)
    bias_r: jnp.ndarray  # (3, n)
    bias_j: jnp.ndarray  # (4, 3, n)
    # foot jacobian split blocks (base-lin block is base_R)
    A_feet: jnp.ndarray  # (4, 3, 3, n)
    Q_feet: jnp.ndarray  # (4, 3, 3, n)
    foot_pos: jnp.ndarray  # (4, 3, n)
    foot_vel: jnp.ndarray  # (4, 3, n)
    jdot_qd: jnp.ndarray  # (4, 3, n)
    com: jnp.ndarray  # (3, n)
    vcom: jnp.ndarray  # (3, n)
    base_R: jnp.ndarray  # (3, 3, n)


def _model_soa(cst: TickConsts, q, dq) -> ModelSoa:
    """All per-tick model quantities: one primal pass + one linearize tangent
    (the batch-last twin of dynamics.tick_model)."""
    v, w, qd = dq[0:3], dq[3:6], _split43(dq[6:18])

    def model_fn(qq):
        fkd = _fk_soa(cst, qq)
        sj = _split_jacobians(fkd, cst)
        base_R = fkd["base_R"]
        Rv = _m3v(base_R, v)  # common base-linear contribution
        Rw = _m3v(base_R, w)
        # body velocities: v_b = R v + A_b w + Q_b qd_leg
        v_tr = Rv + _m3v(sj["A_tr"], w)
        v_legs = (
            Rv[None, None]
            + _m3v(sj["A_legs"], w[None, None])
            + _m3v(sj["Q_legs"], qd[:, None])
        )
        w_tr = Rw
        w_legs = Rw[None, None] + _m3v(sj["W_legs"], qd[:, None])
        fv = Rv[None] + _m3v(sj["A_feet"], w[None]) + _m3v(sj["Q_feet"], qd)
        vels = (v_tr, v_legs, w_tr, w_legs, fv)
        return vels, (fkd, sj)

    (vels, extras), lin = jax.linearize(model_fn, q)
    v_tr, v_legs, w_tr, w_legs, fv = vels
    fkd, sj = extras
    (a_tr, a_legs, alpha_tr, alpha_legs, jdot_qd), _ = lin(_qdot_soa(q, dq))

    base_R = fkd["base_R"]
    ml = cst.m_legs5  # (4, 3b, 1, 1, 1)
    ml3 = cst.m_legs4  # (4, 3b, 1, 1) for (4, 3b, 3, n) vector quantities

    # ---- mass matrix, arrow blocks ----
    eye = _eye3(q)
    mtot = cst.total_mass  # (1, 1)
    Mtt = mtot * eye
    # Mtr = R' (m_tr A_tr + sum m A_b)
    SA = cst.m_trunk * sj["A_tr"] + jnp.sum(
        ml * sj["A_legs"], axis=(0, 1)
    )
    Mtr = _m33T(base_R, SA)
    # Mrr = sum m A'A + R' (sum I_b) R
    SI = sj["I_tr"] + jnp.sum(sj["I_legs"], axis=(0, 1))
    Mrr = (
        cst.m_trunk * _m33T(sj["A_tr"], sj["A_tr"])
        + jnp.sum(ml * _m33T(sj["A_legs"], sj["A_legs"]), axis=(0, 1))
        + _m33T(base_R, _m33(SI, base_R))
    )
    # couplings: Bt_l = R' sum_b m Q_b ; Br_l = sum m A'Q + R' sum I W
    SQ = jnp.sum(ml * sj["Q_legs"], axis=1)  # (4, 3, 3, n)
    Bt = _m33T(base_R[None], SQ)
    SIW = jnp.sum(_m33(sj["I_legs"], sj["W_legs"]), axis=1)
    Br = jnp.sum(ml * _m33T(sj["A_legs"], sj["Q_legs"]), axis=1) + _m33T(
        base_R[None], SIW
    )
    # per-leg diagonal: sum m Q'Q + W' I W
    Dl = jnp.sum(
        ml * _m33T(sj["Q_legs"], sj["Q_legs"])
        + _m33T(sj["W_legs"], _m33(sj["I_legs"], sj["W_legs"])),
        axis=1,
    )

    # ---- bias (Newton-Euler, ddq = 0) ----
    grav = jnp.stack(
        [jnp.zeros_like(a_tr[0]), jnp.zeros_like(a_tr[0]),
         jnp.full_like(a_tr[0], _G)],
        axis=0,
    )
    F_tr = cst.m_trunk * (a_tr - grav)
    F_legs = ml3 * (a_legs - grav[None, None])
    Iw_tr = _m3v(sj["I_tr"], w_tr)
    N_tr = _m3v(sj["I_tr"], alpha_tr) + _cross(w_tr, Iw_tr)
    Iw_l = _m3v(sj["I_legs"], w_legs)
    N_legs = _m3v(sj["I_legs"], alpha_legs) + _cross(w_legs, Iw_l)

    SF = F_tr + jnp.sum(F_legs, axis=(0, 1))
    SN = N_tr + jnp.sum(N_legs, axis=(0, 1))
    bias_t = _m3Tv(base_R, SF)
    bias_r = (
        _m3Tv(sj["A_tr"], F_tr)
        + jnp.sum(_m3Tv(sj["A_legs"], F_legs), axis=(0, 1))
        + _m3Tv(base_R, SN)
    )
    bias_j = jnp.sum(
        _m3Tv(sj["Q_legs"], F_legs) + _m3Tv(sj["W_legs"], N_legs), axis=1
    )

    # ---- COM state ----
    com = (
        cst.m_trunk * sj["com_tr"]
        + jnp.sum(ml3 * sj["com_legs"], axis=(0, 1))
    ) / mtot
    vcom = (
        cst.m_trunk * v_tr + jnp.sum(ml3 * v_legs, axis=(0, 1))
    ) / mtot

    return ModelSoa(
        Mtt=Mtt, Mtr=Mtr, Mrr=Mrr, Bt=Bt, Br=Br, Dl=Dl,
        bias_t=bias_t, bias_r=bias_r, bias_j=bias_j,
        A_feet=sj["A_feet"], Q_feet=sj["Q_feet"],
        foot_pos=fkd["foot_w"], foot_vel=fv, jdot_qd=jdot_qd,
        com=com, vcom=vcom, base_R=base_R,
    )


# ---------------------------------------------------------------------------
# arrow factorization / solves on block-form matrices (batch-last)
# ---------------------------------------------------------------------------


class ArrowSoa(NamedTuple):
    itt: jnp.ndarray  # (3, 3, n) S^-1 blocks (S = 6x6 base Schur complement)
    itr: jnp.ndarray
    irr: jnp.ndarray
    Dinv: jnp.ndarray  # (4, 3, 3, n)
    Bt: jnp.ndarray  # (4, 3, 3, n)
    Br: jnp.ndarray
    BDt: jnp.ndarray  # (4, 3, 3, n)  Bt_l Dinv_l
    BDr: jnp.ndarray


def _arrow_factor_soa(Mtt, Mtr, Mrr, Bt, Br, Dl) -> ArrowSoa:
    """Block twin of ops.linalg.arrow_factor + inv6_spd_block."""
    Dinv = _inv3(Dl)
    BDt = _m33(Bt, Dinv)
    BDr = _m33(Br, Dinv)
    Stt = Mtt - jnp.sum(_m33(BDt, _t3(Bt)), axis=0)
    Str = Mtr - jnp.sum(_m33(BDt, _t3(Br)), axis=0)
    Srr = Mrr - jnp.sum(_m33(BDr, _t3(Br)), axis=0)
    # 6x6 SPD inverse via 3x3 Schur (ops.linalg.inv6_spd_block)
    Pi = _inv3(Stt)
    W = _m33(Pi, Str)
    T = Srr - _m33T(Str, W)
    Ti = _inv3(T)
    WTi = _m33(W, Ti)
    itt = Pi + _m33(WTi, _t3(W))
    itr = -WTi
    irr = Ti
    return ArrowSoa(itt=itt, itr=itr, irr=irr, Dinv=Dinv, Bt=Bt, Br=Br,
                    BDt=BDt, BDr=BDr)


def _arrow_solve_vec(fac: ArrowSoa, rt, rr, rj):
    """Solve A x = r, r = (rt (3,n), rr (3,n), rj (4,3,n))."""
    ut = rt - jnp.sum(_m3v(fac.BDt, rj), axis=0)
    ur = rr - jnp.sum(_m3v(fac.BDr, rj), axis=0)
    xt = _m3v(fac.itt, ut) + _m3v(fac.itr, ur)
    xr = _m3Tv(fac.itr, ut) + _m3v(fac.irr, ur)
    xj = _m3v(
        fac.Dinv, rj - _m3Tv(fac.Bt, xt[None]) - _m3Tv(fac.Br, xr[None])
    )
    return xt, xr, xj


def _lambda_feet(fac: ArrowSoa, base_R, A_feet, Q_feet):
    """Per-foot operational-space inertia Lambda = (J M^-1 J')^-1 (4,3,3,n).

    Exploits the per-foot column structure of J': the only nonzero joint
    block of foot f's Jacobian transpose is leg f's own 3x3, so the arrow
    solve runs with 3 RHS columns per foot and only that leg's coupling.
    """
    Lt = _t3(base_R)[None]  # rhs base-lin rows (4, 3, 3, n)
    Lr = _t3(A_feet)
    Lj = _t3(Q_feet)  # (4, 3, 3, n) own-leg rows
    ut = Lt - _m33(fac.BDt, Lj)
    ur = Lr - _m33(fac.BDr, Lj)
    xt = _m33(fac.itt[None], ut) + _m33(fac.itr[None], ur)
    # S^-1 is symmetric => its lower-left 3x3 block is itr'
    xr = _m33T(fac.itr[None], ut) + _m33(fac.irr[None], ur)
    xj = _m33(fac.Dinv, Lj - _m33(_t3(fac.Bt), xt) - _m33(_t3(fac.Br), xr))
    JMJt = (
        _m33(base_R[None], xt) + _m33(A_feet, xr) + _m33(Q_feet, xj)
    )
    return _inv3(JMJt)


# ---------------------------------------------------------------------------
# one tick (exact port of engine._run_ticks tick(); see engine.py)
# ---------------------------------------------------------------------------


def _tick_soa(carry: TickCarry, tb: TickBatch, cst: TickConsts,
              sim_dt: float, alpha: float,
              kp: float = 500.0, kd: float = 200.0,
              ground_z: float = 0.0, foot_radius: float = 0.022,
              early_contact_fz: float = 15.0):
    q, dq = carry.q, carry.dq
    n1 = q.shape[-1]

    base_R_pre = _quat_to_R(q[3:7])
    roll, pitch, yaw_m = _rpy_from_R(base_R_pre)
    # yaw unwrap (rotations.yaw_unwrap_step)
    delta = jnp.mod(yaw_m - carry.yaw_prev + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    yc = carry.yaw_cont + delta
    yp = yaw_m

    md = _model_soa(cst, q, dq)

    # velocity estimator (engine tick: raw6 = [vcom_world, omega_world])
    omega_w = _m3v(md.base_R, dq[3:6])
    raw6 = jnp.concatenate([md.vcom, omega_w], axis=0)
    vfilt = carry.vfilt + alpha * (raw6 - carry.vfilt)
    vcom_filt = vfilt[0:3]

    # ---- leg controller (leg.compute_torques) ----
    t = carry.t
    phases = jnp.mod(tb.g_phase + t[None] / tb.g_period[None], 1.0)
    mask = (phases < tb.g_duty[None]).astype(jnp.int32)  # (4, n)
    edge = mask != carry.last_mask
    takeoff = edge & (mask == 0)

    t_swing = (1.0 - tb.g_duty) * tb.g_period
    t_stance = tb.g_duty * tb.g_period
    big_t = t_swing + 0.5 * t_stance
    pred_time = big_t / 2.0

    # Raibert touchdown for all legs (gait.touchdown_raibert)
    cy, sy = jnp.cos(yc), jnp.sin(yc)
    hip_rel_x = cy[None] * cst.hip_off_x - sy[None] * cst.hip_off_y  # (4, n)
    hip_rel_y = sy[None] * cst.hip_off_x + cy[None] * cst.hip_off_y
    k_v_x = 0.4 * big_t
    k_p_x = 0.1
    k_v_y = 0.2 * big_t
    k_p_y = 0.05
    td_x = (
        q[0][None] + hip_rel_x
        + (tb.vel_des[0] * pred_time)[None]
        + k_p_x * (md.com[0] - tb.pos_des[0])[None]
        + (k_v_x * (vcom_filt[0] - tb.vel_des[0]))[None]
        + (-(tb.yaw_rate * pred_time))[None] * hip_rel_y
    )
    td_y = (
        q[1][None] + hip_rel_y
        + (tb.vel_des[1] * pred_time)[None]
        + k_p_y * (md.com[1] - tb.pos_des[1])[None]
        + (k_v_y * (vcom_filt[1] - tb.vel_des[1]))[None]
        + (tb.yaw_rate * pred_time)[None] * hip_rel_x
    )
    td_z = jnp.broadcast_to(tb.g_td_z[None], td_x.shape)
    td_all = jnp.stack([td_x, td_y, td_z], axis=1)  # (4, 3, n)

    takeoff_time = jnp.where(takeoff, t[None], carry.takeoff_time)
    swing_p0 = jnp.where(takeoff[:, None], md.foot_pos, carry.swing_p0)
    swing_td = jnp.where(takeoff[:, None], td_all, carry.swing_td)

    # min-jerk swing eval (gait.swing_eval, batch-last)
    t_since = t[None] - takeoff_time  # (4, n)
    safe_ts = jnp.where(t_swing > 0, t_swing, 1.0)[None]
    s = jnp.where(t_swing[None] > 0, jnp.clip(t_since / safe_ts, 0.0, 1.0), 1.0)
    s1 = s[:, None]  # (4, 1, n)
    dp = swing_td - swing_p0
    mj = 10 * s1**3 - 15 * s1**4 + 6 * s1**5
    dmj = 30 * s1**2 - 60 * s1**3 + 30 * s1**4
    d2mj = 60 * s1 - 180 * s1**2 + 120 * s1**3
    ts1 = safe_ts[:, None]
    p_des = swing_p0 + dp * mj
    v_des = dp * dmj / ts1
    a_des = dp * d2mj / (ts1 * ts1)
    b_ = 64 * s**3 * (1 - s) ** 3
    db_ = 192 * s**2 * (1 - s) ** 2 * (1 - 2 * s)
    d2b_ = 192 * (
        2 * s * (1 - s) ** 2 * (1 - 2 * s)
        - 2 * s**2 * (1 - s) * (1 - 2 * s)
        - 2 * s**2 * (1 - s) ** 2
    )
    h = tb.g_swing_h[None]
    zeros4 = jnp.zeros_like(b_)

    def zb(x):  # (4, n) z-only bump -> (4, 3, n)
        return jnp.stack([zeros4, zeros4, x], axis=1)

    p_des = p_des + zb(h * b_)
    v_des = v_des + zb(h * db_ / safe_ts)
    a_des = a_des + zb(h * d2b_ / (safe_ts * safe_ts))

    # operational-space feedforward
    fac = _arrow_factor_soa(md.Mtt, md.Mtr, md.Mrr, md.Bt, md.Br, md.Dl)
    lam = _lambda_feet(fac, md.base_R, md.A_feet, md.Q_feet)
    f_ff = _m3v(lam, a_des - md.jdot_qd)
    force_sw = kp * (p_des - md.foot_pos) + kd * (v_des - md.foot_vel) + f_ff

    J_leg = md.Q_feet  # (4, 3, 3, n): own-leg joint block IS the leg Jacobian
    bias_leg = md.bias_j  # (4, 3, n)
    tau_swing = _m3Tv(J_leg, force_sw) + bias_leg
    tau_stance = _m3Tv(J_leg, -tb.u0)

    s_phase = jnp.clip(t_since / safe_ts, 0.0, 1.0)
    touching = md.foot_pos[:, 2] - foot_radius <= ground_z + 1e-3
    early = (mask == 0) & (s_phase > 0.5) & touching
    f_xy = (
        kp * (swing_td[:, 0:2] - md.foot_pos[:, 0:2])
        - kd * md.foot_vel[:, 0:2]
    )
    f_cap = 0.8 * early_contact_fz
    f_norm = jnp.sqrt(jnp.sum(f_xy * f_xy, axis=1, keepdims=True))
    f_xy = f_xy * jnp.minimum(1.0, f_cap / jnp.maximum(f_norm, 1e-6))
    f_early = jnp.concatenate(
        [f_xy, jnp.full_like(f_xy[:, 0:1], -early_contact_fz)], axis=1
    )
    tau_early = _m3Tv(J_leg, f_early)

    in_swing = (mask == 0)[:, None]
    tau = jnp.where(
        early[:, None], tau_early, jnp.where(in_swing, tau_swing, tau_stance)
    )
    tau = jnp.clip(tau, -cst.lim, cst.lim)

    pos_des_log = jnp.where(in_swing, p_des, md.foot_pos)

    x_vec = jnp.concatenate(
        [md.com, jnp.stack([roll, pitch, yc], axis=0), raw6], axis=0
    )  # (12, n)

    # ---- plant step (physics.step, implicit contact damping) ----
    lowest = md.foot_pos[:, 2] - tb.c_fr[None]
    pen = tb.c_gz[None] - lowest
    active = pen > 0.0
    f_spring_z = jnp.where(active, tb.c_kn[None] * pen, 0.0)
    fz_est = jnp.maximum(
        jnp.where(
            active, tb.c_kn[None] * pen - tb.c_dn[None] * md.foot_vel[:, 2], 0.0
        ),
        0.0,
    )
    pushing = fz_est > 0.0
    dn_eff = jnp.where(active & pushing, tb.c_dn[None], 0.0)
    vt_mag = jnp.sqrt(jnp.sum(md.foot_vel[:, 0:2] ** 2, axis=1))
    ct = jnp.where(
        active,
        tb.c_mu[None] * fz_est / jnp.maximum(tb.c_vtol[None], vt_mag),
        0.0,
    )
    f0 = jnp.stack(
        [jnp.zeros_like(f_spring_z), jnp.zeros_like(f_spring_z), f_spring_z],
        axis=1,
    )  # (4, 3, n)
    Cd = jnp.stack([ct, ct, dn_eff], axis=1)  # (4, 3, n) diagonal entries

    v, w, qd = dq[0:3], dq[3:6], _split43(dq[6:18])
    mtot = cst.total_mass  # (1, 1)
    # rhs = (M + diag(arm)) dq + dt (tau_gen - bias + J' f0)
    Jt_f0_t = _m3Tv(md.base_R, jnp.sum(f0, axis=0))
    Jt_f0_r = jnp.sum(_m3Tv(md.A_feet, f0), axis=0)
    Jt_f0_j = _m3Tv(md.Q_feet, f0)  # (4, 3, n)
    Mv_t = mtot * v + _m3v(md.Mtr, w) + jnp.sum(_m3v(md.Bt, qd), axis=0)
    Mv_r = (
        _m3Tv(md.Mtr, v) + _m3v(md.Mrr, w) + jnp.sum(_m3v(md.Br, qd), axis=0)
    )
    Mv_j = (
        _m3Tv(md.Bt, v[None]) + _m3Tv(md.Br, w[None]) + _m3v(md.Dl, qd)
        + tb.c_arm[None] * qd
    )
    rhs_t = Mv_t + sim_dt * (-md.bias_t + Jt_f0_t)
    rhs_r = Mv_r + sim_dt * (-md.bias_r + Jt_f0_r)
    rhs_j = Mv_j + sim_dt * (tau - md.bias_j + Jt_f0_j)

    # A = M + diag(arm) + dt (J' C J + diag(jd)) in arrow blocks
    eye = _eye3(q)
    CR = Cd[:, :, None] * md.base_R[None]  # diag(C) L  (L = base_R)
    CA = Cd[:, :, None] * md.A_feet
    CQ = Cd[:, :, None] * md.Q_feet
    Att = mtot * eye + sim_dt * jnp.sum(_m33T(md.base_R[None], CR), axis=0)
    Atr = md.Mtr + sim_dt * jnp.sum(_m33T(md.base_R[None], CA), axis=0)
    Arr = md.Mrr + sim_dt * jnp.sum(_m33T(md.A_feet, CA), axis=0)
    ABt = md.Bt + sim_dt * _m33T(md.base_R[None], CQ)
    ABr = md.Br + sim_dt * _m33T(md.A_feet, CQ)
    ADl = (
        md.Dl
        + (tb.c_arm[None, None] + sim_dt * tb.c_jd[None, None]) * eye[None]
        + sim_dt * _m33T(md.Q_feet, CQ)
    )
    fac2 = _arrow_factor_soa(Att, Atr, Arr, ABt, ABr, ADl)
    xt, xr, xj = _arrow_solve_vec(fac2, rhs_t, rhs_r, rhs_j)
    dq_new = jnp.concatenate([xt, xr, _merge43(xj)], axis=0)

    pos_new = q[0:3] + sim_dt * _m3v(md.base_R, xt)
    quat_new = _quat_integrate(q[3:7], xr, sim_dt)
    joints_new = q[7:19] + sim_dt * _merge43(xj)
    q_new = jnp.concatenate([pos_new, quat_new, joints_new], axis=0)

    new_carry = TickCarry(
        q=q_new, dq=dq_new, last_mask=mask, takeoff_time=takeoff_time,
        swing_p0=swing_p0, swing_td=swing_td, yaw_cont=yc, yaw_prev=yp,
        vfilt=vfilt, t=t + sim_dt,
    )
    logs = dict(
        x_vec=x_vec, q=q, tau=tau, foot_pos_des=pos_des_log,
        foot_pos_now=md.foot_pos, contact_mask=mask,
    )
    return new_carry, logs


# ---------------------------------------------------------------------------
# plain-XLA twin (tests / non-TPU) and the Pallas kernel
# ---------------------------------------------------------------------------


def run_window_soa_xla(carry: TickCarry, tb: TickBatch, cst: TickConsts,
                       steps: int, sim_dt: float, alpha: float):
    """lax.scan twin of the kernel: identical math, batch-last, no Pallas."""

    def body(c, _):
        c2, logs = _tick_soa(c, tb, cst, sim_dt, alpha)
        return c2, logs

    return jax.lax.scan(body, carry, None, length=steps)


def _window_kernel(*refs, steps: int, sim_dt: float, alpha: float,
                   carry_sq, batch_sq, n_const: int):
    """Pallas body: fori_loop over ticks, VMEM-resident carry, per-tick logs.

    ``carry_sq`` / ``batch_sq`` mark logically-1D fields that were lifted to
    (1, n) at the boundary (Mosaic refs want >= 2 dims); they are squeezed
    back after load and re-lifted on store.
    """
    n_carry, n_batch = len(carry_sq), len(batch_sq)
    carry_refs = refs[:n_carry]
    batch_refs = refs[n_carry:n_carry + n_batch]
    const_refs = refs[n_carry + n_batch:n_carry + n_batch + n_const]
    out_start = n_carry + n_batch + n_const
    out_carry_refs = refs[out_start:out_start + n_carry]
    log_refs = refs[out_start + n_carry:]

    def load(r, sq):
        x = r[:]
        return x[0] if sq else x

    carry = TickCarry(*[load(r, s) for r, s in zip(carry_refs, carry_sq)])
    tb = TickBatch(*[load(r, s) for r, s in zip(batch_refs, batch_sq)])
    cst = TickConsts(*[r[:] for r in const_refs])

    log_keys = ["x_vec", "q", "tau", "foot_pos_des", "foot_pos_now",
                "contact_mask"]

    def body(i, c):
        c2, logs = _tick_soa(c, tb, cst, sim_dt, alpha)
        for ref, k in zip(log_refs, log_keys):
            ref[pl.ds(i, 1)] = logs[k][None]
        return c2

    final = jax.lax.fori_loop(0, steps, body, carry)
    for ref, val, sq in zip(out_carry_refs, final, carry_sq):
        ref[:] = val[None] if sq else val


def run_ticks_fused(
    dyn, gait, contact, cmd, traj, u0,
    plant0, leg0, yaw_cont, yaw_prev, vel_filt0, t0,
    steps_per_mpc: int, tau_max: float, sim_dt: float, vel_filter_hz: float,
    *, block_n: int = 128, interpret: bool | None = None,
):
    """Drop-in replacement for ``jax.vmap(engine._run_ticks)``: same inputs
    (batch-FIRST pytrees), same outputs (final carry + TickLog stacked
    (B, steps, ...)), computed by the fused batch-last Pallas window kernel.
    """
    from convex_mpc_tpu.sim.engine import TickLog

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B = u0.shape[0]
    n_pad = ((B + block_n - 1) // block_n) * block_n
    alpha = 1.0 - math.exp(-2.0 * math.pi * vel_filter_hz * sim_dt)

    def bl(x, extra=0):
        """batch-first (B, s...) -> batch-last (s..., n_pad), edge-padded."""
        x = jnp.asarray(x)
        if n_pad > B:
            pad = jnp.broadcast_to(x[-1:], (n_pad - B,) + x.shape[1:])
            x = jnp.concatenate([x, pad], axis=0)
        return jnp.moveaxis(x, 0, -1)

    carry = TickCarry(
        q=bl(plant0.q).astype(_F32), dq=bl(plant0.dq).astype(_F32),
        last_mask=bl(leg0.last_mask).astype(jnp.int32),
        takeoff_time=bl(leg0.takeoff_time).astype(_F32),
        swing_p0=bl(leg0.swing_p0).astype(_F32),
        swing_td=bl(leg0.swing_td).astype(_F32),
        yaw_cont=bl(yaw_cont).astype(_F32), yaw_prev=bl(yaw_prev).astype(_F32),
        vfilt=bl(vel_filt0).astype(_F32), t=bl(t0).astype(_F32),
    )
    tb = TickBatch(
        u0=bl(u0).astype(_F32),
        pos_des=bl(traj.pos_des_world).astype(_F32),
        vel_des=bl(traj.vel_des_world).astype(_F32),
        yaw_rate=bl(cmd.yaw_rate).astype(_F32),
        g_period=bl(gait.period).astype(_F32),
        g_duty=bl(gait.duty).astype(_F32),
        g_phase=bl(gait.phase_offset).astype(_F32),
        g_swing_h=bl(gait.swing_height).astype(_F32),
        g_td_z=bl(gait.touchdown_z).astype(_F32),
        c_kn=bl(contact.kn).astype(_F32), c_dn=bl(contact.dn).astype(_F32),
        c_mu=bl(contact.mu).astype(_F32), c_vtol=bl(contact.vtol).astype(_F32),
        c_gz=bl(contact.ground_z).astype(_F32),
        c_fr=bl(contact.foot_radius).astype(_F32),
        c_arm=bl(contact.armature).astype(_F32),
        c_jd=bl(contact.joint_damping).astype(_F32),
    )
    cst = make_consts(dyn, tau_max)

    T = steps_per_mpc
    log_shapes = [
        ((T, 12), _F32), ((T, 19), _F32), ((T, 4, 3), _F32),
        ((T, 4, 3), _F32), ((T, 4, 3), _F32), ((T, 4), jnp.int32),
    ]

    grid = (n_pad // block_n,)

    # lift logically-1D (n,) fields to (1, n): Mosaic wants >= 2-dim refs
    carry_sq = tuple(x.ndim == 1 for x in carry)
    batch_sq = tuple(x.ndim == 1 for x in tb)
    lift = lambda x: x[None] if x.ndim == 1 else x  # noqa: E731
    carry_l = [lift(x) for x in carry]
    tb_l = [lift(x) for x in tb]

    def batch_spec(x):
        s = x.shape[:-1]
        nd = len(s)
        return pl.BlockSpec(
            s + (block_n,),
            lambda i, _nd=nd: (0,) * _nd + (i,),
            memory_space=pltpu.VMEM,
        )

    in_specs = (
        [batch_spec(x) for x in carry_l]
        + [batch_spec(x) for x in tb_l]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in cst]
    )
    out_specs = (
        [batch_spec(x) for x in carry_l]
        + [
            pl.BlockSpec(
                shp + (block_n,),
                lambda i, _nd=len(shp): (0,) * _nd + (i,),
                memory_space=pltpu.VMEM,
            )
            for shp, _ in log_shapes
        ]
    )
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in carry_l]
        + [jax.ShapeDtypeStruct(shp + (n_pad,), dt) for shp, dt in log_shapes]
    )

    outs = pl.pallas_call(
        partial(
            _window_kernel, steps=T, sim_dt=sim_dt, alpha=alpha,
            carry_sq=carry_sq, batch_sq=batch_sq, n_const=len(cst),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=int(96 * 1024 * 1024),
        ),
        interpret=interpret,
    )(*carry_l, *tb_l, *cst)

    nc = len(carry)
    fin = TickCarry(
        *[x[0] if sq else x for x, sq in zip(outs[:nc], carry_sq)]
    )
    logs = outs[nc:]

    def bf(x):
        """batch-last -> batch-first, unpadded."""
        return jnp.moveaxis(x, -1, 0)[:B]

    from convex_mpc_tpu.sim.physics import PlantState
    from convex_mpc_tpu.control.leg import LegControlState

    plant = PlantState(q=bf(fin.q), dq=bf(fin.dq))
    leg = LegControlState(
        last_mask=bf(fin.last_mask), takeoff_time=bf(fin.takeoff_time),
        swing_p0=bf(fin.swing_p0), swing_td=bf(fin.swing_td),
    )
    x_vec, q_log, tau, fpd, fpn, cm = logs
    force = jnp.broadcast_to(u0[:, None], (B, T, 4, 3))
    ticks = TickLog(
        x_vec=bf(x_vec), q=bf(q_log), tau=bf(tau), force=force,
        foot_pos_des=bf(fpd), foot_pos_now=bf(fpn), contact_mask=bf(cm),
    )
    return (
        plant, leg, bf(fin.yaw_cont), bf(fin.yaw_prev), bf(fin.vfilt),
        bf(fin.t),
    ), ticks
