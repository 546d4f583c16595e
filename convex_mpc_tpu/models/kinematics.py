"""Analytic Go2 kinematics: FK, world Jacobians, and velocities, batched.

This is the TPU-native replacement for the reference's Pinocchio calls
(reference go2_robot_data.py:193-353): forward kinematics of the 13-body tree
(trunk + 4x [hip, thigh, calf]), world-aligned foot positions/velocities,
3x18 point Jacobians in the Pinocchio free-flyer velocity convention, and
J̇·dq via jax.jvp (no hand-derived time-variation propagation).

Conventions:
- q (19,): [base_pos_world(3), base_quat xyzw(4), 12 joint angles] with joint
  order [FL, FR, RL, RR] x [hip(x-axis), thigh(y-axis), calf(y-axis)].
- dq (18,): [v_base BODY(3), omega_base BODY(3), 12 joint velocities]
  (Pinocchio convention, reference go2_robot_data.py:35-47).
- All link frames are parallel to the trunk at zero joint angles (Go2 URDF
  joint origins carry no rotation), so leg FK is three elementary rotations.

All functions are pure jnp over a single configuration; ``vmap`` adds batch
axes. Body index order: 0 = trunk; for leg l in [FL=0, FR=1, RL=2, RR=3]:
hip = 1+3l, thigh = 2+3l, calf = 3+3l.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from convex_mpc_tpu.models.go2_params import Go2Params, DEFAULT_PARAMS
from convex_mpc_tpu.ops.linalg import ein, mm
from convex_mpc_tpu.ops.rotations import hat, quat_to_rotmat, quat_mul

NQ = 19
NV = 18
NUM_BODIES = 13


class Go2Kin(NamedTuple):
    """Baked kinematic constants (plain arrays; safe to close over in jit)."""

    hip_pos: jnp.ndarray  # (4, 3) trunk -> hip joint origin
    thigh_pos: jnp.ndarray  # (4, 3) hip -> thigh joint origin
    calf_pos: jnp.ndarray  # (3,) thigh -> calf joint origin
    foot_pos: jnp.ndarray  # (3,) calf -> foot center
    hip_offset: jnp.ndarray  # (4, 3) trunk -> thigh joint (reference 'hip offset',
    # go2_robot_data.py:147-161)


def build_kin(params: Go2Params = DEFAULT_PARAMS) -> Go2Kin:
    return Go2Kin(
        hip_pos=jnp.asarray(np.stack([params.hip_joint_pos(l) for l in range(4)])),
        thigh_pos=jnp.asarray(np.stack([params.thigh_joint_pos(l) for l in range(4)])),
        calf_pos=jnp.asarray(params.calf_joint_pos()),
        foot_pos=jnp.asarray(params.foot_pos_in_calf()),
        hip_offset=jnp.asarray(np.stack([params.hip_offset(l) for l in range(4)])),
    )


def _rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def _rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


class Poses(NamedTuple):
    """World poses of all bodies + derived joint/foot frames."""

    R: jnp.ndarray  # (13, 3, 3) body orientation, body->world
    p: jnp.ndarray  # (13, 3) body frame origin, world
    foot_w: jnp.ndarray  # (4, 3) foot centers, world
    joint_origin_w: jnp.ndarray  # (12, 3) world position of each revolute joint
    joint_axis_w: jnp.ndarray  # (12, 3) world axis of each revolute joint


def fk(kin: Go2Kin, q: jnp.ndarray) -> Poses:
    """Forward kinematics of the full tree for one configuration."""
    base_p = q[0:3]
    base_R = quat_to_rotmat(q[3:7])
    qj = q[7:19].reshape(4, 3)  # (leg, [hip, thigh, calf])

    # leg chains, batched over the 4 legs
    R_hip = mm(base_R[None], _rot_x(qj[:, 0]))  # (4,3,3)
    p_hip = base_p[None] + ein("ij,lj->li", base_R, kin.hip_pos)
    R_thigh = mm(R_hip, _rot_y(qj[:, 1]))
    p_thigh = p_hip + ein("lij,lj->li", R_hip, kin.thigh_pos)
    R_calf = mm(R_thigh, _rot_y(qj[:, 2]))
    p_calf = p_thigh + ein("lij,j->li", R_thigh, kin.calf_pos)
    foot_w = p_calf + ein("lij,j->li", R_calf, kin.foot_pos)

    # stack bodies: 0 base, then per leg [hip, thigh, calf]
    R = jnp.concatenate(
        [base_R[None], jnp.stack([R_hip, R_thigh, R_calf], axis=1).reshape(12, 3, 3)], axis=0
    )
    p = jnp.concatenate(
        [base_p[None], jnp.stack([p_hip, p_thigh, p_calf], axis=1).reshape(12, 3)], axis=0
    )

    # joint axes in world: hip about parent-x (base frame), thigh about hip-y,
    # calf about thigh-y (axis fixed in the parent of the rotation)
    ax_hip = base_R[:, 0][None].repeat(4, axis=0)  # (4,3) base x-axis
    ax_thigh = R_hip[:, :, 1]  # hip frame y-axis
    ax_calf = R_thigh[:, :, 1]  # thigh frame y-axis
    joint_axis_w = jnp.stack([ax_hip, ax_thigh, ax_calf], axis=1).reshape(12, 3)
    joint_origin_w = jnp.stack([p_hip, p_thigh, p_calf], axis=1).reshape(12, 3)
    return Poses(R=R, p=p, foot_w=foot_w, joint_origin_w=joint_origin_w, joint_axis_w=joint_axis_w)


# body index -> list of ancestor joint indices (within the 12 revolute joints)
_BODY_JOINTS = [[]] + [[3 * l, 3 * l + 1][: k + 1] + ([3 * l + 2] if k == 2 else [])
                       for l in range(4) for k in range(3)]
# e.g. hip body of leg l -> [3l]; thigh -> [3l, 3l+1]; calf -> [3l, 3l+1, 3l+2]
_JOINT_MASK = np.zeros((NUM_BODIES, 12), dtype=bool)
for _b, _js in enumerate(_BODY_JOINTS):
    for _j in _js:
        _JOINT_MASK[_b, _j] = True
_JOINT_MASK_J = jnp.asarray(_JOINT_MASK)


def point_jacobian(poses: Poses, point_w: jnp.ndarray, body: int) -> jnp.ndarray:
    """World-aligned linear Jacobian (3, 18) of a point fixed to `body`.

    Columns follow the pinocchio free-flyer dq convention: [v_body(3),
    omega_body(3), 12 joint vels]; equals Pinocchio's LOCAL_WORLD_ALIGNED
    frame Jacobian rows 0:3 (reference go2_robot_data.py:286-353).
    Delegates to the batched builder so single- and multi-body callers
    share one numeric path.
    """
    return point_jacobians(poses, point_w[None], np.array([body]))[0]


def angular_jacobian(poses: Poses, body: int) -> jnp.ndarray:
    """World angular-velocity Jacobian (3, 18) of `body` (pin dq convention)."""
    return angular_jacobians(poses, np.array([body]))[0]


def point_jacobians(
    poses: Poses, points_w: jnp.ndarray, bodies: np.ndarray
) -> jnp.ndarray:
    """Batched point Jacobians: (K,3) points on static body ids -> (K,3,18).

    One fused graph instead of K stacked subgraphs — the 1 kHz tick calls
    this for all 13 body COMs (mass matrix / bias) and all 4 feet every
    millisecond, so graph size here directly sets the tick's kernel-launch
    overhead. Joint columns are a_j x (p - o_j) masked to the ancestors of
    each body; base columns are [R_base | -hat(p - p_base) R_base].
    """
    base_R = poses.R[0]
    rel = points_w - poses.p[0][None, :]  # (K, 3)
    J_base_lin = jnp.broadcast_to(base_R, (points_w.shape[0], 3, 3))
    J_base_ang = mm(-hat(rel), base_R)  # hat() batches over leading axes
    arm = points_w[:, None, :] - poses.joint_origin_w[None]  # (K, 12, 3)
    cols = jnp.cross(poses.joint_axis_w[None], arm)  # (K, 12, 3)
    mask = _JOINT_MASK_J[np.asarray(bodies)][:, :, None]  # (K, 12, 1)
    J_joints = jnp.where(mask, cols, 0.0).swapaxes(-1, -2)  # (K, 3, 12)
    return jnp.concatenate([J_base_lin, J_base_ang, J_joints], axis=-1)


def angular_jacobians(poses: Poses, bodies: np.ndarray) -> jnp.ndarray:
    """Batched `angular_jacobian` for static body ids -> (K,3,18)."""
    K_ = len(bodies)
    base_R = poses.R[0]
    zeros = jnp.zeros((K_, 3, 3), poses.R.dtype)
    mask = _JOINT_MASK_J[np.asarray(bodies)][:, :, None]
    J_joints = jnp.where(mask, poses.joint_axis_w[None], 0.0).swapaxes(-1, -2)
    return jnp.concatenate(
        [zeros, jnp.broadcast_to(base_R, (K_, 3, 3)), J_joints], axis=-1
    )


FOOT_BODIES = np.array([3, 6, 9, 12])  # calf body of each leg


def foot_jacobians(kin: Go2Kin, q: jnp.ndarray) -> jnp.ndarray:
    """(4, 3, 18) world-aligned foot point Jacobians."""
    poses = fk(kin, q)
    return point_jacobians(poses, poses.foot_w, FOOT_BODIES)


def qdot(q: jnp.ndarray, dq: jnp.ndarray) -> jnp.ndarray:
    """Time derivative of q (19,) given dq (18,) (pin convention).

    pos_dot = R v_body; quat_dot = 1/2 * quat * [omega_body, 0]; joints_dot.
    """
    R = quat_to_rotmat(q[3:7])
    pos_dot = mm(R, dq[0:3])
    omega_quat = jnp.concatenate([dq[3:6], jnp.zeros((1,), q.dtype)])
    quat_dot = 0.5 * quat_mul(q[3:7], omega_quat)
    return jnp.concatenate([pos_dot, quat_dot, dq[6:18]])


def foot_state(kin: Go2Kin, q: jnp.ndarray, dq: jnp.ndarray):
    """Foot world positions and velocities -> ((4,3), (4,3)).

    Velocity = J_foot @ dq (LOCAL_WORLD_ALIGNED linear part), matching
    reference go2_robot_data.py:271-283.
    """
    poses = fk(kin, q)
    J = point_jacobians(poses, poses.foot_w, FOOT_BODIES)
    vel = ein("lij,j->li", J, dq)
    return poses.foot_w, vel


def foot_jdot_qd(kin: Go2Kin, q: jnp.ndarray, dq: jnp.ndarray) -> jnp.ndarray:
    """Classical J̇·dq (4, 3) for the feet via jvp (zero joint acceleration).

    d/dt [J(q) dq] with dq held constant = (dJ/dq · q̇) dq — exactly the term
    the swing-leg operational-space feedforward subtracts (reference
    leg_controller.py:89-92, go2_robot_data.py:332-344).
    """

    def vel_of_q(qq):
        poses = fk(kin, qq)
        J = point_jacobians(poses, poses.foot_w, FOOT_BODIES)
        return ein("lij,j->li", J, dq)

    _, jd = jax.jvp(vel_of_q, (q,), (qdot(q, dq),))
    return jd
