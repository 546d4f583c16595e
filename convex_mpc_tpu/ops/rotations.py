"""Rotation utilities (quaternions, ZYX Euler, axis rotations).

Conventions (match the reference stack's Pinocchio conventions so parity tests
line up; cf. reference go2_robot_data.py:74-106):

- Quaternions are stored ``[x, y, z, w]`` (xyzw) and map BODY -> WORLD.
- Euler angles are ZYX intrinsic (yaw about world z, then pitch, then roll):
  ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)``.
- All functions are pure jnp, shape-polymorphic over leading batch dims where
  noted, and safe under ``jit``/``vmap``/``grad``.
"""

from __future__ import annotations

import jax.numpy as jnp


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric (cross-product) matrix of v (..., 3) -> (..., 3, 3).

    hat(v) @ w == cross(v, w). Reference capability: com_trajectory.py:213-219.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_to_rotmat(q_xyzw: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [x,y,z,w] (..., 4) -> rotation matrix (..., 3, 3) (body->world)."""
    x, y, z, w = (q_xyzw[..., 0], q_xyzw[..., 1], q_xyzw[..., 2], q_xyzw[..., 3])
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = 1.0 - 2.0 * (yy + zz)
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = 1.0 - 2.0 * (xx + zz)
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = 1.0 - 2.0 * (xx + yy)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rpy_to_quat(rpy: jnp.ndarray) -> jnp.ndarray:
    """ZYX Euler [roll, pitch, yaw] (..., 3) -> quaternion [x,y,z,w] (..., 4).

    Matches the reference's explicit formula (go2_robot_data.py:95-106).
    """
    roll, pitch, yaw = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    qx = sr * cp * cy - cr * sp * sy
    qy = cr * sp * cy + sr * cp * sy
    qz = cr * cp * sy - sr * sp * cy
    qw = cr * cp * cy + sr * sp * sy
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def rotmat_to_rpy(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> ZYX Euler [roll, pitch, yaw] (..., 3).

    Yaw/roll in [-pi, pi], pitch in [-pi/2, pi/2]. Matches Pinocchio's
    matrixToRpy away from the pitch singularity (reference go2_robot_data.py:78).
    """
    pitch = jnp.arctan2(-R[..., 2, 0], jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2))
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_rpy(q_xyzw: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [x,y,z,w] -> ZYX Euler [roll, pitch, yaw]."""
    return rotmat_to_rpy(quat_to_rotmat(q_xyzw))


def rpy_to_rotmat(rpy: jnp.ndarray) -> jnp.ndarray:
    """ZYX Euler (..., 3) -> rotation matrix (..., 3, 3): Rz(yaw) Ry(pitch) Rx(roll)."""
    return quat_to_rotmat(rpy_to_quat(rpy))


def rot_z(yaw: jnp.ndarray) -> jnp.ndarray:
    """Yaw-only rotation matrix (...,) -> (..., 3, 3) (reference go2_robot_data.py:218-222)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of xyzw quaternions: rotation q1 applied after q2."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_integrate(q_xyzw: jnp.ndarray, omega_body: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by body-frame angular velocity over dt.

    Exact exponential-map update: q' = q * exp(omega_body * dt / 2); renormalized.
    Used by the TPU plant's free-joint integration (capability of MuJoCo's
    quaternion integration, reference mujoco_model.py / mj_step).
    """
    ang = omega_body * dt
    theta = jnp.linalg.norm(ang, axis=-1, keepdims=True)
    half = 0.5 * theta
    # sinc-safe: sin(half)/theta -> 0.5 as theta -> 0
    small = theta < 1e-8
    k = jnp.where(small, 0.5, jnp.sin(half) / jnp.where(small, 1.0, theta))
    dq = jnp.concatenate([ang * k, jnp.cos(half)], axis=-1)
    out = quat_mul(q_xyzw, dq)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def yaw_unwrap_step(yaw_meas: jnp.ndarray, yaw_prev_meas: jnp.ndarray, yaw_cont: jnp.ndarray):
    """One step of continuous yaw unwrapping (carried-state form).

    Functional re-expression of the reference's stateful accumulator
    (go2_robot_data.py:82-93): adds the wrapped-to-[-pi,pi) delta between
    consecutive measurements to the continuous yaw.

    Returns (new_yaw_cont, new_yaw_prev_meas).
    """
    delta = jnp.mod(yaw_meas - yaw_prev_meas + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return yaw_cont + delta, yaw_meas
