"""Gait scheduling, Raibert foot placement, and min-jerk swing trajectories.

Pure-functional, batchable re-design of the reference's ``Gait`` class
(reference convex_mpc/gait.py). All functions take explicit gait parameters so
they can be ``vmap``-ed over a scenario batch (per-scenario gait frequency /
duty / phase offsets), and all "closures" become pure evaluations of carried
state.

Leg order everywhere: [FL, FR, RL, RR].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from convex_mpc_tpu.ops.rotations import rot_z


class GaitParams(NamedTuple):
    """Batchable gait parameter pytree (reference gait.py:8-19).

    All fields are arrays so a scenario batch can carry per-scenario gaits.
    """

    period: jnp.ndarray  # () gait period, s
    duty: jnp.ndarray  # () stance fraction in [0, 1]
    phase_offset: jnp.ndarray  # (4,) per-leg phase offsets
    swing_height: jnp.ndarray  # () swing apex height, m
    touchdown_z: jnp.ndarray  # () nominal touchdown height, m

    @property
    def stance_time(self) -> jnp.ndarray:
        return self.duty * self.period

    @property
    def swing_time(self) -> jnp.ndarray:
        return (1.0 - self.duty) * self.period


def make_gait_params(
    frequency_hz: float = 3.0,
    duty: float = 0.6,
    phase_offset=(0.5, 0.0, 0.0, 0.5),
    swing_height: float = 0.1,
    touchdown_z: float = 0.02,
) -> GaitParams:
    """Build GaitParams from plain floats (trot defaults, reference test_MPC.py:50-51)."""
    return GaitParams(
        period=jnp.asarray(1.0 / frequency_hz),
        duty=jnp.asarray(duty),
        phase_offset=jnp.asarray(phase_offset),
        swing_height=jnp.asarray(swing_height),
        touchdown_z=jnp.asarray(touchdown_z),
    )


def contact_table(gait: GaitParams, t0, dt, n: int) -> jnp.ndarray:
    """Contact schedule over an N-step horizon -> (4, N) int32, 1=stance 0=swing.

    Midpoint sampling: each interval [t0 + k*dt, t0 + (k+1)*dt] is classified
    by its center t0 + k*dt + dt/2 (reference gait.py:26-37). ``n`` is static.
    """
    t = t0 + jnp.arange(n) * dt + dt / 2.0
    phases = jnp.mod(gait.phase_offset[:, None] + t[None, :] / gait.period, 1.0)
    return (phases < gait.duty).astype(jnp.int32)


def current_mask(gait: GaitParams, t) -> jnp.ndarray:
    """Instantaneous contact mask at time t -> (4,) int32 (reference gait.py:21-24)."""
    return contact_table(gait, t, 0.0, 1)[:, 0]


def leg_phase(gait: GaitParams, t) -> jnp.ndarray:
    """Per-leg gait phase in [0, 1) at time t -> (4,). Stance iff phase < duty."""
    return jnp.mod(gait.phase_offset + t / gait.period, 1.0)


def _rotation_correction(hip_xy_rel: jnp.ndarray, yaw_rate, pred_time) -> jnp.ndarray:
    """Yaw-rotation touchdown correction (reference gait.py:60-68).

    hip_xy_rel is the hip position relative to the base xy (i.e. R_z @ hip_offset).
    """
    dtheta = yaw_rate * pred_time
    return jnp.stack(
        [-dtheta * hip_xy_rel[..., 1], dtheta * hip_xy_rel[..., 0], jnp.zeros_like(dtheta)],
        axis=-1,
    )


def touchdown_nominal(
    gait: GaitParams,
    base_pos: jnp.ndarray,  # (3,) predicted base/COM position, world
    base_vel_xy: jnp.ndarray,  # (2,) predicted base velocity (reference quirk: body-frame
    # components are passed here by the trajectory predictor, see reference
    # com_trajectory.py:124-131 feeding gait.py:42-58)
    yaw,  # () current yaw (world)
    yaw_rate_des,  # () desired yaw rate
    hip_offset: jnp.ndarray,  # (3,) body-frame hip offset of this leg
) -> jnp.ndarray:
    """Feedback-free touchdown prediction used along the MPC horizon -> (3,).

    Re-design of reference gait.py:40-74 (`compute_touchdown_world_for_traj_
    purpose_only`): nominal hip projection + velocity drift + yaw rotation
    correction, z = touchdown_z. No position/velocity feedback terms.
    """
    t_swing = gait.swing_time
    t_stance = gait.stance_time
    big_t = t_swing + 0.5 * t_stance
    pred_time = big_t / 2.0

    hip_rel = rot_z(yaw) @ hip_offset  # hip offset rotated into world (yaw only)
    hip_world = jnp.stack([base_pos[0] + hip_rel[0], base_pos[1] + hip_rel[1], jnp.zeros_like(base_pos[2])])
    nominal = jnp.stack([hip_world[0], hip_world[1], gait.touchdown_z + 0.0 * base_pos[2]])
    drift = jnp.stack([base_vel_xy[0] * pred_time, base_vel_xy[1] * pred_time, jnp.zeros_like(pred_time)])
    rot_corr = _rotation_correction(hip_rel[:2], yaw_rate_des, pred_time)
    return nominal + drift + rot_corr


def touchdown_raibert(
    gait: GaitParams,
    base_pos: jnp.ndarray,  # (3,) actual base position, world
    pos_com_world: jnp.ndarray,  # (3,) COM position, world
    vel_com_world: jnp.ndarray,  # (3,) COM velocity, world
    yaw,  # () current yaw
    yaw_rate_des,  # () desired yaw rate
    vel_des_world_xy: jnp.ndarray,  # (2,) desired world velocity (x, y)
    pos_des_world_xy: jnp.ndarray,  # (2,) desired world position (x, y)
    hip_offset: jnp.ndarray,  # (3,) body-frame hip offset of this leg
    clamp_correction: float | None = None,
) -> jnp.ndarray:
    """Full Raibert touchdown with position/velocity feedback -> (3,).

    Re-design of reference gait.py:77-136 (`compute_swing_traj_and_touchdown`
    placement part): nominal hip projection + desired-velocity drift +
    kp*(p_com - p_des) + kv*(v_com - v_des) + yaw rotation correction. Gains
    kv_x = 0.4*T, kp_x = 0.1, kv_y = 0.2*T, kp_y = 0.05 (reference gait.py:105-111).

    ``clamp_correction``: optional cap (meters) on the combined feedback
    correction magnitude. During violent transients the raw feedback can
    demand footholds beyond leg reach (e.g. 0.28 m at 1.5 m/s velocity
    error), which mistime landings and tighten the failure spiral; the
    reference never enters such regimes in its own sim so it never clamps.
    None reproduces the reference formula exactly.
    """
    t_swing = gait.swing_time
    t_stance = gait.stance_time
    big_t = t_swing + 0.5 * t_stance
    pred_time = big_t / 2.0

    k_v_x = 0.4 * big_t
    k_p_x = 0.1
    k_v_y = 0.2 * big_t
    k_p_y = 0.05

    hip_rel = rot_z(yaw) @ hip_offset
    nominal = jnp.stack(
        [base_pos[0] + hip_rel[0], base_pos[1] + hip_rel[1], gait.touchdown_z + 0.0 * base_pos[2]]
    )
    drift = jnp.stack(
        [vel_des_world_xy[0] * pred_time, vel_des_world_xy[1] * pred_time, jnp.zeros_like(pred_time)]
    )
    pos_corr = jnp.stack(
        [
            k_p_x * (pos_com_world[0] - pos_des_world_xy[0]),
            k_p_y * (pos_com_world[1] - pos_des_world_xy[1]),
            jnp.zeros_like(pred_time),
        ]
    )
    vel_corr = jnp.stack(
        [
            k_v_x * (vel_com_world[0] - vel_des_world_xy[0]),
            k_v_y * (vel_com_world[1] - vel_des_world_xy[1]),
            jnp.zeros_like(pred_time),
        ]
    )
    rot_corr = _rotation_correction(hip_rel[:2], yaw_rate_des, pred_time)
    correction = pos_corr + vel_corr
    if clamp_correction is not None:
        mag = jnp.linalg.norm(correction[0:2])
        scale = jnp.minimum(1.0, clamp_correction / jnp.maximum(mag, 1e-9))
        correction = correction * scale
    return nominal + drift + correction + rot_corr


def swing_eval(p0: jnp.ndarray, pf: jnp.ndarray, t, t_swing, swing_height):
    """Evaluate the min-jerk swing trajectory at time-since-takeoff ``t``.

    Pure re-expression of the reference's stored closure
    (reference gait.py:139-174 `make_swing_trajectory`): the takeoff state
    (p0, pf, takeoff time) is carried explicitly (e.g. through ``lax.scan``)
    and this function is evaluated each tick.

    - xyz follow the quintic min-jerk basis 10 s^3 - 15 s^4 + 6 s^5;
    - z adds a smooth bump h * 64 s^3 (1-s)^3 with zero end vel/acc;
    - phase s = clip(t / t_swing, 0, 1).

    Supports arbitrary leading batch dims on p0/pf with matching scalar-ish
    t/t_swing/swing_height. Returns (p, v, a), each (..., 3).
    """
    t_swing = jnp.asarray(t_swing)
    safe_t_swing = jnp.where(t_swing > 0, t_swing, 1.0)
    # degenerate t_swing <= 0 (duty = 1 gait): hold the endpoint
    s = jnp.where(t_swing > 0, jnp.clip(t / safe_t_swing, 0.0, 1.0), 1.0)
    s = jnp.asarray(s)[..., None]  # broadcast over xyz
    t_swing = safe_t_swing
    dp = pf - p0

    mj = 10 * s**3 - 15 * s**4 + 6 * s**5
    dmj = 30 * s**2 - 60 * s**3 + 30 * s**4
    d2mj = 60 * s - 180 * s**2 + 120 * s**3

    t_swing = jnp.asarray(t_swing)[..., None]
    p = p0 + dp * mj
    v = dp * dmj / t_swing
    a = dp * d2mj / (t_swing**2)

    b = 64 * s**3 * (1 - s) ** 3
    db = 192 * s**2 * (1 - s) ** 2 * (1 - 2 * s)
    d2b = 192 * (
        2 * s * (1 - s) ** 2 * (1 - 2 * s)
        - 2 * s**2 * (1 - s) * (1 - 2 * s)
        - 2 * s**2 * (1 - s) ** 2
    )

    h = jnp.asarray(swing_height)[..., None]
    zhat = jnp.array([0.0, 0.0, 1.0])
    p = p + h * b * zhat
    v = v + h * db / t_swing * zhat
    a = a + h * d2b / (t_swing**2) * zhat
    return p, v, a
