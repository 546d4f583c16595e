"""COM reference trajectory + predicted foot lever arms for the MPC horizon.

Functional re-design of the reference's ``ComTraj.generate_traj``
(reference com_trajectory.py:27-211). All statefulness becomes explicit:

- the persistent COM position target ``pos_des_world`` (reference
  com_trajectory.py:13,47-60) is carried in ``RefGenState``;
- the sequential foot-lever prediction loop with its mask-edge logic and the
  mask_previous = [2,2,2,2] first-step quirk (com_trajectory.py:115-201)
  becomes a ``lax.scan`` over the horizon with branchless ``jnp.where``;
- the reference's "dummy Pinocchio model" FK is unnecessary: the predicted
  configuration has zero joint angles, so predicted hip positions are
  rigid-body transforms of baked hip offsets (cf. go2_robot_data.py:224-250)
  — computed directly by ``gait.touchdown_nominal``.

Reference quirk kept as spec: the predicted-touchdown drift term is fed the
*body-frame* velocity components (com_trajectory.py:124-131 computes
v_body = R_world_to_body @ v_world and stores it as the dummy's base_vel,
which gait.py:42-58 then reads as if world xy).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from convex_mpc_tpu.control import gait as G
from convex_mpc_tpu.control.srb import SrbDynamics, discretize
from convex_mpc_tpu.ops.linalg import ein, mm
from convex_mpc_tpu.ops.rotations import rot_z


class CentroidalObs(NamedTuple):
    """What the reference generator needs from the robot (one scenario).

    Produced from the plant state via models.dynamics (capability of
    reference go2_robot_data.py update_model + compute_com_x_vec).
    """

    x_vec: jnp.ndarray  # (12,) [p_com, rpy(cont. yaw), v_com, omega_world]
    R_body_to_world: jnp.ndarray  # (3, 3)
    foot_levers: jnp.ndarray  # (4, 3) COM -> foot, world
    mass: jnp.ndarray  # ()
    inertia_world: jnp.ndarray  # (3, 3) centroidal inertia, world axes


class BodyCommand(NamedTuple):
    """Velocity command (reference test_MPC.py BodyCmdPhase)."""

    vx: jnp.ndarray  # () body-frame forward velocity, m/s
    vy: jnp.ndarray  # () body-frame lateral velocity, m/s
    z_pos: jnp.ndarray  # () desired COM height, m
    yaw_rate: jnp.ndarray  # () rad/s


class RefGenState(NamedTuple):
    """Carried state of the generator."""

    pos_des_world: jnp.ndarray  # (3,) persistent COM position target
    vel_cmd: jnp.ndarray  # (3,) braking-limited (vx, vy, yaw_rate) command
    # (equals the raw command whenever the braking limiters are disabled)


class ReferenceTraj(NamedTuple):
    """Everything the QP assembly consumes, plus leg-controller targets."""

    x0: jnp.ndarray  # (12,) initial centroidal state
    x_ref: jnp.ndarray  # (N, 12) stacked reference
    contact: jnp.ndarray  # (4, N) stance table
    r_feet: jnp.ndarray  # (N, 4, 3) predicted COM->foot levers, world
    dyn: SrbDynamics  # discretized SRB dynamics
    pos_des_world: jnp.ndarray  # (3,) clamped position target (for Raibert fb)
    vel_des_world: jnp.ndarray  # (3,) commanded velocity, world


def init_state(x_vec: jnp.ndarray) -> RefGenState:
    """Initial target = current COM position (reference com_trajectory.py:10-13)."""
    return RefGenState(pos_des_world=x_vec[0:3], vel_cmd=jnp.zeros(3))


def generate(
    state: RefGenState,
    gait: G.GaitParams,
    obs: CentroidalObs,
    cmd: BodyCommand,
    time_now,
    dt,
    n: int,
    max_pos_error: float = 0.1,
    brake_accel: float = 0.0,
    brake_alpha: float = 0.0,
) -> tuple[ReferenceTraj, RefGenState]:
    """One MPC-rate reference generation (reference com_trajectory.py:27-211).

    ``brake_accel`` / ``brake_alpha`` (m/s^2 and rad/s^2, static; 0 =
    reference spec behavior, OFF — see utils/config.py for the
    adjudication status of each):
    deceleration limiter on the body-frame velocity COMMAND the generator
    tracks. The reference applies raw command steps (test_MPC.py:82-92);
    its hard stop transitions (0.8 m/s -> 0 at t = 9) cluster the tuned
    profile's ensemble failures at the braking instant, a margin the
    round-4 ensemble proved solver-independent (PARITY.md). Unlike the
    REJECTED whole-schedule command ramp (measured harmful, 0/64 — it
    prolonged the coupled turn+accel state), this limiter only caps dv/dt
    when a component's commanded |v| DECREASES: accelerations and the spec
    step response stay untouched; stops become ~|v|/brake_accel ramps in
    the *reference*, which the MPC can realize within the +-45 Nm torque
    caps instead of demanding an impulse. One limiter step per generate()
    call, rate scaled by ``dt`` (the calls are one MPC period apart).
    """
    x0 = obs.x_vec
    p0 = x0[0:3]
    yaw = x0[5]

    v_tgt = jnp.stack([cmd.vx, cmd.vy, cmd.yaw_rate])
    if brake_accel > 0.0 or brake_alpha > 0.0:
        rate = jnp.asarray(
            [brake_accel or jnp.inf, brake_accel or jnp.inf,
             brake_alpha or jnp.inf], jnp.float32)
        braking = jnp.abs(v_tgt) < jnp.abs(state.vel_cmd)
        dv = jnp.clip(v_tgt - state.vel_cmd, -rate * dt, rate * dt)
        v_cmd = jnp.where(braking, state.vel_cmd + dv, v_tgt)
    else:
        v_cmd = v_tgt
    cmd = cmd._replace(vx=v_cmd[0], vy=v_cmd[1], yaw_rate=v_cmd[2])

    # --- clamp the persistent position target to +-max_pos_error of current
    # (reference com_trajectory.py:47-60) ---
    pos_des = state.pos_des_world
    pos_des_xy = jnp.clip(
        pos_des[0:2], p0[0:2] - max_pos_error, p0[0:2] + max_pos_error
    )
    pos_des = jnp.concatenate([pos_des_xy, cmd.z_pos[None]])

    # --- world-frame velocity command (yaw-rotated body command) ---
    vel_des_world = mm(rot_z(yaw), jnp.stack([cmd.vx, cmd.vy, jnp.zeros_like(cmd.vx)]))

    t_vec = (jnp.arange(n) + 1) * dt  # (N,)
    pos_traj = pos_des[:, None] + vel_des_world[:, None] * t_vec[None, :]  # (3, N)
    vel_traj = jnp.broadcast_to(vel_des_world[:, None], (3, n))
    yaw_traj = yaw + cmd.yaw_rate * t_vec
    rpy_traj = jnp.stack([jnp.zeros((n,)), jnp.zeros((n,)), yaw_traj])  # (3, N)
    omega_traj = jnp.stack(
        [jnp.zeros((n,)), jnp.zeros((n,)), jnp.broadcast_to(cmd.yaw_rate, (n,))]
    )

    contact = G.contact_table(gait, time_now, dt, n)  # (4, N)

    # --- predicted foot levers: scan over the horizon ---
    # reference quirk: drift velocity = body-frame components of the commanded
    # world velocity (see module docstring)
    v_body = mm(obs.R_body_to_world.T, vel_des_world)

    hip_offsets = _hip_offsets()

    # per-(step, leg) feedback-free touchdown predictions are
    # carry-INDEPENDENT — hoisted out of the scan as one batched (N, 4)
    # evaluation so the sequential chain below carries only cheap masked
    # selects (the trig/Raibert math dominated the old per-step scan body)
    td_all = jax.vmap(
        lambda base_pos_i, yaw_i: jax.vmap(
            lambda hip: G.touchdown_nominal(
                gait, base_pos_i, v_body[0:2], yaw_i, cmd.yaw_rate, hip
            )
        )(hip_offsets)
    )(pos_traj.T, yaw_traj)  # (N, 4, 3)
    r_td_all = td_all - pos_traj.T[:, None, :]

    def step(carry, inputs):
        mask_prev, r_prev, r_next_td = carry
        mask_i, r_td_new = inputs

        edge = mask_i != mask_prev
        takeoff = edge & (mask_i == 0)
        touchdown = edge & (mask_i == 1)

        r_next_td = jnp.where(takeoff[:, None], r_td_new, r_next_td)
        r_i = jnp.where(
            takeoff[:, None],
            0.0,
            jnp.where(touchdown[:, None], r_next_td, r_prev),
        )
        return (mask_i, r_i, r_next_td), r_i

    # the reference samples the horizon mask at exact times t + i*dt (not
    # midpoints) for the lever prediction (com_trajectory.py:120, gait.py:21-24)
    masks = jax.vmap(lambda i: G.current_mask(gait, time_now + i * dt))(jnp.arange(n))
    init = (
        jnp.full((4,), 2, jnp.int32),  # mask_previous = [2,2,2,2] quirk
        jnp.zeros((4, 3)),
        obs.foot_levers,  # initial next-touchdown levers = current levers
    )
    _, r_feet = jax.lax.scan(step, init, (masks, r_td_all))  # (N, 4, 3)

    x_ref = jnp.concatenate([pos_traj, rpy_traj, vel_traj, omega_traj], axis=0).T  # (N, 12)

    yaw_avg = jnp.mean(yaw_traj)
    dyn = discretize(yaw_avg, r_feet, obs.mass, obs.inertia_world, dt)

    traj = ReferenceTraj(
        x0=x0,
        x_ref=x_ref,
        contact=contact,
        r_feet=r_feet,
        dyn=dyn,
        pos_des_world=pos_des,
        vel_des_world=vel_des_world,
    )
    return traj, RefGenState(pos_des_world=pos_des, vel_cmd=v_cmd)


def _hip_offsets() -> jnp.ndarray:
    """(4, 3) baked body-frame hip (thigh-joint) offsets."""
    from convex_mpc_tpu.models.kinematics import build_kin

    return build_kin().hip_offset
