"""Swing/stance leg controller: per-leg joint torques at the 1 kHz rate.

Functional re-design of the reference's ``LegController``
(reference leg_controller.py:38-112). The stored swing closure, takeoff-time
attributes, and ``last_mask`` edge detector become explicit carried state
(``LegControlState``), updated branchlessly with ``jnp.where`` so the whole
controller vmaps over scenario batches and runs inside ``lax.scan``.

Per leg:
- takeoff edge (mask 1->0, incl. the first-tick last_mask=2 quirk): latch
  takeoff time, current foot position, and the full-feedback Raibert
  touchdown target (reference leg_controller.py:67-72, gait.py:77-136);
- swing: Cartesian PD (Kp=500, Kd=200) + operational-space feedforward
  f_ff = Lambda (a_des - Jdot dq), tau = J_leg' f + (C dq + g)[leg]
  (reference leg_controller.py:75-98);
- stance: tau = J_leg' (-f_mpc) (reference leg_controller.py:100-101).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from convex_mpc_tpu.control import gait as G
from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.models import kinematics as K
from convex_mpc_tpu.ops.linalg import ein


class LegObs(NamedTuple):
    """Full-model quantities the controller reads each tick (one scenario)."""

    J_feet: jnp.ndarray  # (4, 3, 18) world point Jacobians
    M: jnp.ndarray  # (18, 18) mass matrix (tree-structured: zero cross-leg
    #                 blocks — required by the arrow solve, see ops.linalg)
    bias: jnp.ndarray  # (18,) C dq + g
    jdot_qd: jnp.ndarray  # (4, 3) classical Jdot*dq per foot
    foot_pos: jnp.ndarray  # (4, 3) world
    foot_vel: jnp.ndarray  # (4, 3) world
    base_pos: jnp.ndarray  # (3,) world
    pos_com_world: jnp.ndarray  # (3,)
    vel_com_world: jnp.ndarray  # (3,)
    yaw: jnp.ndarray  # () continuous yaw
    base_R: jnp.ndarray  # (3, 3) base orientation (for plant-step reuse)


class LegControlState(NamedTuple):
    last_mask: jnp.ndarray  # (4,) int32; init 2 (reference leg_controller.py:41)
    takeoff_time: jnp.ndarray  # (4,)
    swing_p0: jnp.ndarray  # (4, 3) foot position at takeoff
    swing_td: jnp.ndarray  # (4, 3) latched touchdown target


class LegOutput(NamedTuple):
    tau: jnp.ndarray  # (4, 3) joint torques [hip, thigh, calf] per leg
    pos_des: jnp.ndarray  # (4, 3)
    pos_now: jnp.ndarray  # (4, 3)
    vel_des: jnp.ndarray  # (4, 3)
    vel_now: jnp.ndarray  # (4, 3)


def init_state() -> LegControlState:
    return LegControlState(
        last_mask=jnp.full((4,), 2, jnp.int32),
        takeoff_time=jnp.zeros((4,)),
        swing_p0=jnp.zeros((4, 3)),
        swing_td=jnp.zeros((4, 3)),
    )


def make_leg_obs(dyn: D.Go2Dyn, q: jnp.ndarray, dq: jnp.ndarray, yaw) -> LegObs:
    """Compute all controller inputs from the full model (one config).

    Capability of reference go2_robot_data.update_model + accessors, via
    the single-pass ``dynamics.tick_model`` (one primal + one tangent
    evaluation — the tick chain is op-issue-bound, see STATUS.md roofline).
    ``yaw`` is the continuous (unwrapped) yaw carried by the caller.
    """
    tm = D.tick_model(dyn, q, dq)
    return LegObs(
        J_feet=tm.J_feet,
        M=tm.M,
        bias=tm.bias,
        jdot_qd=tm.jdot_qd,
        foot_pos=tm.foot_pos,
        foot_vel=tm.foot_vel,
        base_pos=q[0:3],
        pos_com_world=tm.com,
        vel_com_world=tm.vcom,
        yaw=jnp.asarray(yaw),
        base_R=tm.base_R,
    )


def compute_torques(
    state: LegControlState,
    gait: G.GaitParams,
    obs: LegObs,
    contact_force: jnp.ndarray,  # (4, 3) world MPC forces (first horizon step)
    pos_des_world: jnp.ndarray,  # (3,) COM target (reference generator output)
    vel_des_world: jnp.ndarray,  # (3,) commanded world velocity
    yaw_rate_des,  # ()
    t,  # () current time
    kp: float = 500.0,
    kd: float = 200.0,
    ground_z: float = 0.0,
    foot_radius: float = 0.022,
    early_contact_fz: float = 15.0,
    raibert_clamp: float | None = None,
) -> tuple[LegOutput, LegControlState]:
    """One 1 kHz controller tick for all four legs (one scenario)."""
    mask = G.current_mask(gait, t)  # (4,)
    edge = mask != state.last_mask
    takeoff = edge & (mask == 0)

    # Raibert touchdown for legs taking off now (computed for all, latched
    # only on the edge — branchless)
    hip_offsets = _hip_offsets()
    td_all = jax.vmap(
        lambda hip: G.touchdown_raibert(
            gait,
            obs.base_pos,
            obs.pos_com_world,
            obs.vel_com_world,
            obs.yaw,
            yaw_rate_des,
            vel_des_world[0:2],
            pos_des_world[0:2],
            hip,
            clamp_correction=raibert_clamp,
        )
    )(hip_offsets)  # (4, 3)

    takeoff_time = jnp.where(takeoff, t, state.takeoff_time)
    swing_p0 = jnp.where(takeoff[:, None], obs.foot_pos, state.swing_p0)
    swing_td = jnp.where(takeoff[:, None], td_all, state.swing_td)

    # swing trajectory evaluation (per leg, time since takeoff)
    t_since = t - takeoff_time  # (4,)
    p_des, v_des, a_des = jax.vmap(
        lambda p0, pf, ts: G.swing_eval(p0, pf, ts, gait.swing_time, gait.swing_height)
    )(swing_p0, swing_td, t_since)

    # operational-space feedforward: Lambda (a_des - Jdot dq)
    # M^-1 J' via the arrow (Schur-complement) factorization: the mass
    # matrix's tree structure (dense base block, per-leg 3x3 diagonal, zero
    # cross-leg coupling) turns the serialized 18x18 Cholesky into a 6x6
    # one + closed-form 3x3 inverses — the per-tick hot solve
    # (tools/cycle_ablation.py). Precision is pinned inside the helpers.
    from convex_mpc_tpu.ops import linalg as lx

    fac = lx.arrow_factor(obs.M)
    X = lx.arrow_solve(fac, obs.J_feet.reshape(12, 18).T)  # (18, 12)
    Minv_Jt = jnp.moveaxis(X.reshape(18, 4, 3), 0, 1)  # (4, 18, 3)
    JMJt = ein("lij,ljk->lik", obs.J_feet, Minv_Jt)
    lam = lx.inv3(JMJt)  # (4, 3, 3)
    f_ff = ein("lij,lj->li", lam, a_des - obs.jdot_qd)

    force_sw = kp * (p_des - obs.foot_pos) + kd * (v_des - obs.foot_vel) + f_ff

    # 3x3 leg Jacobians: columns of the leg's own joints
    J_leg = jnp.stack([obs.J_feet[l, :, 6 + 3 * l : 9 + 3 * l] for l in range(4)])
    bias_leg = obs.bias[6:18].reshape(4, 3)

    tau_swing = ein("lji,lj->li", J_leg, force_sw) + bias_leg
    tau_stance = ein("lji,lj->li", J_leg, -contact_force)

    # Early-contact handling: if a swing foot reaches the ground in the
    # second half of its swing (late touchdown expected soon), stop tracking
    # the full swing trajectory — driving a grounded foot along the
    # descending min-jerk path injects large impulses. Instead hold a light
    # support force in z while continuing to steer xy toward the latched
    # touchdown target (under ~15 N the Coulomb cap is low, so the PD can
    # slide the foot the remaining distance) — freezing the foot wherever it
    # grazed systematically places the support polygon short of the Raibert
    # target and destabilizes lateral/turning gaits. (Standard quadruped
    # practice; the reference relies on MuJoCo's hard contacts to mask it.)
    s_phase = jnp.clip(t_since / gait.swing_time, 0.0, 1.0)  # (4,)
    touching = obs.foot_pos[:, 2] - foot_radius <= ground_z + 1e-3
    early = (mask == 0) & (s_phase > 0.5) & touching
    # applied foot force: xy PD toward the latched touchdown clamped to the
    # sliding-friction scale (so the body reaction stays small), light
    # downward press
    f_xy = kp * (swing_td[:, 0:2] - obs.foot_pos[:, 0:2]) - kd * obs.foot_vel[:, 0:2]
    f_cap = 0.8 * early_contact_fz
    f_norm = jnp.linalg.norm(f_xy, axis=1, keepdims=True)
    f_xy = f_xy * jnp.minimum(1.0, f_cap / jnp.maximum(f_norm, 1e-6))
    f_early = jnp.concatenate([f_xy, jnp.full((4, 1), -early_contact_fz)], axis=1)
    tau_early = ein("lji,lj->li", J_leg, f_early)

    in_swing = (mask == 0)[:, None]
    tau = jnp.where(early[:, None], tau_early, jnp.where(in_swing, tau_swing, tau_stance))
    out = LegOutput(
        tau=tau,
        pos_des=jnp.where(in_swing, p_des, obs.foot_pos),
        pos_now=obs.foot_pos,
        vel_des=jnp.where(in_swing, v_des, obs.foot_vel),
        vel_now=obs.foot_vel,
    )
    new_state = LegControlState(
        last_mask=mask,
        takeoff_time=takeoff_time,
        swing_p0=swing_p0,
        swing_td=swing_td,
    )
    return out, new_state


def _hip_offsets() -> jnp.ndarray:
    return K.build_kin().hip_offset
