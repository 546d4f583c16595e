"""Go2 rigid-body dynamics in pure JAX: M, bias, COM, centroidal inertia.

TPU-native replacement for the reference's Pinocchio computeAllTerms/ccrba
calls (reference go2_robot_data.py:193-222,355-360; com_trajectory.py:39-40).
Formulation chosen for JAX rather than translating Featherstone recursions:

- **Mass matrix** M(q) = sum_b [ m_b J_cb' J_cb + J_wb' I_b^w J_wb ] over the
  13 bodies — composite-rigid-body via world COM/angular Jacobians. Small
  dense matmuls, batches cleanly under vmap, maps onto the MXU.
- **Bias** b(q, dq) = C dq + g via world-frame Newton-Euler with zero joint
  acceleration: per-body velocity-product accelerations come from a single
  ``jax.jvp`` of the velocity kinematics along q̇ (no hand-derived
  acceleration propagation), then generalized forces by Jacobian transpose.
  Equals Pinocchio's nonLinearEffects / MuJoCo's qfrc_bias (sign: resisting).
- **COM / vcom / centroidal inertia** I_g about the COM in world axes
  (Pinocchio's data.Ig, consumed by the SRB model, com_trajectory.py:39-40).

All quantities use the pinocchio free-flyer velocity convention
dq = [v_base BODY, omega_base BODY, joint vels] (see models.kinematics).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from convex_mpc_tpu.models import kinematics as K
from convex_mpc_tpu.models.go2_params import Go2Params, DEFAULT_PARAMS
from convex_mpc_tpu.ops.linalg import ein
from convex_mpc_tpu.ops.rotations import hat

NV = 18
NUM_BODIES = 13
GRAVITY = jnp.array([0.0, 0.0, -9.81])


class Go2Dyn(NamedTuple):
    """Baked inertial constants + kinematic constants."""

    kin: K.Go2Kin
    mass: jnp.ndarray  # (13,)
    com: jnp.ndarray  # (13, 3) link COM in link frame
    inertia: jnp.ndarray  # (13, 3, 3) rotational inertia about link COM, link frame
    total_mass: jnp.ndarray  # ()


def build_dyn(params: Go2Params = DEFAULT_PARAMS) -> Go2Dyn:
    masses, coms, inertias = [], [], []
    # body order: trunk, then per leg [hip, thigh, calf] (see kinematics)
    links = [params.trunk]
    for leg in range(4):
        links += [params.link_inertia(b, leg) for b in ("hip", "thigh", "calf")]
    for link in links:
        masses.append(link.mass)
        coms.append(link.com)
        inertias.append(link.inertia_matrix())
    return Go2Dyn(
        kin=K.build_kin(params),
        mass=jnp.asarray(masses),
        com=jnp.asarray(np.array(coms)),
        inertia=jnp.asarray(np.stack(inertias)),
        total_mass=jnp.asarray(sum(masses)),
    )


def _body_jacobians(poses: K.Poses, dyn: Go2Dyn):
    """World COM positions (13,3), COM linear Jacobians (13,3,18), angular
    Jacobians (13,3,18), world inertias (13,3,3)."""
    com_w = poses.p + ein("bij,bj->bi", poses.R, dyn.com)
    bodies = np.arange(NUM_BODIES)
    Jc = K.point_jacobians(poses, com_w, bodies)
    Jw = K.angular_jacobians(poses, bodies)
    I_w = ein("bij,bjk,blk->bil", poses.R, dyn.inertia, poses.R)
    return com_w, Jc, Jw, I_w


def mass_matrix(dyn: Go2Dyn, q: jnp.ndarray) -> jnp.ndarray:
    """Joint-space inertia matrix M(q) (18, 18), pin dq convention.

    Capability of Pinocchio CRBA (reference go2_robot_data.py:355-360 data.M).
    """
    poses = K.fk(dyn.kin, q)
    _, Jc, Jw, I_w = _body_jacobians(poses, dyn)
    M = ein("b,bik,bil->kl", dyn.mass, Jc, Jc)
    M = M + ein("bik,bij,bjl->kl", Jw, I_w, Jw)
    return M


def _body_velocities(dyn: Go2Dyn, q: jnp.ndarray, dq: jnp.ndarray):
    """Per-body world angular velocity (13,3) and COM linear velocity (13,3)."""
    poses = K.fk(dyn.kin, q)
    com_w, Jc, Jw, _ = _body_jacobians(poses, dyn)
    v = ein("bij,j->bi", Jc, dq)
    w = ein("bij,j->bi", Jw, dq)
    return w, v


def bias_forces(dyn: Go2Dyn, q: jnp.ndarray, dq: jnp.ndarray) -> jnp.ndarray:
    """Nonlinear effects b(q, dq) = C(q, dq) dq + g(q) (18,).

    Newton-Euler with ddq = 0: velocity-product accelerations via jvp of the
    velocity map along q̇, then tau = sum_b J_cb' F_b + J_wb' N_b with
    F_b = m_b (a_cb - g), N_b = I_b^w alpha_b + w_b x (I_b^w w_b).
    (Capability of Pinocchio computeAllTerms' C dq + g; the reference
    consumes exactly this sum, leg_controller.py:98.)
    """
    poses = K.fk(dyn.kin, q)
    _, Jc, Jw, I_w = _body_jacobians(poses, dyn)

    w, a = jax.jvp(
        lambda qq: _body_velocities(dyn, qq, dq), (q,), (K.qdot(q, dq),)
    )
    omega, _v = w
    alpha, a_com = a

    F = dyn.mass[:, None] * (a_com - GRAVITY[None, :])
    Iw_omega = ein("bij,bj->bi", I_w, omega)
    N = ein("bij,bj->bi", I_w, alpha) + jnp.cross(omega, Iw_omega)
    tau = ein("bij,bi->j", Jc, F) + ein("bij,bi->j", Jw, N)
    return tau


def com_state(dyn: Go2Dyn, q: jnp.ndarray, dq: jnp.ndarray):
    """(com_world (3,), vcom_world (3,)) — Pinocchio centerOfMass equivalent."""
    poses = K.fk(dyn.kin, q)
    com_w, Jc, _, _ = _body_jacobians(poses, dyn)
    com = ein("b,bi->i", dyn.mass, com_w) / dyn.total_mass
    vcom = ein("b,bij,j->i", dyn.mass, Jc, dq) / dyn.total_mass
    return com, vcom


def centroidal_inertia(dyn: Go2Dyn, q: jnp.ndarray) -> jnp.ndarray:
    """Centroidal rotational inertia I_g (3,3), world axes, about the COM.

    Pinocchio ccrba's data.Ig.inertia (reference com_trajectory.py:40).
    """
    poses = K.fk(dyn.kin, q)
    com_w, _, _, I_w = _body_jacobians(poses, dyn)
    com = ein("b,bi->i", dyn.mass, com_w) / dyn.total_mass
    d = com_w - com[None, :]
    shift = dyn.mass[:, None, None] * (
        ein("bi,bi->b", d, d)[:, None, None] * jnp.eye(3)[None]
        - ein("bi,bj->bij", d, d)
    )
    return jnp.sum(I_w + shift, axis=0)


class TickModel(NamedTuple):
    """Every model quantity the 1 kHz controller/plant tick consumes."""

    foot_pos: jnp.ndarray  # (4, 3) world foot centers
    foot_vel: jnp.ndarray  # (4, 3) world foot velocities
    J_feet: jnp.ndarray  # (4, 3, 18) world point Jacobians
    M: jnp.ndarray  # (18, 18) mass matrix (no armature)
    bias: jnp.ndarray  # (18,) C dq + g
    jdot_qd: jnp.ndarray  # (4, 3) classical Jdot*dq per foot
    com: jnp.ndarray  # (3,) world COM
    vcom: jnp.ndarray  # (3,) world COM velocity
    base_R: jnp.ndarray  # (3, 3) base orientation


def tick_model(dyn: Go2Dyn, q: jnp.ndarray, dq: jnp.ndarray) -> TickModel:
    """All per-tick model quantities from ONE kinematics pass + ONE tangent.

    The 1 kHz tick chain is op-issue-bound on TPU (20 sequential steps of
    18-dof arithmetic — see STATUS.md roofline), so the evaluation count
    matters more than FLOPs. The separate entry points (`mass_matrix`,
    `bias_forces`, `com_state`, `foot_jdot_qd`, kinematics.foot_state) each
    rebuild FK/Jacobians and the two jvp-based quantities each carry their
    own linearization; this function instead runs ``jax.linearize`` once —
    one primal evaluation of the full model and one tangent application
    along q̇ that yields the velocity-product accelerations (bias) AND the
    foot J̇·dq together. Tangents of the non-velocity outputs are dead-code
    eliminated by XLA. Equality with the individual entry points is
    asserted in tests/test_dynamics_vs_mujoco.py.

    Capability of reference go2_robot_data.update_model + accessors
    (go2_robot_data.py:193-360) evaluated once per tick.
    """
    kin = dyn.kin
    bodies = np.arange(NUM_BODIES)
    foot_and_com_bodies = np.concatenate([bodies, K.FOOT_BODIES])

    def model_fn(qq):
        poses = K.fk(kin, qq)
        com_w = poses.p + ein("bij,bj->bi", poses.R, dyn.com)
        # one fused point-Jacobian build for the 13 body COMs + 4 feet
        pts = jnp.concatenate([com_w, poses.foot_w], axis=0)  # (17, 3)
        Jpts = K.point_jacobians(poses, pts, foot_and_com_bodies)
        Jc, J_feet = Jpts[:NUM_BODIES], Jpts[NUM_BODIES:]
        Jw = K.angular_jacobians(poses, bodies)
        I_w = ein("bij,bjk,blk->bil", poses.R, dyn.inertia, poses.R)
        # velocity map (linear in the FIXED dq): its tangent along q̇ gives
        # the velocity-product accelerations and J̇·dq directly
        v_b = ein("bij,j->bi", Jc, dq)
        w_b = ein("bij,j->bi", Jw, dq)
        fv = ein("lij,j->li", J_feet, dq)
        return (v_b, w_b, fv), (poses.foot_w, J_feet, Jc, Jw, I_w, com_w,
                                poses.R[0])

    (vels, extras), lin = jax.linearize(model_fn, q)
    (_, w_bodies, foot_vel) = vels
    foot_pos, J_feet, Jc, Jw, I_w, com_w, base_R = extras
    (a_com, alpha, jdot_qd), _ = lin(K.qdot(q, dq))

    M = ein("b,bik,bil->kl", dyn.mass, Jc, Jc) + ein(
        "bik,bij,bjl->kl", Jw, I_w, Jw
    )
    F = dyn.mass[:, None] * (a_com - GRAVITY[None, :])
    Iw_omega = ein("bij,bj->bi", I_w, w_bodies)
    N = ein("bij,bj->bi", I_w, alpha) + jnp.cross(w_bodies, Iw_omega)
    bias = ein("bij,bi->j", Jc, F) + ein("bij,bi->j", Jw, N)
    com = ein("b,bi->i", dyn.mass, com_w) / dyn.total_mass
    vcom = ein("b,bi->i", dyn.mass, vels[0]) / dyn.total_mass
    return TickModel(
        foot_pos=foot_pos,
        foot_vel=foot_vel,
        J_feet=J_feet,
        M=M,
        bias=bias,
        jdot_qd=jdot_qd,
        com=com,
        vcom=vcom,
        base_R=base_R,
    )


def operational_space_inertia(M: jnp.ndarray, J_full: jnp.ndarray) -> jnp.ndarray:
    """Lambda = (J M^-1 J')^-1 (3,3) for a 3x18 point Jacobian.

    The swing-leg feedforward operator (reference leg_controller.py:86-88).
    Solved via Cholesky of M (SPD) — no explicit M inverse.
    """
    Minv_Jt = jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(M), True), J_full.T
    )
    JMJt = ein("ij,jk->ik", J_full, Minv_Jt)
    return jnp.linalg.inv(JMJt)
