"""Batched rigid-body physics plant for the Go2 in pure JAX.

TPU-native replacement for the capability the reference gets from MuJoCo
(reference mujoco_model.py, test_MPC.py:230-232 mj_step): articulated
forward dynamics M(q) ddq = tau - b(q, dq) + J_c' f_contact with a smooth
penalty contact model at the four feet, semi-implicit Euler at the 1 kHz
controller rate.

Contact model (feet vs. flat ground at z = ground_height), per foot:
- normal: spring kn * penetration (explicit) + damper dn * v_z (implicit);
- tangential: regularized Coulomb as *adaptive viscosity* ct = mu fz / vtol
  capped at the Coulomb limit — equivalent to f_t = -mu fz v_t / max(|v_t|,
  vtol) but evaluated implicitly.

Stability note (why implicit): with a tight regularization velocity
(vtol ~ 2 cm/s, needed for low-creep stiction) the tangential viscosity is
~ mu * fz / vtol ~ 3000 N s/m, far beyond the explicit-Euler damping limit
2 m_eff / dt at 1 kHz. All contact *damping* is therefore folded into the
velocity solve:

    (M + dt * J' C J) dq_new = M dq + dt (tau - bias + J' f_spring)

with C = blockdiag per active foot of diag(ct, ct, dn). The left-hand matrix
stays SPD, so the step is still a single batched 18x18 Cholesky solve —
unconditionally stable in the damping terms at no extra factorization cost.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.models import kinematics as K
from convex_mpc_tpu.ops.linalg import ein
from convex_mpc_tpu.ops.rotations import quat_integrate


class ContactParams(NamedTuple):
    """Batchable contact/terrain + actuator parameters (per-scenario
    randomizable)."""

    kn: jnp.ndarray  # () normal stiffness, N/m
    dn: jnp.ndarray  # () normal damping, N/(m/s)
    mu: jnp.ndarray  # () Coulomb friction coefficient
    vtol: jnp.ndarray  # () tangential regularization velocity, m/s
    ground_z: jnp.ndarray  # () ground height, m
    foot_radius: jnp.ndarray  # ()
    armature: jnp.ndarray  # () reflected rotor inertia per joint, kg m^2
    joint_damping: jnp.ndarray  # () viscous joint damping, Nm/(rad/s)


def default_contact(
    kn: float = 30000.0,
    dn: float = 1000.0,
    mu: float = 0.8,
    vtol: float = 0.05,
    ground_z: float = 0.0,
    foot_radius: float = 0.022,
    armature: float = 0.01,
    joint_damping: float = 0.1,
) -> ContactParams:
    """Defaults match the public Unitree Go2 MuJoCo model's actuator
    armature/damping; contact gains tuned for a stable 1 kHz penalty plant
    (~1.2 mm equilibrium penetration, implicit damping keeps it stable)."""
    return ContactParams(
        kn=jnp.asarray(kn),
        dn=jnp.asarray(dn),
        mu=jnp.asarray(mu),
        vtol=jnp.asarray(vtol),
        ground_z=jnp.asarray(ground_z),
        foot_radius=jnp.asarray(foot_radius),
        armature=jnp.asarray(armature),
        joint_damping=jnp.asarray(joint_damping),
    )


class PlantState(NamedTuple):
    q: jnp.ndarray  # (19,) [pos, quat xyzw, joints]
    dq: jnp.ndarray  # (18,) [v body, w body, joint vels]


def init_plant(
    dyn: D.Go2Dyn, x=0.0, y=0.0, z=None, contact: ContactParams | None = None
) -> PlantState:
    """Default standing configuration (reference test_MPC.py:146-149).

    Unless ``z`` is given, the base height is chosen so the feet sit at the
    *equilibrium* penetration of the contact springs (weight / (4 kn)) — a
    raw penalty plant dropped in at the nominal 17 mm interpenetration of
    the reference pose would launch the robot at ~9 g.
    """
    import numpy as np

    from convex_mpc_tpu.models import kinematics as K_
    from convex_mpc_tpu.models.go2_params import DEFAULT_PARAMS

    q = np.asarray(DEFAULT_PARAMS.default_q()).copy()
    q[0], q[1] = x, y
    if z is not None:
        q[2] = z
    else:
        c = contact if contact is not None else default_contact()
        poses = K_.fk(dyn.kin, jnp.asarray(q, jnp.float32))
        foot_center_z = float(poses.foot_w[0, 2])
        pen_eq = float(dyn.total_mass) * 9.81 / (4.0 * float(c.kn))
        target = float(c.ground_z) + float(c.foot_radius) - pen_eq
        q[2] += target - foot_center_z
    return PlantState(q=jnp.asarray(q, jnp.float32), dq=jnp.zeros(18, jnp.float32))


def _contact_terms(contact: ContactParams, foot_pos, foot_vel):
    """Per-foot spring force f0 (4,3), implicit damping diag C (4,3), and the
    estimated normal force (4,) used for the Coulomb viscosity cap."""
    lowest = foot_pos[:, 2] - contact.foot_radius
    pen = contact.ground_z - lowest
    active = pen > 0.0

    f_spring_z = jnp.where(active, contact.kn * pen, 0.0)
    fz_est = jnp.maximum(
        jnp.where(active, contact.kn * pen - contact.dn * foot_vel[:, 2], 0.0), 0.0
    )
    # no adhesion: when the foot is separating fast enough that the damped
    # normal force would go negative (fz_est == 0), drop the normal damper —
    # otherwise it glues lifting feet to the ground with O(100 N) downward
    # force, a classic penalty-contact artifact
    pushing = fz_est > 0.0
    dn = jnp.where(active & pushing, contact.dn, 0.0)
    # tangential: implicit viscosity with a true Coulomb cap. Dividing by
    # max(vtol, |v_t|) instead of vtol keeps |f_t| <= mu * fz even for fast
    # grazing contacts (a fixed ct would brake a 2 m/s swing-foot graze with
    # ~kN forces, far beyond the friction cone)
    vt_mag = jnp.sqrt(jnp.sum(foot_vel[:, 0:2] ** 2, axis=1))
    ct = jnp.where(active, contact.mu * fz_est / jnp.maximum(contact.vtol, vt_mag), 0.0)

    f0 = jnp.stack([jnp.zeros_like(f_spring_z), jnp.zeros_like(f_spring_z), f_spring_z], axis=1)
    C = jnp.stack([ct, ct, dn], axis=1)  # (4, 3) diagonal entries
    return f0, C, fz_est


def contact_forces(
    contact: ContactParams, foot_pos: jnp.ndarray, foot_vel: jnp.ndarray
) -> jnp.ndarray:
    """(4, 3) world contact forces for given foot states (diagnostics; the
    stepper applies the same model with the damping terms implicit)."""
    f0, C, _ = _contact_terms(contact, foot_pos, foot_vel)
    return f0 - C * foot_vel


def step(
    dyn: D.Go2Dyn,
    contact: ContactParams,
    state: PlantState,
    tau_joints: jnp.ndarray,  # (12,) applied joint torques
    dt,
    *,
    J=None,  # (4, 3, 18) precomputed foot Jacobians (e.g. from the leg obs)
    M=None,  # (18, 18) precomputed mass matrix WITHOUT armature
    bias=None,  # (18,) precomputed C dq + g
    base_R=None,  # (3, 3) base orientation
    foot_pos=None,  # (4, 3)
    foot_vel=None,  # (4, 3)
) -> PlantState:
    """One semi-implicit Euler step with implicit contact damping.

    The controller tick computes FK/J/M/bias anyway (leg.make_leg_obs); pass
    them in to avoid recomputing the whole model twice per 1 kHz tick.
    """
    q, dq = state.q, state.dq
    if J is None or base_R is None or foot_pos is None:
        poses = K.fk(dyn.kin, q)
        base_R = poses.R[0]
        foot_pos = poses.foot_w
        J = K.point_jacobians(poses, poses.foot_w, K.FOOT_BODIES)  # (4, 3, 18)
    if foot_vel is None:
        foot_vel = ein("lij,j->li", J, dq)

    f0, C, _ = _contact_terms(contact, foot_pos, foot_vel)

    if M is None:
        M = D.mass_matrix(dyn, q)
    # actuator rotor inertia (armature) on the joint diagonal
    arm = jnp.concatenate([jnp.zeros((6,), q.dtype), jnp.full((12,), contact.armature, q.dtype)])
    M = M + jnp.diag(arm)
    if bias is None:
        bias = D.bias_forces(dyn, q, dq)
    tau_gen = jnp.concatenate([jnp.zeros((6,), q.dtype), tau_joints])

    rhs = ein("ij,j->i", M, dq) + dt * (tau_gen - bias + ein("lij,li->j", J, f0))
    # joint viscous damping, implicit (added to the velocity-solve diagonal)
    jd = jnp.concatenate([jnp.zeros((6,), q.dtype), jnp.full((12,), contact.joint_damping, q.dtype)])
    A = M + dt * ein("lij,li,lik->jk", J, C, J) + dt * jnp.diag(jd)
    # Arrow (Schur-complement) velocity solve: J'CJ preserves the mass
    # matrix's tree sparsity exactly (foot Jacobians touch only base +
    # own-leg columns), so A keeps zero cross-leg blocks and the 18x18
    # Cholesky reduces to a 6x6 one + closed-form 3x3 inverses (the
    # per-tick hot solve — tools/cycle_ablation.py). Precision is pinned
    # inside the helpers (bf16 ambient default on TPU otherwise).
    from convex_mpc_tpu.ops import linalg as lx

    dq_new = lx.arrow_solve(lx.arrow_factor(A), rhs[:, None])[:, 0]

    # integrate q with the *new* velocity (semi-implicit)
    pos_new = q[0:3] + dt * ein("ij,j->i", base_R, dq_new[0:3])
    quat_new = quat_integrate(q[3:7], dq_new[3:6], dt)
    joints_new = q[7:19] + dt * dq_new[6:18]
    q_new = jnp.concatenate([pos_new, quat_new, joints_new])
    return PlantState(q=q_new, dq=dq_new)
