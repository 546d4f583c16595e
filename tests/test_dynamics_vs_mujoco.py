"""Validate the JAX kinematics/dynamics library against host-side MuJoCo.

The MJCF is generated from the same Go2Params source of truth, so any
disagreement is a bug in the JAX spatial algebra (or in the convention
conversions, which mirror the reference's mujoco<->pinocchio bridge,
reference mujoco_model.py:48-68).

Conversions under test:
- q_pin [pos, quat xyzw, joints] <-> mj qpos [pos, quat wxyz, joints]
- dq_pin [v body, w body, qdots] <-> mj qvel [v world, w body, qdots]
  via T(q) = blockdiag(R, I, I):  v_mj = T dq_pin
- M_pin = T' M_mj T;  bias_pin = T' (M_mj Tdot dq + bias_mj)
- J_pin = J_mj T (site point Jacobians)
"""

import jax.numpy as jnp
import mujoco as mj
import numpy as np
import pytest

from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.models import kinematics as K
from convex_mpc_tpu.models.go2_params import DEFAULT_PARAMS, LEG_NAMES
from convex_mpc_tpu.models.mjcf import go2_mjcf


@pytest.fixture(scope="module")
def mj_model():
    return mj.MjModel.from_xml_string(go2_mjcf(DEFAULT_PARAMS, ground=False))


@pytest.fixture(scope="module")
def dyn():
    return D.build_dyn(DEFAULT_PARAMS)


def random_state(seed):
    rng = np.random.default_rng(seed)
    q = np.zeros(19)
    q[0:3] = rng.normal(size=3)
    quat = rng.normal(size=4)
    q[3:7] = quat / np.linalg.norm(quat)  # xyzw
    q[7:] = rng.uniform(-1.0, 1.0, size=12) + np.tile([0.0, 0.9, -1.8], 4)
    dq = rng.normal(size=18)
    return q, dq


def set_mj_state(model, data, q, dq):
    R = _quat_xyzw_to_R(q[3:7])
    data.qpos[:] = np.concatenate([q[0:3], [q[6], q[3], q[4], q[5]], q[7:]])
    v_world = R @ dq[0:3]
    data.qvel[:] = np.concatenate([v_world, dq[3:6], dq[6:]])
    mj.mj_forward(model, data)
    return R


def _quat_xyzw_to_R(qv):
    x, y, z, w = qv
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _T(R):
    T = np.eye(18)
    T[0:3, 0:3] = R
    return T


def test_total_mass(mj_model, dyn):
    np.testing.assert_allclose(
        float(dyn.total_mass), mj_model.body_mass.sum(), rtol=1e-6
    )


def test_foot_positions(mj_model, dyn):
    data = mj.MjData(mj_model)
    for seed in range(5):
        q, dq = random_state(seed)
        set_mj_state(mj_model, data, q, dq)
        poses = K.fk(dyn.kin, jnp.asarray(q, jnp.float32))
        for li, leg in enumerate(LEG_NAMES):
            sid = mj.mj_name2id(mj_model, mj.mjtObj.mjOBJ_SITE, f"{leg}_foot_site")
            np.testing.assert_allclose(
                np.asarray(poses.foot_w[li]), data.site_xpos[sid], atol=2e-5
            )


def test_foot_velocities(mj_model, dyn):
    data = mj.MjData(mj_model)
    for seed in range(3):
        q, dq = random_state(seed)
        set_mj_state(mj_model, data, q, dq)
        _, vel = K.foot_state(dyn.kin, jnp.asarray(q, jnp.float32), jnp.asarray(dq, jnp.float32))
        for li, leg in enumerate(LEG_NAMES):
            sid = mj.mj_name2id(mj_model, mj.mjtObj.mjOBJ_SITE, f"{leg}_foot_site")
            res = np.zeros(6)
            mj.mj_objectVelocity(mj_model, data, mj.mjtObj.mjOBJ_SITE, sid, res, 0)
            # res = [ang; lin] in world (flg_local=0)
            np.testing.assert_allclose(np.asarray(vel[li]), res[3:6], atol=1e-4)


def test_foot_jacobians(mj_model, dyn):
    data = mj.MjData(mj_model)
    for seed in range(3):
        q, dq = random_state(seed)
        R = set_mj_state(mj_model, data, q, dq)
        J = np.asarray(K.foot_jacobians(dyn.kin, jnp.asarray(q, jnp.float32)))
        T = _T(R)
        for li, leg in enumerate(LEG_NAMES):
            sid = mj.mj_name2id(mj_model, mj.mjtObj.mjOBJ_SITE, f"{leg}_foot_site")
            jacp = np.zeros((3, 18))
            mj.mj_jacSite(mj_model, data, jacp, None, sid)
            np.testing.assert_allclose(J[li], jacp @ T, atol=2e-5)


def test_mass_matrix(mj_model, dyn):
    data = mj.MjData(mj_model)
    for seed in range(3):
        q, dq = random_state(seed)
        R = set_mj_state(mj_model, data, q, dq)
        M_jax = np.asarray(D.mass_matrix(dyn, jnp.asarray(q, jnp.float32)))
        M_mj = np.zeros((18, 18))
        mj.mj_fullM(mj_model, data, M_mj)
        T = _T(R)
        M_ref = T.T @ M_mj @ T
        np.testing.assert_allclose(M_jax, M_ref, atol=5e-5)


def test_bias_forces(mj_model, dyn):
    data = mj.MjData(mj_model)
    for seed in range(3):
        q, dq = random_state(seed)
        R = set_mj_state(mj_model, data, q, dq)
        b_jax = np.asarray(
            D.bias_forces(dyn, jnp.asarray(q, jnp.float32), jnp.asarray(dq, jnp.float32))
        )
        M_mj = np.zeros((18, 18))
        mj.mj_fullM(mj_model, data, M_mj)
        T = _T(R)
        # Tdot dq term: d/dt(R) v_body = R hat(w_body) v_body in the first block
        tdot_dq = np.zeros(18)
        tdot_dq[0:3] = R @ np.cross(dq[3:6], dq[0:3])
        b_ref = T.T @ (M_mj @ tdot_dq + data.qfrc_bias)
        np.testing.assert_allclose(b_jax, b_ref, atol=2e-3)


def test_com_and_vcom(mj_model, dyn):
    data = mj.MjData(mj_model)
    for seed in range(3):
        q, dq = random_state(seed)
        set_mj_state(mj_model, data, q, dq)
        com, vcom = D.com_state(dyn, jnp.asarray(q, jnp.float32), jnp.asarray(dq, jnp.float32))
        base_id = mj.mj_name2id(mj_model, mj.mjtObj.mjOBJ_BODY, "base_link")
        np.testing.assert_allclose(np.asarray(com), data.subtree_com[base_id], atol=2e-5)
        mj.mj_subtreeVel(mj_model, data)
        np.testing.assert_allclose(np.asarray(vcom), data.subtree_linvel[base_id], atol=1e-4)


def test_centroidal_inertia(mj_model, dyn):
    data = mj.MjData(mj_model)
    for seed in range(3):
        q, dq = random_state(seed)
        set_mj_state(mj_model, data, q, dq)
        Ig = np.asarray(D.centroidal_inertia(dyn, jnp.asarray(q, jnp.float32)))
        # oracle: assemble from per-body inertia in world about robot COM
        base_id = mj.mj_name2id(mj_model, mj.mjtObj.mjOBJ_BODY, "base_link")
        com = data.subtree_com[base_id]
        Ig_ref = np.zeros((3, 3))
        for b in range(1, mj_model.nbody):
            m = mj_model.body_mass[b]
            ximat = data.ximat[b].reshape(3, 3)
            I_diag = np.diag(mj_model.body_inertia[b])
            I_w = ximat @ I_diag @ ximat.T
            d = data.xipos[b] - com
            Ig_ref += I_w + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
        np.testing.assert_allclose(Ig, Ig_ref, atol=2e-5)


def test_jdot_qd_finite_difference(mj_model, dyn):
    # classical J̇ dq via f64 finite differences of J(q(t)) dq
    for seed in range(3):
        q, dq = random_state(seed)
        qj, dqj = jnp.asarray(q, jnp.float32), jnp.asarray(dq, jnp.float32)
        jd = np.asarray(K.foot_jdot_qd(dyn.kin, qj, dqj))

        # h chosen for f32 FK: FD noise ~ eps*|J|/h ~ 3e-5, truncation ~ h^2
        h = 1e-3
        qd = np.asarray(K.qdot(jnp.asarray(q), jnp.asarray(dq)), float)
        qp = q + h * qd
        qp[3:7] /= np.linalg.norm(qp[3:7])
        qm = q - h * qd
        qm[3:7] /= np.linalg.norm(qm[3:7])

        def Jdq(qq):
            J = np.asarray(K.foot_jacobians(dyn.kin, jnp.asarray(qq)), float)
            return np.einsum("lij,j->li", J, dq)

        jd_ref = (Jdq(qp) - Jdq(qm)) / (2 * h)
        np.testing.assert_allclose(jd, jd_ref, atol=5e-3)


def test_operational_space_inertia(mj_model, dyn):
    data = mj.MjData(mj_model)
    q, dq = random_state(0)
    R = set_mj_state(mj_model, data, q, dq)
    M_jax = D.mass_matrix(dyn, jnp.asarray(q, jnp.float32))
    J = K.foot_jacobians(dyn.kin, jnp.asarray(q, jnp.float32))
    lam = np.asarray(D.operational_space_inertia(M_jax, J[0]))
    lam_ref = np.linalg.inv(
        np.asarray(J[0], float) @ np.linalg.inv(np.asarray(M_jax, float)) @ np.asarray(J[0], float).T
    )
    np.testing.assert_allclose(lam, lam_ref, rtol=1e-3, atol=1e-4)


def test_tick_model_matches_entry_points(dyn):
    """dynamics.tick_model (single linearize pass, the 1 kHz hot path) must
    equal the individual MuJoCo-validated entry points on every field."""
    for seed in range(4):
        q, dq = random_state(seed)
        qj, dqj = jnp.asarray(q, jnp.float32), jnp.asarray(dq, jnp.float32)
        tm = D.tick_model(dyn, qj, dqj)
        refs = {
            "M": D.mass_matrix(dyn, qj),
            "bias": D.bias_forces(dyn, qj, dqj),
            "jdot_qd": K.foot_jdot_qd(dyn.kin, qj, dqj),
            "J_feet": K.foot_jacobians(dyn.kin, qj),
        }
        com, vcom = D.com_state(dyn, qj, dqj)
        refs["com"], refs["vcom"] = com, vcom
        fp, fv = K.foot_state(dyn.kin, qj, dqj)
        refs["foot_pos"], refs["foot_vel"] = fp, fv
        for name, ref in refs.items():
            got = np.asarray(getattr(tm, name))
            ref = np.asarray(ref)
            scale = max(np.abs(ref).max(), 1.0)
            np.testing.assert_allclose(
                got, ref, atol=3e-5 * scale, rtol=0, err_msg=f"{name} seed={seed}"
            )
