"""Leg controller unit tests against a NumPy oracle of the reference math.

Reference semantics: leg_controller.py:43-112 (swing PD + operational-space
feedforward; stance Jacobian-transpose force mapping; takeoff latches).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from convex_mpc_tpu.control import gait as G
from convex_mpc_tpu.control import leg as L


def synthetic_obs(seed=0, foot_z=0.25):
    """A LegObs with random (but consistent-shaped) model quantities."""
    rng = np.random.default_rng(seed)
    J = rng.normal(size=(4, 3, 18)) * 0.3
    A = rng.normal(size=(18, 18)) * 0.2
    M = A @ A.T + np.eye(18) * 2.0
    # the controller's M^-1 J' solve exploits the quadruped tree structure
    # (ops.linalg.arrow_factor): zero the cross-leg blocks so the synthetic
    # M satisfies the same invariant the real mass matrix does (asserted in
    # tests/test_linalg.py::test_tree_matrices_have_zero_cross_leg_blocks)
    for l1 in range(4):
        for l2 in range(4):
            if l1 != l2:
                M[6 + 3 * l1 : 9 + 3 * l1, 6 + 3 * l2 : 9 + 3 * l2] = 0.0
    bias = rng.normal(size=18)
    foot_pos = np.array(
        [[0.19, 0.14, foot_z], [0.19, -0.14, foot_z], [-0.19, 0.14, foot_z], [-0.19, -0.14, foot_z]]
    )
    return L.LegObs(
        J_feet=jnp.asarray(J, jnp.float32),
        M=jnp.asarray(M, jnp.float32),
        bias=jnp.asarray(bias, jnp.float32),
        jdot_qd=jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
        foot_pos=jnp.asarray(foot_pos, jnp.float32),
        foot_vel=jnp.asarray(rng.normal(size=(4, 3)) * 0.1, jnp.float32),
        base_pos=jnp.asarray([0.0, 0.0, 0.29]),
        pos_com_world=jnp.asarray([0.0, 0.0, 0.27]),
        vel_com_world=jnp.asarray([0.1, 0.0, 0.0]),
        yaw=jnp.asarray(0.0),
        base_R=jnp.eye(3),
    ), J, M, bias, foot_pos


@pytest.fixture
def trot():
    return G.make_gait_params(3.0, 0.6)


def run_tick(state, trot, obs, forces, t):
    return L.compute_torques(
        state, trot, obs,
        jnp.asarray(forces, jnp.float32),
        jnp.asarray([0.0, 0.0, 0.27]), jnp.asarray([0.2, 0.0, 0.0]), 0.0, t,
    )


def test_stance_torque_is_jacobian_transpose(trot):
    obs, J, M, bias, _ = synthetic_obs(foot_z=0.25)  # feet in the air: no early-contact
    forces = np.tile([1.0, 2.0, 40.0], (4, 1))
    # t=0.02: all four legs in stance for this trot phase (3t mod 1 < 0.1)
    t = 0.02
    mask = np.asarray(G.current_mask(trot, t))
    assert mask.sum() == 4
    out, _ = run_tick(L.init_state(), trot, obs, forces, t)
    for leg in range(4):
        J_leg = J[leg][:, 6 + 3 * leg : 9 + 3 * leg]
        want = J_leg.T @ (-forces[leg])
        np.testing.assert_allclose(np.asarray(out.tau[leg]), want, rtol=1e-4, atol=1e-4)


def test_takeoff_latches_and_swing_torque(trot):
    obs, J, M, bias, foot_pos = synthetic_obs(foot_z=0.25)
    # t chosen so FR/RL (offset 0) are in swing: phase in [duty, 1)
    t = 0.21
    mask = np.asarray(G.current_mask(trot, t))
    assert mask[1] == 0 and mask[2] == 0
    out, st = run_tick(L.init_state(), trot, obs, np.zeros((4, 3)), t)

    # latched: takeoff time = t, p0 = current foot position
    assert st.takeoff_time[1] == pytest.approx(t)
    np.testing.assert_allclose(np.asarray(st.swing_p0[1]), foot_pos[1], atol=1e-6)

    # swing torque oracle for leg FR (index 1), t_since = 0 -> des = p0, v=0
    leg = 1
    p_des, v_des, a_des = G.swing_eval(
        jnp.asarray(foot_pos[leg]), st.swing_td[leg], 0.0, trot.swing_time, trot.swing_height
    )
    Minv = np.linalg.inv(np.asarray(obs.M, float))
    lam = np.linalg.inv(J[leg] @ Minv @ J[leg].T)
    f_ff = lam @ (np.asarray(a_des, float) - np.asarray(obs.jdot_qd[leg], float))
    e = np.asarray(p_des, float) - foot_pos[leg]
    ed = np.asarray(v_des, float) - np.asarray(obs.foot_vel[leg], float)
    force = 500.0 * e + 200.0 * ed + f_ff
    J_leg = J[leg][:, 6 + 3 * leg : 9 + 3 * leg]
    want = J_leg.T @ force + bias[6 + 3 * leg : 9 + 3 * leg]
    np.testing.assert_allclose(np.asarray(out.tau[leg]), want, rtol=2e-3, atol=2e-3)


def test_early_contact_force_capped(trot):
    # grounded swing foot in the second half of swing -> clamped steering force
    t_takeoff = 0.2  # FR/RL takeoff boundary for this trot
    state = L.init_state()
    obs_air, *_ = synthetic_obs(foot_z=0.25)
    out, state = run_tick(state, trot, obs_air, np.zeros((4, 3)), t_takeoff + 0.001)
    # late swing, foot on the ground now
    obs_gnd, J, M, bias, _ = synthetic_obs(foot_z=0.01)
    t_late = t_takeoff + 0.8 * float(trot.swing_time)
    out, _ = run_tick(state, trot, obs_gnd, np.zeros((4, 3)), t_late)
    # applied foot force reconstructed from tau: f = J_leg^-T tau
    for leg in (1, 2):
        J_leg = J[leg][:, 6 + 3 * leg : 9 + 3 * leg]
        f = np.linalg.solve(J_leg.T, np.asarray(out.tau[leg], float))
        assert abs(f[2] + 15.0) < 1e-2  # light downward press
        assert np.linalg.norm(f[0:2]) <= 0.8 * 15.0 + 1e-3  # friction-scale cap


def test_last_mask_update_matches_reference(trot):
    state = L.init_state()
    obs, *_ = synthetic_obs()
    for t in [0.0, 0.05, 0.21, 0.25]:
        _, state = run_tick(state, trot, obs, np.zeros((4, 3)), t)
        np.testing.assert_array_equal(
            np.asarray(state.last_mask), np.asarray(G.current_mask(trot, t))
        )
