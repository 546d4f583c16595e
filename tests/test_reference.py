"""Reference trajectory generator vs a NumPy oracle of the reference logic.

The oracle mirrors convex_mpc/com_trajectory.py:27-211 semantics (sequential
loop, mask-edge branches, mask_previous=[2,2,2,2] init, body-frame drift
velocity quirk) in plain Python, independently of the lax.scan version.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_mpc_tpu.control import gait as G
from convex_mpc_tpu.control import reference as R
from convex_mpc_tpu.models.kinematics import build_kin

PERIOD, DUTY = 1 / 3.0, 0.6
OFFSETS = np.array([0.5, 0.0, 0.0, 0.5])
N = 16
DT = PERIOD / N


def rz(a):
    return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])


def oracle_generate(pos_des_prev, x0, R_bw, foot_levers, cmd, t_now):
    vx, vy, z_des, wz = cmd
    p0 = x0[0:3]
    yaw = x0[5]
    pos_des = pos_des_prev.copy()
    for ax in range(2):
        pos_des[ax] = min(pos_des[ax], p0[ax] + 0.1)
        pos_des[ax] = max(pos_des[ax], p0[ax] - 0.1)
    pos_des[2] = z_des

    vel_w = rz(yaw) @ np.array([vx, vy, 0.0])
    tv = (np.arange(N) + 1) * DT
    pos_traj = pos_des[:, None] + vel_w[:, None] * tv[None, :]
    yaw_traj = yaw + wz * tv

    # contact table with midpoint sampling
    t = t_now + np.arange(N) * DT + DT / 2
    phases = np.mod(OFFSETS[:, None] + t[None, :] / PERIOD, 1.0)
    contact = (phases < DUTY).astype(int)

    v_body = R_bw.T @ vel_w
    hip = np.asarray(build_kin().hip_offset, float)
    t_sw, t_st = (1 - DUTY) * PERIOD, DUTY * PERIOD
    T = t_sw + 0.5 * t_st
    pred = T / 2

    mask_prev = np.array([2, 2, 2, 2])
    r_next = np.asarray(foot_levers, float).copy()
    r = np.zeros((N, 4, 3))
    for i in range(N):
        # exact-time mask for the lever prediction
        ph = np.mod(OFFSETS + (t_now + i * DT) / PERIOD, 1.0)
        mask_i = (ph < DUTY).astype(int)
        base = pos_traj[:, i]
        for leg in range(4):
            if mask_i[leg] != mask_prev[leg] and mask_i[leg] == 0:
                hip_w = np.array([base[0], base[1], 0.0]) + rz(yaw_traj[i]) @ hip[leg]
                nominal = np.array([hip_w[0], hip_w[1], 0.02])
                drift = np.array([v_body[0] * pred, v_body[1] * pred, 0.0])
                dtheta = wz * pred
                r_xy = nominal[:2] - base[:2]
                rot = np.array([-dtheta * r_xy[1], dtheta * r_xy[0], 0.0])
                td = nominal + drift + rot
                r_next[leg] = td - base
                r[i, leg] = 0.0
            elif mask_i[leg] != mask_prev[leg] and mask_i[leg] == 1:
                r[i, leg] = r_next[leg]
            else:
                r[i, leg] = r[i - 1, leg]
        mask_prev = mask_i
    return pos_des, pos_traj, yaw_traj, contact, r


def make_obs(seed=0, vx=0.4, yaw=0.3):
    rng = np.random.default_rng(seed)
    x0 = np.zeros(12)
    x0[0:3] = [0.5, -0.2, 0.27]
    x0[5] = yaw
    x0[6] = vx
    R_bw = rz(yaw)  # pretend flat attitude
    levers = np.array(
        [[0.19, 0.14, -0.26], [0.19, -0.14, -0.26], [-0.19, 0.14, -0.26], [-0.19, -0.14, -0.26]]
    ) + rng.normal(size=(4, 3)) * 0.01
    obs = R.CentroidalObs(
        x_vec=jnp.asarray(x0, jnp.float32),
        R_body_to_world=jnp.asarray(R_bw, jnp.float32),
        foot_levers=jnp.asarray(levers, jnp.float32),
        mass=jnp.asarray(15.1, jnp.float32),
        inertia_world=jnp.asarray(np.diag([0.1, 0.25, 0.3]), jnp.float32),
    )
    return x0, R_bw, levers, obs


@pytest.mark.parametrize("t_now", [0.0, 0.1, 0.1547, 0.31])
def test_matches_oracle(t_now):
    x0, R_bw, levers, obs = make_obs()
    gait = G.make_gait_params(3.0, 0.6)
    cmd = R.BodyCommand(
        vx=jnp.asarray(0.4), vy=jnp.asarray(0.1), z_pos=jnp.asarray(0.27), yaw_rate=jnp.asarray(1.0)
    )
    state = R.RefGenState(pos_des_world=jnp.asarray([0.45, -0.15, 0.27], jnp.float32), vel_cmd=jnp.zeros(3))

    traj, new_state = R.generate(state, gait, obs, cmd, t_now, DT, N)

    pos_des_ref, pos_traj_ref, yaw_ref, contact_ref, r_ref = oracle_generate(
        np.array([0.45, -0.15, 0.27]), x0, R_bw, levers, (0.4, 0.1, 0.27, 1.0), t_now
    )

    np.testing.assert_allclose(np.asarray(new_state.pos_des_world), pos_des_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(traj.x_ref)[:, 0:3], pos_traj_ref.T, atol=1e-5)
    np.testing.assert_allclose(np.asarray(traj.x_ref)[:, 5], yaw_ref, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(traj.contact), contact_ref)
    np.testing.assert_allclose(np.asarray(traj.r_feet), r_ref, atol=1e-5)


def test_clamp_pulls_target_toward_robot():
    x0, R_bw, levers, obs = make_obs()
    gait = G.make_gait_params(3.0, 0.6)
    cmd = R.BodyCommand(
        vx=jnp.asarray(0.0), vy=jnp.asarray(0.0), z_pos=jnp.asarray(0.27), yaw_rate=jnp.asarray(0.0)
    )
    # target far behind the robot: clamp to within 0.1
    state = R.RefGenState(pos_des_world=jnp.asarray([-2.0, 3.0, 0.27], jnp.float32), vel_cmd=jnp.zeros(3))
    _, new_state = R.generate(state, gait, obs, cmd, 0.0, DT, N)
    np.testing.assert_allclose(
        np.asarray(new_state.pos_des_world), [0.5 - 0.1, -0.2 + 0.1, 0.27], atol=1e-6
    )


def test_swing_levers_are_zero_and_stance_nonzero():
    _, _, _, obs = make_obs()
    gait = G.make_gait_params(3.0, 0.6)
    cmd = R.BodyCommand(
        vx=jnp.asarray(0.5), vy=jnp.asarray(0.0), z_pos=jnp.asarray(0.27), yaw_rate=jnp.asarray(0.0)
    )
    state = R.init_state(obs.x_vec)
    traj, _ = R.generate(state, gait, obs, cmd, 0.05, DT, N)
    r = np.asarray(traj.r_feet)
    masks = np.stack(
        [np.asarray(G.current_mask(gait, 0.05 + i * DT)) for i in range(N)]
    )  # (N, 4) exact-time sampling, as the lever loop uses
    for i in range(N):
        for leg in range(4):
            if masks[i, leg] == 0:
                np.testing.assert_allclose(r[i, leg], 0.0, atol=1e-6)
            else:
                assert np.linalg.norm(r[i, leg]) > 0.05


def test_jit_and_vmap():
    _, _, _, obs = make_obs()
    gait = G.make_gait_params(3.0, 0.6)
    cmd = R.BodyCommand(
        vx=jnp.asarray(0.5), vy=jnp.asarray(0.0), z_pos=jnp.asarray(0.27), yaw_rate=jnp.asarray(0.0)
    )
    state = R.init_state(obs.x_vec)

    gen = jax.jit(lambda s, o, c, t: R.generate(s, gait, o, c, t, DT, N), static_argnames=())
    traj, _ = gen(state, obs, cmd, 0.1)
    assert traj.x_ref.shape == (N, 12)
    assert traj.dyn.Bd.shape == (N, 12, 12)

    B = 5
    batch_obs = jax.tree.map(lambda x: jnp.stack([x] * B), obs)
    batch_cmd = jax.tree.map(lambda x: jnp.stack([x] * B), cmd)
    batch_state = jax.tree.map(lambda x: jnp.stack([x] * B), state)
    vgen = jax.jit(jax.vmap(lambda s, o, c: R.generate(s, gait, o, c, 0.1, DT, N)))
    btraj, _ = vgen(batch_state, batch_obs, batch_cmd)
    assert btraj.x_ref.shape == (B, N, 12)


def test_brake_limiter_semantics():
    """The optional deceleration limiter (brake_accel/brake_alpha) caps
    dv/dt ONLY when a commanded component's |v| decreases; accelerations
    pass through at the spec step response, and brake_accel=0 (default)
    reproduces the reference's raw steps exactly."""
    import jax
    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.control import reference as R

    gait = G.make_gait_params(3.0, 0.6)
    obs = R.CentroidalObs(
        x_vec=jnp.zeros(12),
        R_body_to_world=jnp.eye(3),
        foot_levers=jnp.zeros((4, 3)),
        mass=jnp.asarray(12.0),
        inertia_world=jnp.eye(3) * 0.1,
    )
    dt = 0.02

    def step_once(vel_cmd_prev, cmd, **kw):
        st = R.RefGenState(pos_des_world=jnp.zeros(3),
                           vel_cmd=jnp.asarray(vel_cmd_prev, jnp.float32))
        _, st2 = R.generate(st, gait, obs, cmd, 0.0, dt, 16, **kw)
        return np.asarray(st2.vel_cmd)

    cmd_stop = R.BodyCommand(vx=jnp.asarray(0.0), vy=jnp.asarray(0.0),
                             z_pos=jnp.asarray(0.27), yaw_rate=jnp.asarray(0.0))
    cmd_go = R.BodyCommand(vx=jnp.asarray(0.8), vy=jnp.asarray(0.0),
                           z_pos=jnp.asarray(0.27), yaw_rate=jnp.asarray(2.0))

    # default: raw steps (spec) — carried command IS the raw command
    v = step_once([0.8, 0.0, 2.0], cmd_stop)
    np.testing.assert_allclose(v, [0.0, 0.0, 0.0], atol=0)

    # braking limited: one step removes exactly brake_accel*dt
    v = step_once([0.8, 0.0, 2.0], cmd_stop, brake_accel=2.5)
    np.testing.assert_allclose(v, [0.8 - 2.5 * dt, 0.0, 0.0], rtol=1e-6)

    # acceleration passes through unlimited even with the limiter on
    v = step_once([0.0, 0.0, 0.0], cmd_go, brake_accel=2.5, brake_alpha=10.0)
    np.testing.assert_allclose(v, [0.8, 0.0, 2.0], rtol=1e-6)

    # yaw limiter independent of the linear one
    v = step_once([0.0, 0.0, 2.0], cmd_stop, brake_alpha=10.0)
    np.testing.assert_allclose(v, [0.0, 0.0, 2.0 - 10.0 * dt], rtol=1e-6)
