"""Gait schedule truth tables and swing-trajectory boundary conditions.

Oracles mirror the reference semantics (gait.py:26-37 midpoint sampling,
gait.py:139-174 min-jerk basis) in plain NumPy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_mpc_tpu.control import gait as G


def numpy_contact_table(t0, dt, n, period, duty, phase_offset):
    t = t0 + np.arange(n) * dt + dt / 2.0
    phases = np.mod(np.asarray(phase_offset)[:, None] + t[None, :] / period, 1.0)
    return (phases < duty).astype(np.int32)


@pytest.fixture(scope="module")
def trot():
    return G.make_gait_params(frequency_hz=3.0, duty=0.6)


def test_contact_table_matches_numpy_oracle(trot):
    rng = np.random.default_rng(0)
    for _ in range(20):
        t0 = float(rng.uniform(0, 5))
        dt = float(rng.uniform(0.005, 0.05))
        got = np.asarray(G.contact_table(trot, t0, dt, 16))
        want = numpy_contact_table(t0, dt, 16, 1 / 3.0, 0.6, [0.5, 0.0, 0.0, 0.5])
        np.testing.assert_array_equal(got, want)


def test_contact_table_midpoint_sampling(trot):
    # At t0 exactly on a stance->swing boundary, midpoint sampling classifies
    # the interval by its center, not its left edge (reference gait.py:30-31).
    period, duty = 1 / 3.0, 0.6
    t_boundary = duty * period  # FR/RL leg (offset 0) leaves stance here
    dt = 0.02
    tbl = np.asarray(G.contact_table(trot, t_boundary, dt, 1))
    assert tbl[1, 0] == 0 and tbl[2, 0] == 0  # already swing at midpoint


def test_current_mask_is_one_column_table(trot):
    # times chosen away from exact phase boundaries (f32 vs f64 would
    # legitimately disagree on the open/closed boundary itself)
    for t in [0.0, 0.1, 0.21, 0.33, 1.234]:
        mask = np.asarray(G.current_mask(trot, t))
        want = numpy_contact_table(t, 0.0, 1, 1 / 3.0, 0.6, [0.5, 0.0, 0.0, 0.5])[:, 0]
        np.testing.assert_array_equal(mask, want)


def test_trot_always_diagonal_pairs(trot):
    # trot: FL/RR share phase, FR/RL share phase
    tbl = np.asarray(G.contact_table(trot, 0.0, 1 / 48.0, 48))
    np.testing.assert_array_equal(tbl[0], tbl[3])
    np.testing.assert_array_equal(tbl[1], tbl[2])


def test_swing_boundary_conditions(trot):
    p0 = jnp.array([0.1, -0.2, 0.02])
    pf = jnp.array([0.3, -0.1, 0.02])
    t_sw = 0.4 * (1 / 3.0)
    h = 0.1

    p, v, a = G.swing_eval(p0, pf, 0.0, t_sw, h)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), 0.0, atol=1e-4)

    p, v, a = G.swing_eval(p0, pf, t_sw, t_sw, h)
    np.testing.assert_allclose(np.asarray(p), np.asarray(pf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), 0.0, atol=1e-3)

    # apex: z bump maximum at s = 0.5 equals p_mid_z + h (64 * 0.5^6 = 1)
    p, _, _ = G.swing_eval(p0, pf, t_sw / 2, t_sw, h)
    mid_z = 0.5 * (p0[2] + pf[2])
    np.testing.assert_allclose(float(p[2]), float(mid_z) + h, atol=1e-6)

    # clipping beyond t_swing holds the endpoint (reference clips s to [0,1])
    p, v, _ = G.swing_eval(p0, pf, 2 * t_sw, t_sw, h)
    np.testing.assert_allclose(np.asarray(p), np.asarray(pf), atol=1e-6)


def test_swing_matches_reference_formula(trot):
    # NumPy oracle of the reference closure (gait.py:146-172)
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=3)
    pf = rng.normal(size=3)
    T, h = 0.133, 0.1
    for t in [0.0, 0.03, 0.07, 0.1, 0.133]:
        s = np.clip(t / T, 0.0, 1.0)
        mj = 10 * s**3 - 15 * s**4 + 6 * s**5
        dmj = 30 * s**2 - 60 * s**3 + 30 * s**4
        d2mj = 60 * s - 180 * s**2 + 120 * s**3
        p_ref = p0 + (pf - p0) * mj
        v_ref = (pf - p0) * dmj / T
        a_ref = (pf - p0) * d2mj / T**2
        b = 64 * s**3 * (1 - s) ** 3
        db = 192 * s**2 * (1 - s) ** 2 * (1 - 2 * s)
        d2b = 192 * (
            2 * s * (1 - s) ** 2 * (1 - 2 * s)
            - 2 * s**2 * (1 - s) * (1 - 2 * s)
            - 2 * s**2 * (1 - s) ** 2
        )
        p_ref[2] += h * b
        v_ref[2] += h * db / T
        a_ref[2] += h * d2b / T**2

        p, v, a = G.swing_eval(jnp.asarray(p0), jnp.asarray(pf), t, T, h)
        np.testing.assert_allclose(np.asarray(p), p_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v), v_ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a), a_ref, rtol=1e-4, atol=1e-3)


def test_swing_eval_vmaps():
    B = 7
    rng = np.random.default_rng(2)
    p0 = jnp.asarray(rng.normal(size=(B, 3)))
    pf = jnp.asarray(rng.normal(size=(B, 3)))
    t = jnp.asarray(rng.uniform(0, 0.2, size=(B,)))
    fn = jax.vmap(lambda a, b, tt: G.swing_eval(a, b, tt, 0.133, 0.1))
    p, v, acc = fn(p0, pf, t)
    assert p.shape == (B, 3) and v.shape == (B, 3) and acc.shape == (B, 3)


def test_touchdown_nominal_matches_reference_oracle(trot):
    # NumPy oracle of reference gait.py:40-74
    rng = np.random.default_rng(3)
    for _ in range(10):
        base_pos = rng.normal(size=3)
        base_vel = rng.normal(size=3)
        yaw = float(rng.uniform(-3, 3))
        yaw_rate = float(rng.uniform(-2, 2))
        hip = rng.normal(size=3) * 0.2

        period, duty = 1 / 3.0, 0.6
        t_swing, t_stance = (1 - duty) * period, duty * period
        T = t_swing + 0.5 * t_stance
        pred = T / 2
        Rz = np.array(
            [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
        )
        hip_world = np.array([base_pos[0], base_pos[1], 0.0]) + Rz @ hip
        nominal = np.array([hip_world[0], hip_world[1], 0.02])
        drift = np.array([base_vel[0] * pred, base_vel[1] * pred, 0.0])
        dtheta = yaw_rate * pred
        r_xy = nominal[:2] - base_pos[:2]
        rot_corr = np.array([-dtheta * r_xy[1], dtheta * r_xy[0], 0.0])
        want = nominal + drift + rot_corr

        got = G.touchdown_nominal(
            trot,
            jnp.asarray(base_pos),
            jnp.asarray(base_vel[:2]),
            yaw,
            yaw_rate,
            jnp.asarray(hip),
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_touchdown_raibert_matches_reference_oracle(trot):
    # NumPy oracle of reference gait.py:77-136
    rng = np.random.default_rng(4)
    for _ in range(10):
        base_pos = rng.normal(size=3)
        com = rng.normal(size=3)
        vcom = rng.normal(size=3)
        yaw = float(rng.uniform(-3, 3))
        yaw_rate = float(rng.uniform(-2, 2))
        hip = rng.normal(size=3) * 0.2
        v_des = rng.normal(size=2)
        p_des = rng.normal(size=2)

        period, duty = 1 / 3.0, 0.6
        t_swing, t_stance = (1 - duty) * period, duty * period
        T = t_swing + 0.5 * t_stance
        pred = T / 2
        k_v_x, k_p_x = 0.4 * T, 0.1
        k_v_y, k_p_y = 0.2 * T, 0.05
        Rz = np.array(
            [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
        )
        hip_world = np.array([base_pos[0], base_pos[1], 0.0]) + Rz @ hip
        nominal = np.array([hip_world[0], hip_world[1], 0.02])
        drift = np.array([v_des[0] * pred, v_des[1] * pred, 0.0])
        pos_corr = np.array([k_p_x * (com[0] - p_des[0]), k_p_y * (com[1] - p_des[1]), 0.0])
        vel_corr = np.array([k_v_x * (vcom[0] - v_des[0]), k_v_y * (vcom[1] - v_des[1]), 0.0])
        dtheta = yaw_rate * pred
        r_xy = nominal[:2] - base_pos[:2]
        rot_corr = np.array([-dtheta * r_xy[1], dtheta * r_xy[0], 0.0])
        want = nominal + drift + pos_corr + vel_corr + rot_corr

        got = G.touchdown_raibert(
            trot,
            jnp.asarray(base_pos),
            jnp.asarray(com),
            jnp.asarray(vcom),
            yaw,
            yaw_rate,
            jnp.asarray(v_des),
            jnp.asarray(p_des),
            jnp.asarray(hip),
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
