"""MuJoCo bridge: convention round-trips + plant cross-validation.

The contact-free comparison is a strong end-to-end check of the whole JAX
plant (FK + M + bias + integration) against MuJoCo integrating the same
generated model under the same torques.
"""

import jax.numpy as jnp
import numpy as np

from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.sim import physics as P
from convex_mpc_tpu.sim.mujoco_bridge import MujocoGo2


def test_q_roundtrip():
    bridge = MujocoGo2(ground=False)
    rng = np.random.default_rng(0)
    q = np.zeros(19)
    q[0:3] = rng.normal(size=3)
    quat = rng.normal(size=4)
    q[3:7] = quat / np.linalg.norm(quat)
    q[7:] = rng.normal(size=12)
    bridge.set_q_pin(q)
    q2, dq2 = bridge.get_q_dq_pin()
    np.testing.assert_allclose(q2, q, atol=1e-12)
    np.testing.assert_allclose(dq2, 0.0, atol=1e-12)


def test_free_fall_dynamics_match():
    """No ground: JAX plant vs MuJoCo under identical torques for 100 ms."""
    dyn = D.build_dyn()
    # disable contact + actuator extras to match the bare mujoco model
    contact = P.default_contact(ground_z=-100.0, armature=0.0, joint_damping=0.0)
    bridge = MujocoGo2(ground=False)

    state = P.init_plant(dyn, z=1.0)
    bridge.set_q_pin(np.asarray(state.q))

    rng = np.random.default_rng(1)
    tau_seq = rng.uniform(-3, 3, size=(100, 12))

    for k in range(100):
        state = P.step(dyn, contact, state, jnp.asarray(tau_seq[k], jnp.float32), 1e-3)
        bridge.step(tau_seq[k])

    q_mj, dq_mj = bridge.get_q_dq_pin()
    q_jax = np.asarray(state.q, float)
    dq_jax = np.asarray(state.dq, float)
    # different integrators (semi-implicit vs RK-ish) and f32 vs f64: expect
    # millimeter/millirad agreement after 100 ms of torqued free fall
    np.testing.assert_allclose(q_jax[0:3], q_mj[0:3], atol=5e-3)
    np.testing.assert_allclose(q_jax[3:7], q_mj[3:7], atol=5e-3)
    np.testing.assert_allclose(q_jax[7:], q_mj[7:], atol=2e-2)
    np.testing.assert_allclose(dq_jax, dq_mj, atol=0.15)


def test_standing_contact_forces_similar():
    """With ground: both plants settle to ~weight-supporting normal forces."""
    import mujoco as mj

    dyn = D.build_dyn()
    contact = P.default_contact()
    bridge = MujocoGo2(ground=True)

    state = P.init_plant(dyn, contact=contact)
    bridge.set_q_pin(np.asarray(state.q))

    for _ in range(300):  # 0.3 s settle under zero torque, both sims
        state = P.step(dyn, contact, state, jnp.zeros(12), 1e-3)
        bridge.step(np.zeros(12))

    # both should still be near the standing height (legs buckle slowly
    # without control; 0.3 s is short enough)
    q_mj, _ = bridge.get_q_dq_pin()
    assert abs(float(state.q[2]) - q_mj[2]) < 0.1
