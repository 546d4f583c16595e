"""SRB dynamics: closed-form ZOH vs the reference's own scipy discretization.

The reference discretizes with scipy.signal.cont2discrete (ZOH) per step plus
a 50-point trapezoid of expm for gravity (com_trajectory.py:272-286). Because
Ac is nilpotent the closed form used here is *exact* — it must match scipy to
solver precision and beat the trapezoid approximation of gd.
"""

import jax.numpy as jnp
import numpy as np
from scipy.linalg import expm
from scipy.signal import cont2discrete

from convex_mpc_tpu.control import srb


def _random_setup(seed, n=16):
    rng = np.random.default_rng(seed)
    yaw = float(rng.uniform(-3, 3))
    r = rng.normal(size=(n, 4, 3)) * 0.3
    # zero some levers like swing legs
    r[rng.uniform(size=(n, 4)) < 0.4] = 0.0
    mass = float(rng.uniform(10, 20))
    # realistic, well-conditioned centroidal inertia (order of the Go2's ~0.1 kg m^2)
    P = rng.normal(size=(3, 3)) * 0.02
    inertia = np.diag(rng.uniform(0.05, 0.3, size=3)) + P @ P.T
    dt = float(rng.uniform(0.01, 0.03))
    return yaw, r, mass, inertia, dt


def _numpy_continuous(yaw, r_step, mass, inertia):
    Rz = np.array([[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
    Ac = np.zeros((12, 12))
    Ac[0:3, 6:9] = np.eye(3)
    Ac[3:6, 9:12] = Rz.T
    I_inv = np.linalg.inv(inertia)

    def skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    Bc = np.zeros((12, 12))
    for leg in range(4):
        Bc[6:9, 3 * leg : 3 * leg + 3] = np.eye(3) / mass
        Bc[9:12, 3 * leg : 3 * leg + 3] = I_inv @ skew(r_step[leg])
    gc = np.zeros(12)
    gc[8] = -9.81
    return Ac, Bc, gc


def test_nilpotency():
    Ac = np.asarray(srb.continuous_A(0.7))
    np.testing.assert_allclose(Ac @ Ac, np.zeros((12, 12)), atol=1e-12)


def test_continuous_matches_oracle():
    yaw, r, mass, inertia, _ = _random_setup(0, n=4)
    Ac_ref, Bc_ref, gc_ref = _numpy_continuous(yaw, r[2], mass, inertia)
    np.testing.assert_allclose(np.asarray(srb.continuous_A(yaw)), Ac_ref, atol=1e-6)
    got_B = np.asarray(srb.continuous_B(jnp.asarray(r[2]), mass, jnp.asarray(inertia)))
    np.testing.assert_allclose(got_B, Bc_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(srb.continuous_g()), gc_ref, atol=0)


def test_closed_form_zoh_matches_scipy():
    for seed in range(5):
        yaw, r, mass, inertia, dt = _random_setup(seed)
        dyn = srb.discretize(yaw, jnp.asarray(r), mass, jnp.asarray(inertia), dt)
        Ad = np.asarray(dyn.Ad)
        Bd = np.asarray(dyn.Bd)

        for i in range(r.shape[0]):
            Ac, Bc, _ = _numpy_continuous(yaw, r[i], mass, inertia)
            Ad_ref, Bd_ref, *_ = cont2discrete(
                (Ac, Bc, np.eye(12), np.zeros((12, 12))), dt, method="zoh"
            )
            np.testing.assert_allclose(Ad, Ad_ref, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(Bd[i], Bd_ref, rtol=1e-4, atol=1e-6)


def test_closed_form_gravity_is_exact():
    yaw, r, mass, inertia, dt = _random_setup(7)
    dyn = srb.discretize(yaw, jnp.asarray(r), mass, jnp.asarray(inertia), dt)
    Ac, _, gc = _numpy_continuous(yaw, r[0], mass, inertia)

    # exact integral with very fine quadrature (reference uses 50 points)
    n_steps = 20001
    tau = np.linspace(0, dt, n_steps)
    exp_terms = np.stack([expm(Ac * t) @ gc for t in tau], axis=1)
    gd_ref = np.trapezoid(exp_terms, tau, axis=1)
    np.testing.assert_allclose(np.asarray(dyn.gd), gd_ref, rtol=1e-6, atol=1e-8)


def test_rollout_shapes_and_dynamics():
    yaw, r, mass, inertia, dt = _random_setup(3)
    dyn = srb.discretize(yaw, jnp.asarray(r), mass, jnp.asarray(inertia), dt)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=12))
    u = jnp.asarray(np.random.default_rng(1).normal(size=(16, 12)))
    xs = np.asarray(srb.rollout(dyn, x0, u))
    assert xs.shape == (17, 12)
    x1_ref = np.asarray(dyn.Ad) @ np.asarray(x0) + np.asarray(dyn.Bd[0]) @ np.asarray(u[0]) + np.asarray(dyn.gd)
    np.testing.assert_allclose(xs[1], x1_ref, rtol=1e-5, atol=1e-5)
