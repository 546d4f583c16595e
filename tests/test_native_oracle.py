"""Three-way solver agreement: C++ native oracle vs NumPy oracle vs JAX ADMM.

The three implementations share no code; agreement on the same QP instances
pins the true optimum and certifies the 2% force-parity metric.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import qp_oracle as oracle
from convex_mpc_tpu.control.srb import SrbDynamics
from convex_mpc_tpu.mpc import admm, condensed
from convex_mpc_tpu.utils.native_oracle import solve_qp_native

Q_DIAG = np.array([1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1], dtype=float)


@pytest.fixture(scope="module")
def instance():
    sc = oracle.trot_scenario(t0=0.123, vx=0.5, wz=0.5, seed=3)
    d = oracle.assemble_qp(
        sc["Ad"], sc["Bd"], sc["gd"], sc["x0"], sc["x_ref"], sc["contact"],
        Q_DIAG, 1e-5, 0.8, 10.0,
    )
    return sc, d


def test_native_satisfies_kkt(instance):
    _, d = instance
    x, y, info = solve_qp_native(d["P"], d["q"], d["A"], d["l"], d["u"], max_iter=5000)
    assert info["kkt"] < 1e-7, info
    # cross-check with the independent NumPy KKT implementation
    res, parts = oracle.kkt_residuals(d["P"], d["q"], d["A"], d["l"], d["u"], x, y)
    assert res < 1e-6, parts


def test_native_matches_numpy_oracle(instance):
    _, d = instance
    x_cpp, _, _ = solve_qp_native(d["P"], d["q"], d["A"], d["l"], d["u"], max_iter=5000)
    x_np, _ = oracle.solve_qp_f64(d["P"], d["q"], d["A"], d["l"], d["u"])
    u_cpp = x_cpp[192:].reshape(16, 12)
    u_np = x_np[192:].reshape(16, 12)
    np.testing.assert_allclose(u_cpp, u_np, atol=1e-5)


def test_three_way_force_agreement(instance):
    sc, d = instance
    x_cpp, _, _ = solve_qp_native(d["P"], d["q"], d["A"], d["l"], d["u"], max_iter=5000)
    u_cpp = x_cpp[192:].reshape(16, 12)

    dyn = SrbDynamics(
        Ad=jnp.asarray(sc["Ad"], jnp.float32),
        Bd=jnp.asarray(sc["Bd"], jnp.float32),
        gd=jnp.asarray(sc["gd"], jnp.float32),
    )
    cond, _ = condensed.build_condensed(
        dyn,
        jnp.asarray(sc["x0"], jnp.float32),
        jnp.asarray(sc["x_ref"], jnp.float32),
        jnp.asarray(sc["contact"]),
        jnp.asarray(Q_DIAG, jnp.float32),
        1e-5, 0.8, 10.0,
    )
    sol = admm.solve(
        cond, admm.init_state(cond), max_iter=400,
        scaled_termination=True, eps_abs=1e-4, eps_rel=1e-4,
    )
    u_jax = np.asarray(sol.x).reshape(16, 12)
    err = np.abs(u_jax - u_cpp).max() / max(np.abs(u_cpp).max(), 1.0)
    assert err < 0.02, f"TPU solver vs native oracle force parity {err:.4f}"
