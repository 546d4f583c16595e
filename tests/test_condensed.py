"""Condensed QP: same optimal forces as the full form, faster solves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_mpc_tpu.control.srb import SrbDynamics
from convex_mpc_tpu.mpc import admm, condensed, qp

import qp_oracle as oracle

Q_DIAG = np.array([1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1], dtype=float)
R_VAL = 1e-5
MU = 0.8
FZ_MIN = 10.0


def make_dyn(sc):
    return SrbDynamics(
        Ad=jnp.asarray(sc["Ad"], jnp.float32),
        Bd=jnp.asarray(sc["Bd"], jnp.float32),
        gd=jnp.asarray(sc["gd"], jnp.float32),
    )


@pytest.fixture(scope="module")
def scenario():
    return oracle.trot_scenario(t0=0.123, vx=0.5, wz=0.5, seed=3)


def test_prediction_operators_match_rollout(scenario):
    from convex_mpc_tpu.control import srb

    dyn = make_dyn(scenario)
    aux = condensed._prediction_operators(dyn, 16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=12), jnp.float32)
    u = jnp.asarray(rng.normal(size=(16, 12)) * 30, jnp.float32)
    xs = srb.rollout(dyn, x0, u)[1:]  # (16, 12)
    xs_c = condensed.recover_states(aux, x0, u.reshape(-1))
    np.testing.assert_allclose(np.asarray(xs_c), np.asarray(xs), rtol=1e-4, atol=2e-3)


def test_condensed_matches_full_forces(scenario):
    sc = scenario
    dyn = make_dyn(sc)
    args = (
        jnp.asarray(sc["x0"], jnp.float32),
        jnp.asarray(sc["x_ref"], jnp.float32),
        jnp.asarray(sc["contact"]),
        jnp.asarray(Q_DIAG, jnp.float32),
        R_VAL,
        MU,
        FZ_MIN,
    )
    full = qp.build_qp(dyn, *args)
    sol_full = admm.solve(full, admm.init_state(full), max_iter=1500)
    _, u_full = qp.split_solution(sol_full.x, 16)

    cond, aux = condensed.build_condensed(dyn, *args)
    sol_cond = admm.solve(cond, admm.init_state(cond), max_iter=1500)
    u_cond = np.asarray(sol_cond.x).reshape(16, 12)

    scale = max(np.abs(np.asarray(u_full)).max(), 1.0)
    err = np.abs(u_cond - np.asarray(u_full)).max() / scale
    assert err < 0.02, f"condensed vs full force mismatch {err:.4f}"

    # recovered states satisfy the dynamics rollout of the forces
    from convex_mpc_tpu.control import srb

    xs = condensed.recover_states(aux, args[0], sol_cond.x)
    xs_ref = srb.rollout(dyn, args[0], jnp.asarray(u_cond))[1:]
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref), atol=5e-3)


def test_condensed_matches_f64_oracle(scenario):
    sc = scenario
    d = oracle.assemble_qp(
        sc["Ad"], sc["Bd"], sc["gd"], sc["x0"], sc["x_ref"], sc["contact"],
        Q_DIAG, R_VAL, MU, FZ_MIN,
    )
    x64, _ = oracle.solve_qp_f64(d["P"], d["q"], d["A"], d["l"], d["u"])
    u_ref = x64[16 * 12:].reshape(16, 12)

    dyn = make_dyn(sc)
    cond, _ = condensed.build_condensed(
        dyn,
        jnp.asarray(sc["x0"], jnp.float32),
        jnp.asarray(sc["x_ref"], jnp.float32),
        jnp.asarray(sc["contact"]),
        jnp.asarray(Q_DIAG, jnp.float32),
        R_VAL, MU, FZ_MIN,
    )
    sol = admm.solve(cond, admm.init_state(cond), max_iter=1500)
    u = np.asarray(sol.x).reshape(16, 12)
    err0 = np.abs(u[0] - u_ref[0]).max() / max(np.abs(u_ref[0]).max(), 1.0)
    assert err0 < 0.02, f"condensed vs oracle first-step force parity {err0:.4f}"


def test_condensed_warm_converges_fast(scenario):
    sc = scenario
    dyn = make_dyn(sc)
    args = (
        jnp.asarray(sc["x0"], jnp.float32),
        jnp.asarray(sc["x_ref"], jnp.float32),
        jnp.asarray(sc["contact"]),
        jnp.asarray(Q_DIAG, jnp.float32),
        R_VAL, MU, FZ_MIN,
    )
    cond, _ = condensed.build_condensed(dyn, *args)
    cold = admm.solve(cond, admm.init_state(cond), max_iter=1500)

    sc2 = dict(sc)
    sc2["x0"] = sc["x0"] + np.array([0.01, 0, 0.002, 0, 0, 0, 0.02, 0, 0, 0, 0, 0])
    cond2, _ = condensed.build_condensed(
        dyn, jnp.asarray(sc2["x0"], jnp.float32), *args[1:]
    )
    warm = admm.solve(cond2, cold.state, max_iter=400, check_every=5, eps_dual_abs=6e-4)
    assert int(warm.iters) < 400


def test_structured_build_matches_dense(scenario):
    """build_condensed_structured carries the same QP as build_condensed:
    identical cost/bounds, and its blocks reconstruct the dense A exactly."""
    sc = scenario
    dyn = make_dyn(sc)
    args = (
        jnp.asarray(sc["x0"], jnp.float32),
        jnp.asarray(sc["x_ref"], jnp.float32),
        jnp.asarray(sc["contact"]),
        jnp.asarray(Q_DIAG, jnp.float32),
        R_VAL,
        MU,
        FZ_MIN,
    )
    dense, _ = condensed.build_condensed(dyn, *args)
    struct, _ = condensed.build_condensed_structured(dyn, *args)
    # cost: the structured path builds P/q by the suffix recursion
    # (condensed._cost_suffix_recursion) — same sums in a different f32
    # association order than the Su form, so equality is ulp-class, not
    # bitwise. Tolerances sized to f32 reassociation over n=16-term sums.
    P_d, P_s = np.asarray(dense.p_dense), np.asarray(struct.p_dense)
    np.testing.assert_allclose(P_s, P_d, rtol=0, atol=2e-6 * np.abs(P_d).max())
    q_d, q_s = np.asarray(dense.q), np.asarray(struct.q)
    np.testing.assert_allclose(q_s, q_d, rtol=0, atol=2e-6 * np.abs(q_d).max())
    np.testing.assert_array_equal(np.asarray(dense.l), np.asarray(struct.l))
    np.testing.assert_array_equal(np.asarray(dense.u), np.asarray(struct.u))
    n = 16
    nb = n * 4
    face_rows = np.arange(nb * 4).reshape(nb, 4)
    blk_cols = np.arange(nb * 3).reshape(nb, 3)
    A = np.asarray(dense.A)
    np.testing.assert_array_equal(
        A[face_rows[:, :, None], blk_cols[:, None, :]], np.asarray(struct.C)
    )
    # off-block friction entries are exactly zero; box rows are the identity
    mask = np.zeros_like(A[: nb * 4], dtype=bool)
    mask[face_rows[:, :, None], blk_cols[:, None, :]] = True
    assert (A[: nb * 4][~mask] == 0.0).all()
    np.testing.assert_array_equal(A[nb * 4 :], np.eye(n * 12, dtype=A.dtype))


def test_structured_ruiz_matches_dense(scenario):
    """ruiz_equilibrate_structured reproduces the dense Ruiz scalings at the
    f32 reassociation level (the deferred-scaling form computes the same
    products in a different association order)."""
    sc = scenario
    dyn = make_dyn(sc)
    args = (
        jnp.asarray(sc["x0"], jnp.float32),
        jnp.asarray(sc["x_ref"], jnp.float32),
        jnp.asarray(sc["contact"]),
        jnp.asarray(Q_DIAG, jnp.float32),
        R_VAL,
        MU,
        FZ_MIN,
    )
    dense, _ = condensed.build_condensed(dyn, *args)
    struct, _ = condensed.build_condensed_structured(dyn, *args)
    s_d = admm.ruiz_equilibrate(dense, 10)
    B1 = jax.tree.map(lambda x: x[None], struct)
    s_s = admm.ruiz_equilibrate_structured(
        B1.p_dense, B1.q, B1.C, jnp.ones_like(B1.q), B1.l, B1.u, 10
    )
    np.testing.assert_allclose(np.asarray(s_s.d[0]), np.asarray(s_d.d), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_s.e[0]), np.asarray(s_d.e), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_s.c[0]), np.asarray(s_d.c), rtol=1e-5)
    n = 16
    nb = n * 4
    face_rows = np.arange(nb * 4).reshape(nb, 4)
    blk_cols = np.arange(nb * 3).reshape(nb, 3)
    A_s = np.asarray(s_d.A)
    np.testing.assert_allclose(
        A_s[face_rows[:, :, None], blk_cols[:, None, :]], np.asarray(s_s.C[0]),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.diagonal(A_s[nb * 4 :]), np.asarray(s_s.box_diag[0]), rtol=1e-5, atol=1e-7
    )
