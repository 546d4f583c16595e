"""QP assembly + batched ADMM solver tests against the float64 oracle.

Parity target (BASELINE.md): first-step contact forces within 2% of the
reference CasADi/OSQP solution. The oracle here is a float64 solve validated
by independent KKT residuals (<= 1e-7), which pins the same unique optimum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_mpc_tpu.control.srb import SrbDynamics
from convex_mpc_tpu.mpc import admm, qp

import qp_oracle as oracle

Q_DIAG = np.array([1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1], dtype=float)
R_VAL = 1e-5
MU = 0.8
FZ_MIN = 10.0


def build_jax_qp(sc):
    dyn = SrbDynamics(
        Ad=jnp.asarray(sc["Ad"], jnp.float32),
        Bd=jnp.asarray(sc["Bd"], jnp.float32),
        gd=jnp.asarray(sc["gd"], jnp.float32),
    )
    return qp.build_qp(
        dyn,
        jnp.asarray(sc["x0"], jnp.float32),
        jnp.asarray(sc["x_ref"], jnp.float32),
        jnp.asarray(sc["contact"]),
        jnp.asarray(Q_DIAG, jnp.float32),
        R_VAL,
        MU,
        FZ_MIN,
    )


@pytest.fixture(scope="module")
def scenario():
    return oracle.trot_scenario(t0=0.123, vx=0.5, wz=0.5, seed=3)


@pytest.fixture(scope="module")
def oracle_qp(scenario):
    sc = scenario
    return oracle.assemble_qp(
        sc["Ad"], sc["Bd"], sc["gd"], sc["x0"], sc["x_ref"], sc["contact"],
        Q_DIAG, R_VAL, MU, FZ_MIN,
    )


@pytest.fixture(scope="module")
def oracle_sol(oracle_qp):
    d = oracle_qp
    x, y = oracle.solve_qp_f64(d["P"], d["q"], d["A"], d["l"], d["u"])
    res, parts = oracle.kkt_residuals(d["P"], d["q"], d["A"], d["l"], d["u"], x, y)
    assert res < 1e-7, f"oracle failed its own KKT check: {parts}"
    return x, y


def test_assembly_matches_oracle(scenario, oracle_qp):
    data = build_jax_qp(scenario)
    np.testing.assert_allclose(np.asarray(jnp.diag(jnp.asarray(oracle_qp["P"]))), np.diag(oracle_qp["P"]), atol=0)
    np.testing.assert_allclose(np.asarray(data.p_diag), np.diag(oracle_qp["P"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(data.q), oracle_qp["q"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(data.A), oracle_qp["A"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(data.l), oracle_qp["l"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(data.u), oracle_qp["u"], rtol=1e-4, atol=1e-4)


def test_admm_matches_oracle_forces(scenario, oracle_sol):
    x_ref_sol, _ = oracle_sol
    n = scenario["x_ref"].shape[0]
    data = build_jax_qp(scenario)
    sol = admm.solve(data, admm.init_state(data), max_iter=1200)

    _, u_opt = qp.split_solution(sol.x, n)
    _, u_ref = qp.split_solution(jnp.asarray(x_ref_sol), n)
    u_opt, u_ref = np.asarray(u_opt), np.asarray(u_ref)

    # 2% parity on the applied (first-step) forces, relative to force scale
    scale = max(np.abs(u_ref[0]).max(), 1.0)
    err = np.abs(u_opt[0] - u_ref[0]).max() / scale
    assert err < 0.02, f"first-step force parity {err:.4f} > 2%"

    # whole-horizon forces within 2% of scale too
    err_all = np.abs(u_opt - u_ref).max() / max(np.abs(u_ref).max(), 1.0)
    assert err_all < 0.02, f"horizon force parity {err_all:.4f} > 2%"


def test_admm_solution_satisfies_kkt(scenario, oracle_qp):
    d = oracle_qp
    data = build_jax_qp(scenario)
    sol = admm.solve(data, admm.init_state(data), max_iter=1200)
    res, parts = oracle.kkt_residuals(
        d["P"], d["q"], d["A"], d["l"], d["u"], np.asarray(sol.x, float), np.asarray(sol.y, float)
    )
    # f32 solver against f64 data: expect ~1e-2-scale KKT residuals on forces ~100 N
    assert res < 0.5, f"KKT residuals too large: {parts}"


def test_swing_forces_are_zero(scenario):
    n = scenario["x_ref"].shape[0]
    data = build_jax_qp(scenario)
    sol = admm.solve(data, admm.init_state(data), max_iter=800)
    _, u_opt = qp.split_solution(sol.x, n)
    u_opt = np.asarray(u_opt)
    contact = scenario["contact"]
    for k in range(n):
        for leg in range(4):
            if contact[leg, k] == 0:
                np.testing.assert_allclose(u_opt[k, 3 * leg : 3 * leg + 3], 0.0, atol=1e-3)
            else:
                assert u_opt[k, 3 * leg + 2] >= FZ_MIN - 1e-2


def test_friction_cone_respected(scenario):
    n = scenario["x_ref"].shape[0]
    data = build_jax_qp(scenario)
    sol = admm.solve(data, admm.init_state(data), max_iter=800)
    _, u_opt = qp.split_solution(sol.x, n)
    u_opt = np.asarray(u_opt)
    for k in range(n):
        for leg in range(4):
            if scenario["contact"][leg, k] == 1:
                fx, fy, fz = u_opt[k, 3 * leg : 3 * leg + 3]
                assert abs(fx) <= MU * fz + 1e-2
                assert abs(fy) <= MU * fz + 1e-2


def test_warm_start_speeds_convergence(scenario):
    data = build_jax_qp(scenario)
    cold = admm.solve(data, admm.init_state(data), max_iter=1200, check_every=5)

    # perturb x0 slightly (next control step) and re-solve warm vs cold
    sc2 = dict(scenario)
    sc2["x0"] = scenario["x0"] + np.array([0.01, 0, 0.002, 0, 0, 0, 0.02, 0, 0, 0, 0, 0])
    data2 = build_jax_qp(sc2)
    warm = admm.solve(data2, cold.state, max_iter=1200, check_every=5)
    cold2 = admm.solve(data2, admm.init_state(data2), max_iter=1200, check_every=5)
    assert int(warm.iters) <= int(cold2.iters)
    assert int(warm.iters) < 1200  # converged


def test_batched_solve_matches_single():
    scs = [oracle.trot_scenario(t0=0.05 * i, vx=0.2 + 0.1 * i, seed=i) for i in range(4)]
    datas = [build_jax_qp(s) for s in scs]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    states = jax.vmap(admm.init_state)(batch)
    bsol = admm.solve_batch(batch, states, max_iter=600)
    for i, d in enumerate(datas):
        single = admm.solve(d, admm.init_state(d), max_iter=600)
        # both runs approximate the same optimum to ~N-level force accuracy;
        # vmapped linear algebra need not be bitwise identical to single
        np.testing.assert_allclose(
            np.asarray(bsol.x[i]), np.asarray(single.x), atol=0.5
        )


def test_all_swing_freefall():
    # degenerate: no stance legs anywhere -> forces pinned to 0, states follow
    # gravity free-fall (probe from the verify skill)
    sc = oracle.trot_scenario(seed=9)
    sc["contact"] = np.zeros_like(sc["contact"])
    data = build_jax_qp(sc)
    sol = admm.solve(data, admm.init_state(data), max_iter=800)
    n = sc["x_ref"].shape[0]
    x_opt, u_opt = qp.split_solution(sol.x, n)
    np.testing.assert_allclose(np.asarray(u_opt), 0.0, atol=1e-3)
    # z velocity after k steps ~ v0 - 9.81 * k * dt
    vz = np.asarray(x_opt)[:, 8]
    dt = sc["dt"]
    want = sc["x0"][8] - 9.81 * dt * (np.arange(n) + 1)
    np.testing.assert_allclose(vz, want, atol=5e-3)
