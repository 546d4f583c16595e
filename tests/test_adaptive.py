"""Tests for the batch-global adaptive ADMM solver (admm.solve_adaptive) and
the batched engine cycle built on it (engine.mpc_cycle_batch).

The adaptive solver is the TPU re-architecture of OSQP's runtime behavior
(reference centroidal_mpc.py:20-38: check_termination, adaptive_rho with
refactor-on-update, scaled termination): chunked while_loop with early exit,
per-scenario rho descent with revert, refactor-on-demand, and a fixed-point
stall exit calibrated far inside the 2% force-parity budget.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from convex_mpc_tpu.control import gait as G
from convex_mpc_tpu.control import reference as R
from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.mpc import admm, condensed
from convex_mpc_tpu.sim import engine as E
from convex_mpc_tpu.sim import physics as P


@pytest.fixture(scope="module")
def dyn():
    return D.build_dyn()


@pytest.fixture(scope="module")
def qp_batch(dyn):
    """A batch of real mid-trot condensed QPs (B=6) + cold start states."""
    gait = G.make_gait_params(3.0, 0.6)
    sched = E.constant_schedule(vx=0.5)
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn))
    for _ in range(8):
        state, _ = E.mpc_cycle(dyn, gait, P.default_contact(), sched, state)
    cmd = E.lookup_command(sched, state.t)
    obs, _, _ = E.observe(dyn, state.plant, state.yaw_cont, state.yaw_prev, state.vel_filt)
    traj, _ = R.generate(state.refgen, gait, obs, cmd, state.t, (1 / 3.0) / 16, 16)
    p0 = traj.x0[0:3]
    qd = jnp.asarray([1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1], jnp.float32)

    def build_one(dx):
        x0 = traj.x0.at[0:3].set(0.0).at[6].add(dx)
        d, _ = condensed.build_condensed(
            traj.dyn, x0, traj.x_ref.at[:, 0:3].add(-p0), traj.contact, qd,
            1e-5, 0.8, 10.0,
        )
        return d

    B = 6
    data_b = jax.vmap(build_one)(jnp.linspace(-0.02, 0.02, B))
    cold = jax.vmap(lambda _: admm.init_state(jax.tree.map(lambda x: x[0], data_b)))(
        jnp.arange(B)
    )
    return data_b, cold


def test_adaptive_matches_f64_oracle(qp_batch):
    """Forces from the adaptive solver within the 2% budget of the f64 oracle
    (measured margin ~100x) on every batch element."""
    import qp_oracle as O

    data_b, cold = qp_batch
    sol = admm.solve_adaptive(data_b, cold, max_iter=1000, box_tail=192)
    B = data_b.q.shape[0]
    for i in range(B):
        d = jax.tree.map(lambda x: np.asarray(x[i], float), data_b)
        xo, _ = O.solve_qp_f64(d.p_dense, d.q, d.A, d.l, d.u, max_iter=20000)
        f_ref = xo[:12]
        f = np.asarray(sol.x[i, :12])
        scale = max(np.abs(f_ref).max(), 1.0)
        assert np.abs(f - f_ref).max() / scale < 0.02, i


def test_adaptive_early_exit_and_warm_restart(qp_batch):
    """Cold solves exit well before max_iter; re-solving the same QP from the
    returned state converges in a single chunk."""
    data_b, cold = qp_batch
    sol = admm.solve_adaptive(data_b, cold, max_iter=1000, check_every=25, box_tail=192)
    it = np.asarray(sol.iters)
    assert (it < 1000).all(), it  # every scenario exited early
    # cold starts pay the full accuracy-gated rho walk (300 descent iters +
    # settling); the early-exit payoff is on warm cycles (asserted below)
    assert it.mean() <= 450
    sol2 = admm.solve_adaptive(data_b, sol.state, max_iter=1000, check_every=25, box_tail=192)
    it2 = np.asarray(sol2.iters)
    assert (it2 <= 50).all(), it2
    # and the re-solve does not move the forces
    df = np.abs(np.asarray(sol2.x[:, :12]) - np.asarray(sol.x[:, :12])).max()
    assert df < 0.5  # Newtons


def test_adaptive_matches_segment_solver(qp_batch):
    """Adaptive and fixed-segment solvers agree on the optimum."""
    data_b, cold = qp_batch
    ref = jax.vmap(
        lambda d, w: admm.solve(d, w, max_iter=1600, scaled_termination=True, box_tail=192)
    )(data_b, cold)
    ada = admm.solve_adaptive(data_b, cold, max_iter=1000, box_tail=192)
    f_ref = np.asarray(ref.x[:, :12])
    f_ada = np.asarray(ada.x[:, :12])
    assert np.abs(f_ada - f_ref).max() / np.abs(f_ref).max() < 0.005


def test_mpc_cycle_batch_trots(dyn):
    """1.2 s closed-loop trot through the batched adaptive engine path:
    upright, tracking, and mean iteration count far below the budget."""
    B = 3
    contact = P.default_contact(kn=30000, dn=1000)
    gait_b = E.broadcast_batch(G.make_gait_params(3.0, 0.6), B)
    contact_b = E.broadcast_batch(contact, B)
    sched_b = E.broadcast_batch(E.constant_schedule(vx=0.4), B)
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    state_b = E.broadcast_batch(state, B)
    state_b = state_b._replace(
        plant=state_b.plant._replace(
            q=state_b.plant.q.at[:, 0].add(jnp.linspace(-0.02, 0.02, B))
        )
    )
    iters = []
    for _ in range(60):
        state_b, log = E.mpc_cycle_batch(
            dyn, gait_b, contact_b, sched_b, state_b, solver_iters=600
        )
        iters.append(np.asarray(log.solver_iters))
    z = np.asarray(state_b.plant.q[:, 2])
    assert (z > 0.15).all() and (z < 0.45).all(), z
    vx = np.asarray(state_b.vel_filt[:, 0])
    assert (np.abs(vx - 0.4) < 0.35).all(), vx
    it = np.stack(iters)
    assert it.mean() < 250, it.mean()
    assert (it <= 600).all()


def test_mpc_cycle_batch_matches_single(dyn):
    """One batched cycle produces the same applied forces as the per-scenario
    path within the solver's own stall tolerance."""
    contact = P.default_contact(kn=30000, dn=1000)
    gait = G.make_gait_params(3.0, 0.6)
    sched = E.constant_schedule(vx=0.4)
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    # a few single-path cycles to reach a representative state
    for _ in range(5):
        state, _ = E.mpc_cycle(dyn, gait, contact, sched, state, solver_iters=400)
    B = 2
    state_b = E.broadcast_batch(state, B)
    s1, log1 = E.mpc_cycle_batch(
        dyn, E.broadcast_batch(gait, B), E.broadcast_batch(contact, B),
        E.broadcast_batch(sched, B), state_b, solver_iters=800,
    )
    s2, log2 = E.mpc_cycle(dyn, gait, contact, sched, state, solver_iters=800)
    u_batch = np.asarray(s1.u0[0])
    u_single = np.asarray(s2.u0)
    assert np.abs(u_batch - u_single).max() < 2.0, (u_batch, u_single)  # Newtons


def test_structured_qp_matches_dense_path(qp_batch, dyn):
    """solve_adaptive on condensed.StructuredQp returns the same solution as
    on the dense QpData (the dense path extracts the same blocks and both
    run the identical structured internals)."""
    data_b, cold = qp_batch
    n = 16
    nb = n * 4
    face_rows = np.arange(nb * 4).reshape(nb, 4)
    blk_cols = np.arange(nb * 3).reshape(nb, 3)
    fr = jnp.asarray(face_rows)
    bc = jnp.asarray(blk_cols)
    C = data_b.A[:, fr[:, :, None], bc[:, None, :]]
    struct = condensed.StructuredQp(
        p_diag=data_b.p_diag, q=data_b.q, C=C, l=data_b.l, u=data_b.u,
        p_dense=data_b.p_dense,
    )
    sol_d = admm.solve_adaptive(data_b, cold, max_iter=600, box_tail=192)
    sol_s = admm.solve_adaptive(struct, cold, max_iter=600, box_tail=192)
    np.testing.assert_array_equal(np.asarray(sol_d.iters), np.asarray(sol_s.iters))
    np.testing.assert_allclose(
        np.asarray(sol_d.x), np.asarray(sol_s.x), rtol=0, atol=1e-5
    )


@pytest.mark.parametrize("n", [10, 24])
def test_mpc_cycle_batch_horizons(dyn, n):
    """The structured adaptive path is horizon-generic: n=24 exercises the
    nz%32==0 SPD-kernel-eligible branch (XLA fallback on CPU), n=10 the
    non-divisible fallback branch."""
    B = 2
    gait_b = E.broadcast_batch(G.make_gait_params(3.0, 0.6), B)
    contact_b = E.broadcast_batch(P.default_contact(), B)
    sched_b = E.broadcast_batch(E.constant_schedule(vx=0.3), B)
    state = E.init_state(dyn, n=n)
    state = state._replace(plant=P.init_plant(dyn))
    sb = E.broadcast_batch(state, B)
    mpc_dt = (1.0 / 3.0) / n
    s = sb
    for _ in range(6):
        s, log = E.mpc_cycle_batch(
            dyn, gait_b, contact_b, sched_b, s, n=n, solver_iters=400,
            mpc_dt=mpc_dt,
        )
    z = np.asarray(s.plant.q[:, 2])
    assert np.isfinite(z).all() and (z > 0.15).all() and (z < 0.45).all(), z


def test_adaptive_pallas_path_matches_xla(qp_batch):
    """solve_adaptive(use_pallas=True) == use_pallas=False end to end: the
    iteration engines are bitwise twins (mpc/kernels.py), and everything
    else (Ruiz, factorization, accept gates, polish) is shared. On TPU the
    outputs are bitwise identical (tools/check_bitexact_tpu.py asserts it
    there); on CPU the interpret-mode kernel picks up ulp-level FMA-fusion
    differences, so assert tight allclose plus identical accept decisions.
    """
    data_b, cold = qp_batch
    sol_x = admm.solve_adaptive(data_b, cold, max_iter=200, box_tail=192)
    sol_p = admm.solve_adaptive(data_b, cold, max_iter=200, box_tail=192,
                                use_pallas=True)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        np.testing.assert_array_equal(
            np.asarray(sol_x.iters), np.asarray(sol_p.iters)
        )
    else:
        # CPU iterates differ at ulp level; an accept-threshold comparison at
        # the boundary can flip one check_every chunk of iterations
        assert (
            np.abs(np.asarray(sol_x.iters) - np.asarray(sol_p.iters)) <= 25
        ).all()
    for name in ("x", "z", "y", "rho"):
        a = np.asarray(getattr(sol_x.state, name))
        b = np.asarray(getattr(sol_p.state, name))
        if on_tpu:
            assert np.array_equal(a.view(np.uint32), b.view(np.uint32)), name
        else:
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(a, b, atol=1e-5 * scale, rtol=0)
