"""Closed-loop integration tests: standing balance, forward trot, turning.

These run the full engine (reference generation -> QP -> ADMM -> leg control
-> physics at 1 kHz) for short horizons on CPU. Tolerances are deliberately
loose — they catch regressions in stability, not exact trajectories (the
reference's own verification is behavioral, SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_mpc_tpu.control import gait as G
from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.sim import engine as E
from convex_mpc_tpu.sim import physics as P


@pytest.fixture(scope="module")
def setup():
    dyn = D.build_dyn()
    contact = P.default_contact(kn=30000, dn=1000)
    return dyn, contact


def run(dyn, contact, gait, sched, n_cycles, **kw):
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    state, logs = E.simulate(
        dyn, gait, contact, sched, state, n_cycles=n_cycles, solver_iters=600, **kw
    )
    return state, np.asarray(logs.ticks.x_vec).reshape(-1, 12), logs


def test_standing_balance(setup):
    dyn, contact = setup
    gait = G.make_gait_params(3.0, 0.9999)  # all-stance
    _, x, _ = run(dyn, contact, gait, E.constant_schedule(), 48)  # 1 s
    assert np.isfinite(x).all()
    tail = x[500:]
    assert abs(tail[:, 2].mean() - 0.27) < 0.02  # COM height near target
    assert np.abs(tail[:, 3:5]).max() < 0.05  # level attitude
    assert np.abs(tail[:, 6:8]).max() < 0.1  # not drifting


def test_forward_trot(setup):
    dyn, contact = setup
    gait = G.make_gait_params(3.0, 0.6)
    _, x, logs = run(dyn, contact, gait, E.constant_schedule(vx=0.5), 96)  # 2 s
    assert np.isfinite(x).all()
    tail = x[1000:]
    assert 0.3 < tail[:, 6].mean() < 0.75  # tracks ~0.5 m/s forward
    assert abs(tail[:, 2].mean() - 0.27) < 0.03
    assert np.abs(tail[:, 3:5]).max() < 0.3  # stays upright
    # solver healthy: primal feasibility tight (force accuracy is certified
    # against the f64 oracle in tools/parity_sweep.py; the scaled-termination
    # indicator is conservative in the pinned-low-rho regime)
    assert np.asarray(logs.prim_res)[4:].max() < 1e-2


def test_turn_in_place(setup):
    dyn, contact = setup
    gait = G.make_gait_params(3.0, 0.6)
    _, x, _ = run(dyn, contact, gait, E.constant_schedule(wz=1.5), 96)  # 2 s
    assert np.isfinite(x).all()
    tail = x[1000:]
    assert 1.0 < tail[:, 11].mean() < 2.0  # tracks the yaw rate
    assert np.abs(tail[:, 3:5]).max() < 0.2
    # yaw actually accumulates (continuous, unwrapped)
    assert x[-1, 5] > 1.5


def test_engine_vmap_batch(setup):
    dyn, contact = setup
    gait = G.make_gait_params(3.0, 0.6)
    sched = E.constant_schedule(vx=0.3)

    def rollout_one(seed):
        state = E.init_state(dyn, n=16)
        plant = P.init_plant(dyn, contact=contact)
        # tiny per-scenario perturbation
        q = plant.q.at[0].add(seed * 0.01)
        state = state._replace(plant=plant._replace(q=q))
        state, _ = E.simulate(
            dyn, gait, contact, sched, state, n_cycles=4, solver_iters=200
        )
        return state.plant.q

    qs = jax.vmap(rollout_one)(jnp.arange(3.0))
    assert qs.shape == (3, 19)
    assert bool(jnp.all(jnp.isfinite(qs)))


def test_bound_gait(setup):
    # beyond the reference's trot: bound (front/rear pairs in antiphase)
    dyn, contact = setup
    import jax.numpy as jnp

    gait = G.GaitParams(
        period=jnp.asarray(1.0 / 3.0),
        duty=jnp.asarray(0.65),
        phase_offset=jnp.asarray([0.0, 0.0, 0.5, 0.5]),
        swing_height=jnp.asarray(0.1),
        touchdown_z=jnp.asarray(0.02),
    )
    _, x, _ = run(dyn, contact, gait, E.constant_schedule(vx=0.3), 96)
    assert np.isfinite(x).all()
    tail = x[1000:]
    assert 0.15 < tail[:, 6].mean() < 0.45
    assert np.abs(tail[:, 3:5]).max() < 0.3
