"""Config wiring, checkpoint round-trip, profiling stats, horizon sweep."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.sim import engine as E
from convex_mpc_tpu.sim import physics as P
from convex_mpc_tpu.utils import checkpoint as C
from convex_mpc_tpu.utils import profiling as PR
from convex_mpc_tpu.utils.config import (
    DEFAULT_CONFIG,
    EngineConfig,
    GaitConfig,
    MpcConfig,
    contact_from_config,
    engine_kwargs,
    gait_from_config,
)


@pytest.fixture(scope="module")
def dyn():
    return D.build_dyn()


def test_config_driven_cycle(dyn):
    cfg = DEFAULT_CONFIG
    gait = gait_from_config(cfg)
    contact = contact_from_config(cfg)
    kw = engine_kwargs(cfg)
    state = E.init_state(dyn, n=cfg.mpc.horizon, formulation=cfg.solver.formulation)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    state, log = E.mpc_cycle(dyn, gait, contact, E.constant_schedule(), state, **kw)
    assert np.isfinite(np.asarray(log.ticks.x_vec)).all()


@pytest.mark.parametrize("horizon", [10, 24, 32])
def test_horizon_sweep(dyn, horizon):
    """BASELINE config 5: 10-32 step horizons, mpc_dt = gait period / N."""
    cfg = EngineConfig(mpc=MpcConfig(horizon=horizon))
    gait = gait_from_config(cfg)
    contact = contact_from_config(cfg)
    kw = engine_kwargs(cfg)
    # keep the 1 kHz inner rate aligned with the mpc period
    kw["steps_per_mpc"] = max(1, int(round(cfg.mpc_dt * 1000)))
    state = E.init_state(dyn, n=horizon)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    sched = E.constant_schedule(vx=0.3)
    state, logs = E.simulate(dyn, gait, contact, sched, state, n_cycles=12, **kw)
    x = np.asarray(logs.ticks.x_vec)
    assert np.isfinite(x).all()
    assert x[..., 2].min() > 0.15  # stays up through ~0.25 s


def test_checkpoint_roundtrip(dyn):
    state = E.init_state(dyn, n=16)
    state = state._replace(t=jnp.asarray(1.234), u0=jnp.ones((4, 3)) * 7)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt.npz")
        C.save_pytree(path, state)
        like = E.init_state(dyn, n=16)
        restored = C.load_pytree(path, like)
    assert float(restored.t) == pytest.approx(1.234)
    np.testing.assert_allclose(np.asarray(restored.u0), 7.0)
    # full tree equality
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_raises(dyn):
    state = E.init_state(dyn, n=16)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt.npz")
        C.save_pytree(path, state)
        with pytest.raises((ValueError, KeyError)):
            C.load_pytree(path, E.init_state(dyn, n=10))


def test_solve_stats(dyn):
    cfg = DEFAULT_CONFIG
    gait = gait_from_config(cfg)
    contact = contact_from_config(cfg)
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    state, logs = E.simulate(
        dyn, gait, contact, E.constant_schedule(), state, n_cycles=6, solver_iters=300
    )
    stats = PR.SolveStats()
    stats.update(logs, max_iter=300)
    s = stats.summary()
    assert s["cycles"] == 6
    assert 0 < s["iters_mean"] <= 300


def test_plot_dashboards_render(dyn, tmp_path):
    from convex_mpc_tpu.utils import plots as PL
    from convex_mpc_tpu.utils.config import DEFAULT_CONFIG, contact_from_config, gait_from_config

    cfg = DEFAULT_CONFIG
    gait, contact = gait_from_config(cfg), contact_from_config(cfg)
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    state, logs = E.simulate(
        dyn, gait, contact, E.constant_schedule(vx=0.3), state, n_cycles=6, solver_iters=200
    )
    for fn, name in [
        (PL.plot_contact_forces, "forces.png"),
        (PL.plot_mpc_result, "grid.png"),
        (PL.plot_swing_foot_traj, "swing.png"),
    ]:
        out = fn(logs, path=tmp_path / name)
        assert (tmp_path / name).exists() and (tmp_path / name).stat().st_size > 1000
    PL.plot_solver_stats(logs, path=tmp_path / "solver.png")
    assert (tmp_path / "solver.png").exists()
    x = np.asarray(logs.ticks.x_vec).reshape(-1, 12)
    PL.plot_traj_tracking(x, path=tmp_path / "traj.png")
    assert (tmp_path / "traj.png").exists()


def test_full_traj_and_open_loop_plots(dyn, tmp_path):
    """Horizon overlay + open-loop SRB validation (reference test_MPC.py:256-266,
    plot_helper.py:255-304): recover_states must agree with srb.rollout, and
    both dashboards must render."""
    import jax.numpy as jnp

    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.control import reference as R
    from convex_mpc_tpu.control import srb as S
    from convex_mpc_tpu.mpc import admm, condensed
    from convex_mpc_tpu.sim import engine as E2
    from convex_mpc_tpu.utils import plots as PL

    gait = G.make_gait_params(3.0, 0.6)
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn))
    obs, _, _ = E2.observe(dyn, state.plant, state.yaw_cont, state.yaw_prev, state.vel_filt)
    cmd = R.BodyCommand(vx=jnp.asarray(0.4), vy=jnp.asarray(0.0),
                        z_pos=jnp.asarray(0.27), yaw_rate=jnp.asarray(0.0))
    traj, _ = R.generate(state.refgen, gait, obs, cmd, state.t, (1 / 3.0) / 16, 16)
    data, aux = condensed.build_condensed(
        traj.dyn, traj.x0, traj.x_ref, traj.contact,
        jnp.asarray([1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1], jnp.float32),
        1e-5, 0.8, 10.0,
    )
    sol = admm.solve(data, admm.init_state(data), max_iter=300,
                     scaled_termination=True, box_tail=16 * 12)
    x_opt = np.asarray(condensed.recover_states(aux, traj.x0, sol.x))
    x_roll = np.asarray(S.rollout(traj.dyn, traj.x0, sol.x.reshape(16, 12)))
    # the condensation operators and the sequential rollout are independent
    # computations of the same linear dynamics: must agree to f32 accuracy
    assert np.abs(x_opt - x_roll[1:]).max() < 1e-3
    PL.plot_full_traj(x_opt, np.asarray(traj.x_ref), path=tmp_path / "full.png")
    PL.plot_open_loop_validation(x_opt, x_roll, np.asarray(traj.x_ref),
                                 path=tmp_path / "ol.png")
    assert (tmp_path / "full.png").stat().st_size > 1000
    assert (tmp_path / "ol.png").stat().st_size > 1000


def test_command_schedule_lookup_edges():
    sched = E.reference_schedule()
    # inside a phase
    cmd = E.lookup_command(sched, 0.5)
    assert abs(float(cmd.vx) - 0.7) < 1e-6
    # past the end: defaults (reference test_MPC.py:92)
    cmd = E.lookup_command(sched, 99.0)
    assert float(cmd.vx) == 0.0 and abs(float(cmd.z_pos) - 0.27) < 1e-6
    # boundary t_end is exclusive
    cmd = E.lookup_command(sched, 1.0)
    assert float(cmd.vx) == 0.0


def test_ramp_schedule_limits_slew():
    sched = E.reference_schedule()
    ramped = E.ramp_schedule(sched, max_acc=1.5, max_alpha=6.0, step=0.1)
    vx = np.asarray(ramped.vx)
    wz = np.asarray(ramped.yaw_rate)
    # per-0.1s step changes bounded by the slew limits
    assert np.abs(np.diff(vx)).max() <= 1.5 * 0.1 + 1e-6
    assert np.abs(np.diff(wz)).max() <= 6.0 * 0.1 + 1e-6
    # reaches the commanded plateaus
    t = np.asarray(ramped.t_start)
    assert vx[(t > 0.7) & (t < 0.95)].max() > 0.69
    assert wz[(t > 4.5) & (t < 5.9)].max() > 1.99
