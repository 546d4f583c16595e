"""Scenario batch API: sweeps build, vmap-run, and report sane metrics."""

import numpy as np
import pytest

from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.sim import scenarios as S


@pytest.fixture(scope="module")
def dyn():
    return D.build_dyn()


def test_velocity_sweep_runs(dyn):
    batch = S.velocity_sweep(dyn, 6, vx_range=(0.0, 0.5), vy_range=(0, 0), wz_range=(-1, 1))
    assert batch.size == 6
    batch, metrics, _ = S.simulate_batch(dyn, batch, n_cycles=10, solver_iters=300)
    assert metrics["height"].shape == (6,)
    assert bool(np.asarray(metrics["upright"]).all())
    # ~0.2 s in: heights still near standing
    np.testing.assert_allclose(np.asarray(metrics["height"]), 0.29, atol=0.05)


def test_friction_randomization_per_scenario_params(dyn):
    batch = S.friction_randomization(dyn, 5, mu_range=(0.5, 1.0), seed=1)
    mus = np.asarray(batch.contact.mu)
    assert len(np.unique(mus)) == 5
    assert (mus >= 0.5).all() and (mus <= 1.0).all()
    batch, metrics, _ = S.simulate_batch(dyn, batch, n_cycles=6, solver_iters=250)
    assert bool(np.asarray(metrics["upright"]).all())


def test_gait_sweep_shapes(dyn):
    batch = S.gait_sweep(dyn, freqs=(2.5, 3.0), duties=(0.6, 0.7))
    assert batch.size == 4
    periods = np.asarray(batch.gait.period)
    assert set(np.round(1 / periods, 2)) == {2.5, 3.0}


def test_adaptive_batch_path_and_runner_cache(dyn):
    """adaptive=True runs the batch-global solver (engine.mpc_cycle_batch);
    repeated same-config calls reuse one compiled runner (the long_sweep
    per-chunk pattern must not retrace/recompile every chunk)."""
    batch = S.velocity_sweep(dyn, 4, vx_range=(0.0, 0.4), vy_range=(0, 0), wz_range=(0, 0))
    S._make_batch_runner.cache_clear()
    batch, metrics, _ = S.simulate_batch(
        dyn, batch, n_cycles=4, solver_iters=300, adaptive=True
    )
    assert bool(np.asarray(metrics["upright"]).all())
    batch, metrics, _ = S.simulate_batch(
        dyn, batch, n_cycles=4, solver_iters=300, adaptive=True
    )
    assert bool(np.asarray(metrics["upright"]).all())
    info = S._make_batch_runner.cache_info()
    assert info.hits >= 1 and info.misses == 1
