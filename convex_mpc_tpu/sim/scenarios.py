"""Scenario batches: gait x velocity-command x terrain sweeps.

The BASELINE configs this framework targets (BASELINE.json):
- batched velocity-command sweeps (1k+ parallel (vx, vy, wz) scenarios),
- friction/terrain randomization batches (per-scenario mu, stiffness),
- multi-gait duty/frequency variants,
all running concurrently as one vmapped (and mesh-sharded) closed loop.

A ``ScenarioBatch`` is just a pytree whose leaves carry a leading batch
axis for everything the engine parameterizes per scenario: gait parameters,
contact/terrain parameters, command schedules, and the engine state itself.
``simulate_batch`` vmaps the engine over it; combine with
``parallel.mesh.shard_batch`` to spread the batch over a pod slice.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from convex_mpc_tpu.control import gait as G
from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.sim import engine as E
from convex_mpc_tpu.sim import physics as P


class ScenarioBatch(NamedTuple):
    gait: G.GaitParams  # leaves (B, ...)
    contact: P.ContactParams  # leaves (B,)
    sched: E.CommandSchedule  # leaves (B, K)
    state: E.EngineState  # leaves (B, ...)

    @property
    def size(self) -> int:
        return self.sched.t_start.shape[0]


def _tile(tree, b: int):
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (b,) + jnp.shape(x)).copy(), tree)


def make_batch(
    dyn: D.Go2Dyn,
    commands: np.ndarray,  # (B, 3) [vx, vy, wz] per scenario
    z_des: float = 0.27,
    gait_hz: np.ndarray | float = 3.0,  # scalar or (B,)
    gait_duty: np.ndarray | float = 0.6,
    mu: np.ndarray | float = 0.8,
    kn: np.ndarray | float = 30000.0,
    dn: np.ndarray | float = 1000.0,
    n_horizon: int = 16,
) -> ScenarioBatch:
    """Build a batch from per-scenario commands and (optionally) per-scenario
    gait/terrain parameters."""
    commands = np.atleast_2d(np.asarray(commands, np.float32))
    b = commands.shape[0]

    def vec(v):
        return jnp.asarray(np.broadcast_to(np.asarray(v, np.float32), (b,)))

    gait = G.GaitParams(
        period=1.0 / vec(gait_hz),
        duty=vec(gait_duty),
        phase_offset=jnp.broadcast_to(jnp.asarray([0.5, 0.0, 0.0, 0.5]), (b, 4)),
        swing_height=vec(0.1),
        touchdown_z=vec(0.02),
    )
    base = P.default_contact()
    contact = P.ContactParams(
        kn=vec(kn),
        dn=vec(dn),
        mu=vec(mu),
        vtol=vec(float(base.vtol)),
        ground_z=vec(0.0),
        foot_radius=vec(float(base.foot_radius)),
        armature=vec(float(base.armature)),
        joint_damping=vec(float(base.joint_damping)),
    )
    sched = E.CommandSchedule(
        t_start=jnp.zeros((b, 1)),
        t_end=jnp.full((b, 1), 1e9),
        vx=jnp.asarray(commands[:, 0:1]),
        vy=jnp.asarray(commands[:, 1:2]),
        z_pos=jnp.full((b, 1), z_des),
        yaw_rate=jnp.asarray(commands[:, 2:3]),
    )
    state = _tile(E.init_state(dyn, n=n_horizon), b)
    plant = _tile(P.init_plant(dyn), b)
    state = state._replace(plant=plant)
    return ScenarioBatch(gait=gait, contact=contact, sched=sched, state=state)


def velocity_sweep(
    dyn: D.Go2Dyn,
    n: int,
    vx_range=(-0.3, 0.8),
    vy_range=(-0.2, 0.2),
    wz_range=(-1.5, 1.5),
    seed: int = 0,
    **kw,
) -> ScenarioBatch:
    """BASELINE config 3: n parallel (vx, vy, wz) scenarios, shared gait."""
    rng = np.random.default_rng(seed)
    cmds = np.stack(
        [
            rng.uniform(*vx_range, size=n),
            rng.uniform(*vy_range, size=n),
            rng.uniform(*wz_range, size=n),
        ],
        axis=1,
    )
    return make_batch(dyn, cmds, **kw)


def friction_randomization(
    dyn: D.Go2Dyn,
    n: int,
    mu_range=(0.4, 1.0),
    kn_range=(15000.0, 45000.0),
    vx: float = 0.5,
    seed: int = 0,
    **kw,
) -> ScenarioBatch:
    """BASELINE config 4: domain-randomized terrain, fixed forward command."""
    rng = np.random.default_rng(seed)
    cmds = np.tile([vx, 0.0, 0.0], (n, 1))
    return make_batch(
        dyn,
        cmds,
        mu=rng.uniform(*mu_range, size=n),
        kn=rng.uniform(*kn_range, size=n),
        **kw,
    )


def gait_sweep(
    dyn: D.Go2Dyn,
    freqs=(2.5, 3.0, 3.5),
    duties=(0.5, 0.6, 0.7),
    vx: float = 0.5,
    **kw,
) -> ScenarioBatch:
    """BASELINE config 5 (gait part): trot duty/frequency variants."""
    hz, duty = np.meshgrid(freqs, duties)
    hz, duty = hz.ravel(), duty.ravel()
    cmds = np.tile([vx, 0.0, 0.0], (len(hz), 1))
    return make_batch(dyn, cmds, gait_hz=hz, gait_duty=duty, **kw)


@functools.lru_cache(maxsize=64)
def _make_batch_runner(n_cycles, solver_iters, collect_logs, adaptive, ck_items):
    """Compiled-runner cache for ``simulate_batch``.

    Repeated calls with the same static configuration (e.g.
    ``tools/long_sweep.py`` invoking ``simulate_batch`` once per checkpoint
    chunk) reuse ONE jitted program instead of building a fresh ``jax.jit``
    — and therefore retracing + recompiling — on every call. ``dyn`` is a
    traced argument (``in_axes=None``), not a closure constant, so the cache
    is valid for any Go2Dyn of the same shapes.
    """
    cycle_kwargs = dict(ck_items)

    if adaptive:

        def run(dyn, gait, contact, sched, state):
            def body(s, _):
                s2, log = E.mpc_cycle_batch(
                    dyn, gait, contact, sched, s,
                    solver_iters=solver_iters, **cycle_kwargs,
                )
                return s2, (log if collect_logs else None)

            return jax.lax.scan(body, state, None, length=n_cycles)

        return jax.jit(run)

    def one(dyn, gait, contact, sched, state):
        def body(s, _):
            s2, log = E.mpc_cycle_fixed(
                dyn, gait, contact, sched, s,
                solver_iters=solver_iters, **cycle_kwargs,
            )
            return s2, (log if collect_logs else None)

        state, logs = jax.lax.scan(body, state, None, length=n_cycles)
        return state, logs

    return jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0, 0)))


def simulate_batch(
    dyn: D.Go2Dyn,
    batch: ScenarioBatch,
    n_cycles: int,
    solver_iters: int = 300,
    collect_logs: bool = False,
    adaptive: bool = False,
    **cycle_kwargs,
):
    """Run every scenario for n_cycles MPC periods (vmapped, jitted).

    Returns (ScenarioBatch with advanced states, metrics dict). Metrics are
    per-scenario: final height, mean |velocity error|, upright flag.

    ``adaptive=True`` runs the production batch-global adaptive solver
    (``engine.mpc_cycle_batch`` / ``admm.solve_adaptive``) instead of the
    vmapped fixed-iteration path: ``solver_iters`` becomes the escalation
    cap, steady cycles converge early, and the QP solve is one XLA program
    over the whole batch.
    """
    runner = _make_batch_runner(
        n_cycles, solver_iters, collect_logs, adaptive,
        tuple(sorted(cycle_kwargs.items())),
    )
    states, logs = runner(
        dyn, batch.gait, batch.contact, batch.sched, batch.state
    )
    new_batch = batch._replace(state=states)

    q = states.plant.q
    cmd_now = jax.vmap(lambda s, st: E.lookup_command(s, st.t))(batch.sched, states)
    vf = states.vel_filt
    # commands are body-frame: rotate the world-frame filtered velocity into
    # the body frame with the accumulated yaw (turning scenarios reach
    # arbitrary headings, so the small-yaw world~body shortcut is wrong)
    yaw = states.yaw_cont
    c, s_ = jnp.cos(yaw), jnp.sin(yaw)
    vx_b = c * vf[:, 0] + s_ * vf[:, 1]
    metrics = {
        "height": q[:, 2],
        "upright": (q[:, 2] > 0.12) & (jnp.abs(states.plant.dq).max(axis=1) < 30.0),
        "vx_err": jnp.abs(vx_b - cmd_now.vx),
        "wz_err": jnp.abs(vf[:, 5] - cmd_now.yaw_rate),
    }
    return new_batch, metrics, logs
