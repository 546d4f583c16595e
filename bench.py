"""Benchmark: batched closed-loop MPC throughput on one chip.

Measures full engine cycles (reference regeneration + QP assembly + ADMM
solve + 20 x 1 kHz leg-control/physics ticks) for a sharded scenario batch
and reports MPC solves/s/chip — the BASELINE.json primary metric. One cycle
= one 16-step-horizon QP solve + 20 rollout steps per scenario.

vs_baseline: the reference runs ONE robot at its 48 Hz MPC rate on a CPU
(real-time budget 20.8 ms/solve, README.md:177-184 — barely met). Each
multiple of 48 solves/s equals one more real-time robot served per chip.

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    batch = 512
    windows = 3
    cycles_per_window = 5
    solver_iters = 150  # warm-started regime (see tests/test_qp.py)

    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.sim import engine as E
    from convex_mpc_tpu.sim import physics as P

    dyn = D.build_dyn()
    gait = G.make_gait_params(3.0, 0.6)
    contact = P.default_contact(kn=30000, dn=1000)
    sched = E.constant_schedule(vx=0.5)

    def step(state):
        new_state, _ = E.mpc_cycle(
            dyn, gait, contact, sched, state, n=16, solver_iters=solver_iters
        )
        return new_state

    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    state_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), state
    )
    # small per-scenario variation so nothing collapses to identical work
    xs = jnp.linspace(-0.02, 0.02, batch)
    state_b = state_b._replace(
        plant=state_b.plant._replace(q=state_b.plant.q.at[:, 0].add(xs))
    )

    fn = jax.jit(jax.vmap(step))
    state_b = fn(state_b)  # compile + first step
    for _ in range(2):  # settle warm-start caches
        state_b = fn(state_b)
    jax.block_until_ready(state_b)

    # best-of-N windows: the shared TPU pool shows large interference
    # variance; best-window is the standard defense
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(cycles_per_window):
            state_b = fn(state_b)
        jax.block_until_ready(state_b)
        best = min(best, time.perf_counter() - t0)

    n_dev = max(1, len(set(d for l in jax.tree.leaves(state_b) for d in l.devices())))
    solves_per_s = batch * cycles_per_window / best / n_dev

    # sanity: the batch must still be upright (bench measures *working* control)
    z = np.asarray(state_b.plant.q[:, 2])
    ok = bool(np.isfinite(z).all() and (z > 0.1).all() and (z < 0.6).all())

    print(
        json.dumps(
            {
                "metric": "mpc_solves_per_s_per_chip",
                "value": round(solves_per_s, 1),
                "unit": "solves/s/chip (each = 16-step QP + 20 x 1kHz rollout ticks)",
                "vs_baseline": round(solves_per_s / 48.0, 2),
                "batch": batch,
                "healthy": ok,
            }
        )
    )


if __name__ == "__main__":
    main()
