"""Benchmark: batched closed-loop MPC throughput on one chip.

Measures full engine cycles (reference regeneration + QP assembly + QP solve
+ 20 x 1 kHz leg-control/physics ticks) for a scenario batch and reports MPC
solves/s/chip — the BASELINE.json primary metric. One cycle = one
16-step-horizon QP + 20 rollout steps per scenario.

Methodology notes:
- The headline uses the PRODUCTION configuration: the batch-global adaptive
  solver (engine.mpc_cycle_batch -> admm.solve_adaptive) with certified
  polish accepts and the escalation cap (max_iter=1000) that completes the
  full 10 s reference command schedule — i.e. the throughput of the
  configuration the robustness claims hold for.
- A timing window is 16 CONSECUTIVE cycles = one full gait period, so every
  contact-mask phase (including the expensive mask-edge warm-start cycles)
  is represented in every window; a short window that samples only
  mid-stance phases overstates throughput by ~10-20%.
- Best-of-3 windows filters the tunnel-attached backend's transient
  throttling (measured 2-4x spikes on identical programs), not workload
  variance — every window already covers all phases.
- The legacy fixed-iteration engine path at 150/400 iters is reported as
  the iters->throughput reference curve.

realtime_robots_per_chip_throughput: the reference never published a solve
time; it runs ONE robot at its 48 Hz MPC rate on a CPU (real-time budget
20.8 ms/solve, README.md:177-184 — barely met as of its changelog). The
field divides throughput by an ASSUMED 48 solves/s per robot (flagged by
assumes_48hz_reference) — a throughput-derived serving equivalent, not a
measured baseline ratio.

Prints exactly one JSON line.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from convex_mpc_tpu.utils.config import DEFAULT_CONFIG

BATCH = int(os.environ.get("BENCH_BATCH", "512"))
# adaptive escalation cap (certified: completes the schedule) — the single
# source of truth is the config tree (SolverConfig.max_iter)
MAX_ITER = DEFAULT_CONFIG.solver.max_iter
WINDOWS = 3
CYCLES_PER_WINDOW = 16  # one full gait period: all contact phases sampled


def main():
    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.sim import engine as E
    from convex_mpc_tpu.sim import physics as P

    dyn = D.build_dyn()
    contact = P.default_contact(kn=30000, dn=1000)
    gait_b = E.broadcast_batch(G.make_gait_params(3.0, 0.6), BATCH)
    contact_b = E.broadcast_batch(contact, BATCH)
    sched_b = E.broadcast_batch(E.constant_schedule(vx=0.5), BATCH)

    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    state_b = E.broadcast_batch(state, BATCH)
    # small per-scenario variation so nothing collapses to identical work
    xs = jnp.linspace(-0.02, 0.02, BATCH)
    state_b = state_b._replace(
        plant=state_b.plant._replace(q=state_b.plant.q.at[:, 0].add(xs))
    )

    from convex_mpc_tpu.utils.config import engine_kwargs_batched

    kw = engine_kwargs_batched(DEFAULT_CONFIG)

    def adaptive_step(s):
        s2, log = E.mpc_cycle_batch(dyn, gait_b, contact_b, sched_b, s, **kw)
        return s2, log.solver_iters

    def fixed_step_fn(iters):
        def step(s):
            s2, _ = E.mpc_cycle_fixed(dyn, G.make_gait_params(3.0, 0.6), contact,
                                E.constant_schedule(vx=0.5), s, n=16,
                                solver_iters=iters)
            return s2, jnp.zeros(())
        return jax.jit(jax.vmap(step))

    def best_window(fn, s, windows=WINDOWS):
        s, aux = fn(s)
        for _ in range(CYCLES_PER_WINDOW - 1):  # settle one full gait period
            s, aux = fn(s)
        jax.block_until_ready(s)
        best = float("inf")
        iters_log = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(CYCLES_PER_WINDOW):
                s, aux = fn(s)
                iters_log.append(aux)
            jax.block_until_ready(s)
            best = min(best, time.perf_counter() - t0)
        return best, s, iters_log

    fn_ada = jax.jit(adaptive_step)
    t_ada, state_ada, iters_log = best_window(fn_ada, state_b)
    solves_ada = BATCH * CYCLES_PER_WINDOW / t_ada
    it = np.concatenate([np.atleast_1d(np.asarray(x)) for x in iters_log])

    # legacy fixed-iteration reference points (iters -> throughput curve).
    # Best-of-3 like the headline: the tunnel-attached backend shows 2-4x
    # transient throttling on identical programs, and a single window would
    # expose the curve to exactly that noise.
    curve = {}
    for iters in (150, 400):
        fn = fixed_step_fn(iters)
        t_fix, _, _ = best_window(fn, state_b)
        curve[f"fixed{iters}_solves_per_s"] = round(
            BATCH * CYCLES_PER_WINDOW / t_fix, 1
        )

    # health: the adaptive-path batch must still be upright after the bench
    z = np.asarray(state_ada.plant.q[:, 2])
    ok = bool(np.isfinite(z).all() and (z > 0.1).all() and (z < 0.6).all())

    print(
        json.dumps(
            {
                "metric": "mpc_solves_per_s_per_chip",
                "value": round(solves_ada, 1),
                "unit": "solves/s/chip (each = 16-step QP + 20 x 1kHz rollout ticks)",
                # the reference never published a solves/s number; this is
                # throughput / one assumed 48 Hz real-time robot, kept as
                # vs_baseline for the driver's schema
                "vs_baseline": round(solves_ada / 48.0, 2),
                "vs_baseline_is_assumed": True,
                "realtime_robots_per_chip_throughput": round(solves_ada / 48.0, 2),
                "assumes_48hz_reference": True,
                "batch": BATCH,
                "solver": "adaptive+certified-polish, structured QP, pallas kernels",
                "solver_max_iter": MAX_ITER,
                "window": "16-cycle full gait period, best of 3",
                "iters_mean": round(float(it.mean()), 1),
                "iters_p99": round(float(np.percentile(it, 99)), 1),
                "healthy": ok,
                **curve,
            }
        )
    )


if __name__ == "__main__":
    main()
