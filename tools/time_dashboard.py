"""Per-cycle update-vs-solve timing dashboard (reference plot_solve_time).

The reference plots per-MPC-cycle wall time split into "update" (model +
reference + CasADi QP assembly) and "solve" (OSQP) against the 48 Hz
real-time budget (reference plot_helper.py:217-253, test_MPC.py:208-213).
This tool measures the same decomposition for the batched TPU engine by
running the closed loop cycle-by-cycle through the engine's OWN stage
functions (engine.cycle_update / admm.solve_adaptive / engine.cycle_apply —
the exact code mpc_cycle_batch jits) as three separately-jitted programs,
timing each dispatch:

  update — lookup + observe + reference generation + condensed QP build
  solve  — batch-global adaptive ADMM (+ certified polish)
  apply  — 20 x 1 kHz leg-control/physics ticks + state carry

Staged dispatch adds per-call host/tunnel overhead (~25 ms/dispatch here)
and loses update/solve overlap, so stage sums OVERSTATE the fused
single-program cycle (bench.py measures that one); the dashboard's value is
the per-cycle SHAPE: which cycles spike, and whether update or solve did.

Usage: python tools/time_dashboard.py [--batch 512] [--seconds 10]
       [--tuned] [--out artifacts/cycle_time.png] [--json out.json]

Also wired into examples/trot_demo.py --plots via --time-dashboard.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--tuned", action="store_true")
    ap.add_argument("--schedule", default="ref", choices=["ref", "const"])
    ap.add_argument("--vx", type=float, default=0.5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="artifacts/cycle_time.png")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.mpc import admm, condensed
    from convex_mpc_tpu.sim import engine as E
    from convex_mpc_tpu.sim import physics as P
    from convex_mpc_tpu.utils.config import DEFAULT_CONFIG, TUNED_CONFIG

    B, n = args.batch, 16
    cfg = TUNED_CONFIG if args.tuned else DEFAULT_CONFIG
    qd = jnp.asarray(cfg.mpc.q_diag, jnp.float32)
    dyn = D.build_dyn()
    contact = P.default_contact(kn=30000, dn=1000)
    gait_b = E.broadcast_batch(G.make_gait_params(3.0, 0.6), B)
    contact_b = E.broadcast_batch(contact, B)
    sched = (E.reference_schedule() if args.schedule == "ref"
             else E.constant_schedule(vx=args.vx))
    sched_b = E.broadcast_batch(sched, B)
    state = E.init_state(dyn, n=n)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    state_b = E.broadcast_batch(state, B)
    xs = jnp.linspace(-0.02, 0.02, B)
    state_b = state_b._replace(
        plant=state_b.plant._replace(q=state_b.plant.q.at[:, 0].add(xs))
    )

    mpc_dt = (1.0 / 3.0) / n

    @jax.jit
    def update_fn(gait, sched, state):
        def one(gait_i, sched_i, state_i):
            return E.cycle_update(
                dyn, gait_i, sched_i, state_i, qd, n, mpc_dt,
                cfg.mpc.r_diag_value, cfg.mpc.mu, cfg.mpc.fz_min,
            )

        return jax.vmap(one)(gait, sched, state)

    @jax.jit
    def solve_fn(data_b, warm):
        return admm.solve_adaptive(
            data_b, warm, max_iter=args.iters, box_tail=n * 12,
            nu=condensed.NU,
            use_pallas=jax.default_backend() == "tpu",
        )

    @jax.jit
    def apply_fn(gait, contact, state, sol, traj_b, refgen_b, cmd_b, yc_b, yp_b):
        return E.cycle_apply(
            dyn, gait, contact, state, sol, traj_b, refgen_b, cmd_b,
            yc_b, yp_b, args.iters,
        )

    def timed(fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) * 1e3, out

    n_cycles = int(round(args.seconds * 50))
    t_upd, t_sol, t_app, iters = [], [], [], []
    for cyc in range(n_cycles):
        dt_u, (data_b, traj_b, refgen_b, cmd_b, yc_b, yp_b) = timed(
            update_fn, gait_b, sched_b, state_b
        )
        dt_s, sol = timed(solve_fn, data_b, state_b.solver)
        dt_a, (state_b, log) = timed(
            apply_fn, gait_b, contact_b, state_b, sol, traj_b, refgen_b,
            cmd_b, yc_b, yp_b,
        )
        if cyc == 0:  # compile cycle: discard
            continue
        t_upd.append(dt_u)
        t_sol.append(dt_s)
        t_app.append(dt_a)
        iters.append(int(np.asarray(sol.iters).mean()))
        if (cyc + 1) % 100 == 0:
            print(f"  {cyc + 1}/{n_cycles}  upd {dt_u:.1f}  sol {dt_s:.1f} "
                  f"app {dt_a:.1f} ms", flush=True)

    z = np.asarray(state_b.plant.q[:, 2])
    healthy = bool(np.isfinite(z).all() and (z > 0.1).all())
    u, s, a = map(np.asarray, (t_upd, t_sol, t_app))
    report = {
        "batch": B,
        "cycles": len(u),
        "update_ms_mean": round(float(u.mean()), 2),
        "solve_ms_mean": round(float(s.mean()), 2),
        "apply_ms_mean": round(float(a.mean()), 2),
        "total_ms_p99": round(float(np.percentile(u + s + a, 99)), 2),
        "iters_mean": round(float(np.mean(iters)), 1),
        "healthy": healthy,
        "note": "staged dispatch; per-dispatch host overhead not subtracted",
    }
    print(json.dumps(report))
    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=2))

    from convex_mpc_tpu.utils import plots as PL

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    PL.plot_cycle_time(u, s, a, batch=B, path=out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
