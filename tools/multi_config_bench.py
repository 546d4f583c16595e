"""BASELINE config 5 in one run: multi-gait x multi-horizon at >= 10k scale.

Runs a grid of gait variants (trot duty/frequency spread, bound, pace —
the reference hardcodes one trot, gait.py:8-18) x MPC horizons
{10, 16, 24, 32} (the reference hardcodes N=16 over one gait period,
com_trajectory.py:66) through the production batched adaptive engine, as
host-chunked sub-batch programs — the pod mapping run on one chip: each
chip of an N-chip mesh owns one such shard (parallel/mesh.py shards the
same programs over a real mesh).

All sub-batches of all configs advance TOGETHER each cycle (>= 10k
concurrent scenarios resident on the chip); the aggregate rate is measured
over full interleaved rounds, then each config is timed alone for its
per-config solves/s. Upright-rate per config is checked at the end.

Usage: python tools/multi_config_bench.py [--per-config 1280] [--chunk 640]
       [--reps 5] [--json artifacts/multi_config.json]
Prints one JSON object (also written to --json).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TROT = (0.5, 0.0, 0.0, 0.5)
BOUND = (0.0, 0.0, 0.5, 0.5)
PACE = (0.5, 0.0, 0.5, 0.0)

# name, phase_offset, freq, duty, horizon, vx
CONFIGS = [
    ("trot_n16", TROT, 3.0, 0.6, 16, 0.5),
    ("trot_fast_duty05_n16", TROT, 3.5, 0.5, 16, 0.5),
    ("trot_slow_duty07_n16", TROT, 2.5, 0.7, 16, 0.5),
    ("bound_n16", BOUND, 3.0, 0.6, 16, 0.3),
    ("pace_n16", PACE, 3.0, 0.6, 16, 0.3),
    ("trot_n10", TROT, 3.0, 0.6, 10, 0.5),
    ("trot_n24", TROT, 3.0, 0.6, 24, 0.5),
    ("trot_n32", TROT, 3.0, 0.6, 32, 0.5),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-config", type=int, default=1280,
                    help="scenarios per config (8 configs x 1280 = 10240)")
    ap.add_argument("--chunk", type=int, default=640,
                    help="sub-batch program size (single programs >= 1024 "
                         "hit the platform cliff documented in STATUS.md)")
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--settle", type=int, default=16,
                    help="cycles to settle warm starts before timing")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes for a CPU smoke run")
    ap.add_argument("--json", default="artifacts/multi_config.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.sim import engine as E
    from convex_mpc_tpu.sim import physics as P

    if args.smoke:
        args.per_config, args.chunk, args.iters = 4, 2, 100
        args.reps, args.settle = 2, 2

    per, chunk = args.per_config, args.chunk
    assert per % chunk == 0, "--per-config must be divisible by --chunk"
    dyn = D.build_dyn()
    contact = P.default_contact()

    runners = []  # (name, fn, [sub_states])
    for name, po, freq, duty, n, vx in CONFIGS:
        gait = G.make_gait_params(freq, duty, phase_offset=po)
        gait_b = E.broadcast_batch(gait, chunk)
        contact_b = E.broadcast_batch(contact, chunk)
        sched_b = E.broadcast_batch(E.constant_schedule(vx=vx), chunk)
        mpc_dt = (1.0 / freq) / n

        def _fn(state, gait_b=gait_b, contact_b=contact_b, sched_b=sched_b,
                n=n, mpc_dt=mpc_dt):
            s, log = E.mpc_cycle_batch(
                dyn, gait_b, contact_b, sched_b, state, n=n,
                solver_iters=args.iters, mpc_dt=mpc_dt,
            )
            return s, log.solver_iters

        fn = jax.jit(_fn)
        base = E.init_state(dyn, n=n)
        base = base._replace(plant=P.init_plant(dyn, contact=contact))
        subs = []
        for k in range(per // chunk):
            sb = E.broadcast_batch(base, chunk)
            sb = sb._replace(
                plant=sb.plant._replace(
                    q=sb.plant.q.at[:, 0].add(
                        jnp.linspace(-0.02, 0.02, chunk) + 0.001 * k
                    )
                )
            )
            subs.append(sb)
        runners.append([name, fn, subs])

    total = per * len(CONFIGS)
    print(f"configs: {len(CONFIGS)} x {per} = {total} concurrent scenarios, "
          f"{per // chunk} programs of {chunk} each", flush=True)

    def advance_all():
        for r in runners:
            r[2] = [r[1](s)[0] for s in r[2]]

    t0 = time.time()
    for i in range(args.settle):  # compile (first call) + settle warm starts
        advance_all()
        jax.block_until_ready([r[2] for r in runners])
        if i == 0:
            print(f"compiled all programs in {time.time() - t0:.0f}s",
                  flush=True)

    # aggregate: all configs interleaved (the >= 10k-concurrent claim)
    best_all = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.reps):
            advance_all()
        jax.block_until_ready([r[2] for r in runners])
        best_all = min(best_all, (time.perf_counter() - t0) / args.reps)

    # per-config rate: each config alone
    per_cfg = {}
    for name_fn_subs, (name, po, freq, duty, n, vx) in zip(runners, CONFIGS):
        _, fn, subs = name_fn_subs
        best = float("inf")
        iters_log = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = [fn(s) for s in subs]
                subs = [o[0] for o in out]
                iters_log.append(np.concatenate([np.asarray(o[1]) for o in out]))
            jax.block_until_ready(subs)
            best = min(best, (time.perf_counter() - t0) / args.reps)
        name_fn_subs[2] = subs
        it = np.concatenate(iters_log)
        # upright = height band AND attitude (|roll,pitch| < 0.6) like every
        # other gate in the repo (bench/ensemble/envelope) — a robot
        # tumbling at z ~ 0.3 must not count as upright
        from convex_mpc_tpu.ops.rotations import quat_to_rpy
        q_all = np.concatenate([np.asarray(s.plant.q) for s in subs])
        z = q_all[:, 2]
        rpy = np.asarray(jax.vmap(quat_to_rpy)(jnp.asarray(q_all[:, 3:7])))
        att_ok = np.abs(rpy[:, 0:2]).max(axis=1) < 0.6
        upright = float(
            ((z > 0.1) & (z < 0.6) & np.isfinite(z) & att_ok
             & np.isfinite(q_all).all(axis=1)).mean()
        )
        per_cfg[name] = {
            "horizon": n,
            "gait": f"{freq}Hz/{duty}",
            "scenarios": per,
            "ms_per_cycle": round(best * 1e3, 1),
            "solves_per_s": round(per / best, 1),
            "upright_rate": round(upright, 4),
            "iters_mean": round(float(it.mean()), 1),
            "iters_p99": round(float(np.percentile(it, 99)), 1),
        }
        print(json.dumps({name: per_cfg[name]}), flush=True)

    report = {
        "metric": "multi_config_throughput",
        "total_concurrent_scenarios": total,
        "aggregate_ms_per_cycle": round(best_all * 1e3, 1),
        "aggregate_solves_per_s": round(total / best_all, 1),
        "all_upright": all(v["upright_rate"] == 1.0 for v in per_cfg.values()),
        "configs": per_cfg,
    }
    print(json.dumps(report))
    if args.json:
        Path(args.json).parent.mkdir(parents=True, exist_ok=True)
        Path(args.json).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
