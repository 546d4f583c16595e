"""In-program cost decomposition of the batched ADMM solve on the real TPU.

Dispatch-level microbenchmarks (tools/kkt_microbench.py) are confounded by
per-call overhead on this tunnel-attached backend, so this tool measures the
*jitted production solve* end to end under controlled ablations:

  - segments 1 / 2 / 4  at fixed iters  -> per-refactorization (setup) cost
  - iters 16..400       at fixed segments -> per-iteration cost
  - setup-only variant (0 iterations)   -> absolute setup cost

The QP batch is the real engine QP (condensed form, reference weights) built
from a mid-trot state so sparsity/structure match production exactly.

Run: python tools/solve_ablation.py [--batch 512]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    B = args.batch

    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.control import reference as R
    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.mpc import admm, condensed
    from convex_mpc_tpu.sim import engine as E
    from convex_mpc_tpu.sim import physics as P

    dyn = D.build_dyn()
    gait = G.make_gait_params(3.0, 0.6)
    sched = E.constant_schedule(vx=0.5)
    n = 16

    # run a few real cycles to reach a mid-trot state, then capture the QP
    state = E.init_state(dyn, n=n)
    state = state._replace(plant=P.init_plant(dyn))
    for _ in range(10):
        state, _ = E.mpc_cycle_fixed(dyn, gait, P.default_contact(), sched, state)

    cmd = E.lookup_command(sched, state.t)
    obs, _, _ = E.observe(dyn, state.plant, state.yaw_cont, state.yaw_prev, state.vel_filt)
    traj, _ = R.generate(state.refgen, gait, obs, cmd, state.t, (1 / 3.0) / 16, n)
    p0 = traj.x0[0:3]
    qd = jnp.asarray([1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1], jnp.float32)

    def build_one(dx):
        x0 = traj.x0.at[0:3].set(0.0).at[6].add(dx)
        data, _ = condensed.build_condensed(
            traj.dyn, x0, traj.x_ref.at[:, 0:3].add(-p0), traj.contact,
            qd, 1e-5, 0.8, 10.0,
        )
        return data

    dxs = jnp.linspace(-0.02, 0.02, B)
    build_b = jax.jit(jax.vmap(build_one))
    data_b = build_b(dxs)
    jax.block_until_ready(data_b)
    warm_b = jax.vmap(lambda _: admm.init_state(jax.tree.map(lambda x: x[0], data_b)))(dxs)

    results = {}
    results["build_condensed"] = timed(build_b, dxs, reps=args.reps)

    def mk(iters, segs, **kw):
        def f(d, w):
            return jax.vmap(
                lambda dd, ww: admm.solve(
                    dd, ww, max_iter=iters, segments=segs,
                    scaled_termination=True, box_tail=n * 12, **kw,
                )
            )(d, w)
        return jax.jit(f)

    for segs in (1, 2, 4):
        for iters in (segs * 4, 152, 400):
            it = max(iters, segs * 4)
            it = (it // segs) * segs
            key = f"solve segs={segs} iters={it}"
            try:
                results[key] = timed(mk(it, segs), data_b, warm_b, reps=args.reps)
            except Exception as exc:
                results[key] = float("nan")
                print(f"{key} failed: {exc}")

    print(f"\nB={B} n=192 ({jax.devices()[0].platform}), best of {args.reps}:")
    for k, v in results.items():
        print(f"  {k:28s} {v * 1e3:9.1f} ms")

    # derived decomposition
    s1_0 = results.get("solve segs=1 iters=4")
    s4_0 = results.get("solve segs=4 iters=16")
    s1_152 = results.get("solve segs=1 iters=152")
    s4_152 = results.get("solve segs=4 iters=152")
    s4_400 = results.get("solve segs=4 iters=400")
    if all(v is not None for v in (s1_0, s4_0, s1_152, s4_152, s4_400)):
        per_seg = (s4_0 - s1_0) / 3
        per_iter = (s4_400 - s4_152) / 248
        print(f"\n  per-refactorization (setup): {per_seg * 1e3:8.1f} ms")
        print(f"  per-iteration:               {per_iter * 1e3:8.3f} ms")
        print(f"  setup share @ segs=4 iters=152: {3 * per_seg / s4_152 * 100:.0f}%+")


if __name__ == "__main__":
    main()
