"""Op-level xplane attribution of solve_adaptive (or the full cycle) on TPU.

Captures a jax.profiler trace of the real warm-started program and sums
device-side op durations from the xplane proto directly (the
tensorboard_plugin_profile converter is broken against installed TF; the
Async line double-counts waits — only the "XLA Ops" line is summed). See
STATUS.md measurement notes.

Run: python tools/solve_profile.py [--batch 512] [--what solve|cycle|ticks]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def parse_xplane(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    totals = collections.Counter()
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if "/device:TPU" not in plane.name:
                continue
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    totals[emeta.get(ev.metadata_id, "?")] += ev.duration_ps
    return totals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--what", default="solve", choices=["solve", "cycle", "ticks"])
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    B = args.batch

    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.sim import engine as E
    from convex_mpc_tpu.sim import physics as P
    from convex_mpc_tpu.mpc import admm

    dyn = D.build_dyn()
    contact = P.default_contact(kn=30000, dn=1000)
    gait_b = E.broadcast_batch(G.make_gait_params(3.0, 0.6), B)
    contact_b = E.broadcast_batch(contact, B)
    sched_b = E.broadcast_batch(E.constant_schedule(vx=0.5), B)
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    sb = E.broadcast_batch(state, B)
    sb = sb._replace(plant=sb.plant._replace(
        q=sb.plant.q.at[:, 0].add(jnp.linspace(-0.02, 0.02, B))))
    settle = jax.jit(lambda s: E.mpc_cycle_batch(
        dyn, gait_b, contact_b, sched_b, s)[0])
    for _ in range(8):
        sb = settle(sb)
    jax.block_until_ready(sb)

    qd = jnp.asarray((1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1), jnp.float32)

    if args.what == "solve":
        def pre(g, sc, st):
            return E.cycle_update(dyn, g, sc, st, qd, 16, (1 / 3.0) / 16,
                                  1e-5, 0.8, 10.0)

        data_b, *_ = jax.jit(jax.vmap(pre))(gait_b, sched_b, sb)

        fn = jax.jit(lambda d, w, eps: admm.solve_adaptive(
            d._replace(q=d.q + eps), w, max_iter=600, box_tail=192,
            use_pallas=True).x)
        run = lambda i: fn(data_b, sb.solver, jnp.float32(1e-6 * i))
    elif args.what == "cycle":
        fn = jax.jit(lambda s: E.mpc_cycle_batch(
            dyn, gait_b, contact_b, sched_b, s)[0])
        run = lambda i: fn(sb if i == 0 else run_state[0])
        run_state = [sb]

        def run(i, _rs=run_state):
            _rs[0] = fn(_rs[0])
            return _rs[0]
    else:  # ticks
        def pre(g, sc, st):
            return E.cycle_update(dyn, g, sc, st, qd, 16, (1 / 3.0) / 16,
                                  1e-5, 0.8, 10.0)

        _, traj_b, _, cmd_b, yc_b, yp_b = jax.jit(jax.vmap(pre))(
            gait_b, sched_b, sb)

        def post(g, c, cmd_i, traj_i, u0_i, st, yc, yp):
            return E._run_ticks(
                dyn, g, c, cmd_i, traj_i, u0_i, st.plant, st.leg, yc, yp,
                st.vel_filt, st.t, 20, 45.0, 1e-3, 30.0)

        fn = jax.jit(lambda eps: jax.vmap(post)(
            gait_b, contact_b, cmd_b, traj_b, sb.u0 + eps, sb, yc_b, yp_b
        )[0][0].q)
        run = lambda i: fn(jnp.float32(1e-6 * i))

    out = run(0)
    jax.block_until_ready(out)

    td = tempfile.mkdtemp(prefix="xplane_")
    jax.profiler.start_trace(td)
    for i in range(1, 4):
        out = run(i)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    totals = parse_xplane(td)
    tot_ms = sum(totals.values()) / 1e9
    print(f"total device op time over 3 reps: {tot_ms:.2f} ms "
          f"({tot_ms / 3:.2f} ms/rep)")
    for name, ps in totals.most_common(args.top):
        print(f"{ps / 1e9 / 3:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
