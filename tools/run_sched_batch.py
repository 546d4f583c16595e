"""Adjudication driver for the full reference schedule on the TPU plant via
the batched adaptive engine path (the exact tests/test_envelope.py
test_full_schedule_on_tpu_plant_adaptive configuration), with per-phase
stats — used to adjudicate marginal schedule outcomes vs solver-cap chaos.

Usage: python tools/run_sched_batch.py [--iters 800] [--tuned] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--raw", action="store_true",
                    help="raw reference weights instead of the tuned profile")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fine", action="store_true")
    ap.add_argument("--seconds", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np

    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.sim import engine as E
    from convex_mpc_tpu.sim import physics as P
    from convex_mpc_tpu.utils.config import TUNED_CONFIG

    dyn = D.build_dyn()
    gait_b = E.broadcast_batch(G.make_gait_params(3.0, 0.6), 1)
    contact = P.default_contact(kn=30000, dn=1000)
    contact_b = E.broadcast_batch(contact, 1)
    sched_b = E.broadcast_batch(E.reference_schedule(), 1)
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    state_b = E.broadcast_batch(state, 1)
    kw = {} if args.raw else {"q_diag": TUNED_CONFIG.mpc.q_diag}

    xs = []
    for sec in range(args.seconds):
        state_b, logs = E.simulate_batched(
            dyn, gait_b, contact_b, sched_b, state_b, n_cycles=50,
            solver_iters=args.iters, **kw,
        )
        x = np.asarray(logs.ticks.x_vec).reshape(-1, 12)
        xs.append(x)
        print(
            f"t={sec + 1:2d}s  z[{x[:, 2].min():.3f},{x[:, 2].max():.3f}]"
            f"  |rp|max={np.abs(x[:, 3:5]).max():.3f}"
            f"  vx_end={x[-1, 6]:+.3f}  vy_end={x[-1, 7]:+.3f}",
            flush=True,
        )
        if args.fine and sec >= 8:
            f = np.asarray(logs.ticks.force).reshape(-1, 4, 3)
            for k in range(0, 1000, 100):
                seg = x[k:k + 100]
                ff = f[k:k + 100]
                print(
                    f"   t={sec + k / 1000.0:5.2f}"
                    f"  vx={seg[:, 6].mean():+.3f} vy={seg[:, 7].mean():+.3f}"
                    f"  wz={seg[:, 11].mean():+.3f} yaw={seg[-1, 5]:+.2f}"
                    f"  z={seg[:, 2].mean():.3f}"
                    f"  fx={ff[..., 0].sum(-1).mean():+.1f}"
                    f"  fz={ff[..., 2].sum(-1).mean():+.1f}",
                    flush=True,
                )
    x = np.concatenate(xs)
    stop = np.abs(x[-500:, 6:8]).mean()
    print(
        f"final: z={x[-1, 2]:.3f}  stop_resid={stop:.4f}"
        f"  |rp|max={np.abs(x[:, 3:5]).max():.3f}"
        f"  finite={bool(np.isfinite(x).all())}"
    )


if __name__ == "__main__":
    main()
