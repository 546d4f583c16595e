"""Closed-loop Go2 trot demo — the equivalent of the reference's main entry
(reference convex_mpc/test_MPC.py).

Runs the reference's 10 s command schedule (forward 0.7, lateral 0.3,
yaw 2.0, forward+yaw, forward 0.8 m/s) through the full TPU-native stack,
prints a per-phase tracking summary, saves the dashboard plots, and can
replay the run in the host MuJoCo viewer.

Usage:
    python examples/trot_demo.py [--seconds 10] [--vx V | --schedule ref]
        [--plots DIR] [--replay] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--schedule", default="ref", choices=["ref", "const"])
    ap.add_argument("--vx", type=float, default=0.5)
    ap.add_argument("--wz", type=float, default=0.0)
    ap.add_argument("--vy", type=float, default=0.0)
    ap.add_argument("--plots", default=None, help="directory to save dashboards")
    ap.add_argument("--time-dashboard", action="store_true",
                    help="with --plots: also measure + plot the per-cycle "
                         "update/solve/ticks timing split "
                         "(tools/time_dashboard.py)")
    ap.add_argument("--replay", action="store_true", help="interactive MuJoCo replay")
    ap.add_argument("--save-traj", default=None, help="save q/tau/x logs to this .npz")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--solver-iters", type=int, default=400)
    ap.add_argument("--ramp", action="store_true",
                    help="slew-rate-limit the command schedule (widens margins)")
    ap.add_argument("--tuned", action="store_true",
                    help="tuned cost profile (Q_vy=8; tighter lateral tracking)")
    ap.add_argument("--adaptive", action="store_true",
                    help="batch-global adaptive solver (early exit + "
                         "refactor-on-demand); --solver-iters becomes the cap")
    ap.add_argument("--stall-tol", type=float, default=0.05,
                    help="adaptive solver fixed-point stall exit [N]")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.sim import engine as E
    from convex_mpc_tpu.sim import physics as P

    dyn = D.build_dyn()
    gait = G.make_gait_params(3.0, 0.6)
    contact = P.default_contact(kn=30000, dn=1000)
    if args.schedule == "ref":
        sched = E.reference_schedule()
    else:
        sched = E.constant_schedule(vx=args.vx, vy=args.vy, wz=args.wz)
    if args.ramp:
        sched = E.ramp_schedule(sched if args.schedule == "ref" else E.constant_schedule(
            vx=args.vx, vy=args.vy, wz=args.wz, t_end=args.seconds))

    # one mpc_cycle advances steps_per_mpc*sim_dt = 20 ms -> 50 cycles/s
    n_cycles = int(round(args.seconds * 50))
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))

    print(f"[demo] backend={jax.default_backend()}  simulating {args.seconds:.1f}s "
          f"({n_cycles} MPC cycles) ...")
    t0 = time.perf_counter()
    from convex_mpc_tpu.utils.config import DEFAULT_CONFIG, TUNED_CONFIG

    q_diag = (TUNED_CONFIG if args.tuned else DEFAULT_CONFIG).mpc.q_diag
    if args.adaptive:
        # batched engine at B=1: batch-global adaptive solver with early
        # exit; chunk the scan at the host to keep device programs short
        gait_b = E.broadcast_batch(gait, 1)
        contact_b = E.broadcast_batch(contact, 1)
        sched_b = E.broadcast_batch(sched, 1)
        state_b = E.broadcast_batch(state, 1)
        chunks, logs_l = max(1, n_cycles // 50), []
        done = 0
        for c in range(chunks):
            n_c = n_cycles // chunks + (1 if c < n_cycles % chunks else 0)
            state_b, lg = E.simulate_batched(
                dyn, gait_b, contact_b, sched_b, state_b, n_cycles=n_c,
                solver_iters=args.solver_iters, q_diag=q_diag,
                stall_tol=args.stall_tol,
            )
            logs_l.append(jax.tree.map(lambda a: a[:, 0], lg))
            done += n_c
        logs = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *logs_l)
        state = jax.tree.map(lambda a: a[0], state_b)
    else:
        state, logs = E.simulate(
            dyn, gait, contact, sched, state, n_cycles=n_cycles,
            solver_iters=args.solver_iters, q_diag=q_diag,
        )
    jax.block_until_ready(state)
    wall = time.perf_counter() - t0
    print(f"[demo] done in {wall:.1f}s wall ({args.seconds / wall:.2f}x realtime)")

    x = np.asarray(logs.ticks.x_vec).reshape(-1, 12)
    assert np.isfinite(x).all(), "simulation produced non-finite state"

    # per-phase tracking summary
    phases = (
        [(0, 1, "fwd 0.7"), (1.5, 3, "lat 0.3"), (4, 6, "yaw 2.0"),
         (6.5, 8, "fwd 0.6 + yaw 2"), (8, 9, "fwd 0.8"), (9, 10, "stop")]
        if args.schedule == "ref"
        else [(0.5, args.seconds, f"vx={args.vx} vy={args.vy} wz={args.wz}")]
    )
    # velocities reported in the BODY frame (world components are misleading
    # while the robot turns)
    print(f"{'phase':18s} {'vx_b':>7s} {'vy_b':>7s} {'wz':>7s} {'z':>6s} {'|att|max':>8s}")
    for a, b, name in phases:
        seg = x[int(a * 1000):int(b * 1000)]
        if len(seg) == 0:
            continue
        cy, sy = np.cos(seg[:, 5]), np.sin(seg[:, 5])
        vxb = seg[:, 6] * cy + seg[:, 7] * sy
        vyb = -seg[:, 6] * sy + seg[:, 7] * cy
        print(f"{name:18s} {vxb.mean():+7.3f} {vyb.mean():+7.3f} "
              f"{seg[:, 11].mean():+7.3f} {seg[:, 2].mean():6.3f} "
              f"{np.abs(seg[:, 3:5]).max():8.3f}")
    it = np.asarray(logs.solver_iters)
    print(f"[demo] solver: mean {it.mean():.0f} iters/cycle, "
          f"converged {(it < args.solver_iters).mean() * 100:.0f}% of cycles")

    if args.plots:
        from convex_mpc_tpu.utils import plots as PL

        out = Path(args.plots)
        out.mkdir(parents=True, exist_ok=True)
        PL.plot_contact_forces(logs, out / "contact_forces.png")
        PL.plot_mpc_result(logs, out / "mpc_result.png")
        PL.plot_swing_foot_traj(logs, out / "swing_foot.png")
        PL.plot_solver_stats(logs, path=out / "solver.png")
        PL.plot_traj_tracking(x, path=out / "traj3d.png")

        # horizon-level dashboards from one extra MPC solve at the final
        # state: reference-vs-optimized overlay (reference plot_helper.py:
        # 255-304) and the open-loop SRB validation (test_MPC.py:256-266)
        from convex_mpc_tpu.control import reference as R
        from convex_mpc_tpu.control import srb as S
        from convex_mpc_tpu.mpc import admm, condensed

        cmd = E.lookup_command(sched, state.t)
        obs, _, _ = E.observe(
            dyn, state.plant, state.yaw_cont, state.yaw_prev, state.vel_filt
        )
        traj, _ = R.generate(state.refgen, gait, obs, cmd, state.t, (1 / 3.0) / 16, 16)
        p0 = traj.x0[0:3]
        data, aux = condensed.build_condensed(
            traj.dyn, traj.x0.at[0:3].set(0.0), traj.x_ref.at[:, 0:3].add(-p0),
            traj.contact, jnp.asarray(q_diag, jnp.float32), 1e-5, 0.8, 10.0,
        )
        warm = state.solver._replace(rho=jnp.asarray(0.1, jnp.float32))
        sol = admm.solve(data, warm, max_iter=args.solver_iters,
                         scaled_termination=True, box_tail=16 * 12)
        x_opt = np.asarray(condensed.recover_states(aux, traj.x0.at[0:3].set(0.0), sol.x))
        x_roll = np.asarray(
            S.rollout(traj.dyn, traj.x0.at[0:3].set(0.0),
                      sol.x.reshape(16, 12))
        )
        x_ref_s = np.asarray(traj.x_ref.at[:, 0:3].add(-p0))
        PL.plot_full_traj(x_opt, x_ref_s, path=out / "full_traj.png")
        PL.plot_open_loop_validation(
            x_opt, x_roll, x_ref_s, path=out / "open_loop_validation.png"
        )

        if args.time_dashboard:
            # per-cycle update-vs-solve stacked bars (reference
            # plot_helper.py:217-253) — measured by the staged runner
            import subprocess
            import sys as _sys

            subprocess.run(
                [
                    _sys.executable,
                    str(Path(__file__).resolve().parents[1]
                        / "tools" / "time_dashboard.py"),
                    "--batch", "1", "--seconds", str(args.seconds),
                    "--schedule", args.schedule,
                    "--iters", str(args.solver_iters),
                    "--out", str(out / "cycle_time.png"),
                ]
                + (["--tuned"] if args.tuned else [])
                + (["--cpu"] if args.cpu else []),
                check=False,
            )
        print(f"[demo] plots saved to {out}/")

    if args.save_traj:
        q_log = np.asarray(logs.ticks.q).reshape(-1, 19)
        tau_log = np.asarray(logs.ticks.tau).reshape(-1, 12)
        np.savez_compressed(
            args.save_traj,
            t=np.arange(len(q_log)) * 1e-3, q=q_log, tau=tau_log, x_vec=x,
            force=np.asarray(logs.ticks.force).reshape(-1, 12),
        )
        print(f"[demo] trajectory saved to {args.save_traj} "
              f"(replay offline: python -c \"import numpy as np; "
              f"from convex_mpc_tpu.sim.mujoco_bridge import MujocoGo2; "
              f"d=np.load('{args.save_traj}'); MujocoGo2().replay(d['t'], d['q'], d['tau'])\")")

    if args.replay:
        from convex_mpc_tpu.sim.mujoco_bridge import MujocoGo2

        q_log = np.asarray(logs.ticks.q).reshape(-1, 19)
        tau_log = np.asarray(logs.ticks.tau).reshape(-1, 12)
        t_log = np.arange(len(q_log)) * 1e-3
        MujocoGo2().replay(t_log, q_log, tau_log)


if __name__ == "__main__":
    main()
