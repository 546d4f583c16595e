"""Closed-loop force-trajectory parity: the BASELINE metric, measured in-loop.

Runs the actual closed-loop engine (warm-started production solver) and, at
every MPC cycle, also solves the *same* QP with the independent native f64
oracle. Reports the error of the applied (first-step) contact forces over
the whole run — "contact-force trajectories within 2% of the CasADi/OSQP
reference" measured exactly as the controller consumes them.

Usage: python tools/loop_parity.py [--seconds 3] [--vx 0.5] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def _oracle_solve(d):
    """Worker: f64 native oracle solve of one captured QP -> first forces."""
    from convex_mpc_tpu.utils.native_oracle import solve_qp_native

    x64, _, info = solve_qp_native(d["P"], d["q"], d["A"], d["l"], d["u"], max_iter=8000)
    if info["kkt"] > 1e-6:
        x64, _, info = solve_qp_native(d["P"], d["q"], d["A"], d["l"], d["u"], max_iter=60000)
    return x64[192:204]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--vx", type=float, default=0.5)
    ap.add_argument("--wz", type=float, default=0.0)
    ap.add_argument("--solver-iters", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--adaptive", action="store_true",
                    help="use the adaptive solver path (mpc_cycle_batch, "
                         "B=1); --solver-iters becomes the escalation cap")
    ap.add_argument("--stall-tol", type=float, default=0.02)
    ap.add_argument("--no-polish", action="store_true")
    ap.add_argument("--schedule", default="const", choices=["const", "ref"],
                    help="'ref' = the full 10s reference command schedule")
    ap.add_argument("--save", default="",
                    help="save per-cycle QPs + engine/oracle solutions to "
                         "this .npz for offline failure analysis")
    ap.add_argument("--tuned", action="store_true",
                    help="tuned cost profile (Q_vy=8) — the recommended "
                         "robust configuration for the full schedule")
    ap.add_argument("--brake-yaw", type=float, default=0.0,
                    help="yaw-deceleration limiter rad/s^2 in BOTH the "
                         "engine and the captured oracle QPs")
    ap.add_argument("--brake", action="store_true",
                    help="braking-limited velocity reference "
                         "(BRAKE_ACCEL_CANDIDATE) in BOTH the "
                         "engine and the captured oracle QPs")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.control import reference as R
    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.mpc import condensed
    from convex_mpc_tpu.sim import engine as E
    from convex_mpc_tpu.sim import physics as P
    from convex_mpc_tpu.utils.native_oracle import solve_qp_native

    from convex_mpc_tpu.utils.config import (
        BRAKE_ACCEL_CANDIDATE, DEFAULT_CONFIG, TUNED_CONFIG)

    Q = np.array((TUNED_CONFIG if args.tuned else DEFAULT_CONFIG).mpc.q_diag,
                 float)
    brake_accel = BRAKE_ACCEL_CANDIDATE if args.brake else 0.0
    brake_alpha = args.brake_yaw
    assert not ((args.brake or brake_alpha > 0) and not args.adaptive), \
        "--brake/--brake-yaw require --adaptive (the fixed path has no knob)"
    dyn = D.build_dyn()
    gait = G.make_gait_params(3.0, 0.6)
    contact = P.default_contact()
    if args.schedule == "ref":
        sched = E.reference_schedule()
        args.seconds = max(args.seconds, 10.0)
    else:
        sched = E.constant_schedule(vx=args.vx, wz=args.wz)
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    if args.adaptive:
        gait_b = E.broadcast_batch(gait, 1)
        contact_b = E.broadcast_batch(contact, 1)
        sched_b = E.broadcast_batch(sched, 1)
        state_b = E.broadcast_batch(state, 1)

    import qp_oracle as oracle

    # Phase 1: run the closed loop, capturing each cycle's exact QP instance
    # and the engine's applied force. Phase 2: solve all captured QPs with
    # the independent native f64 oracle in a worker pool — the oracle
    # solves (up to 60k f64 ADMM iterations each) dominate wall time and
    # are embarrassingly parallel once decoupled from the sequential loop.
    from convex_mpc_tpu.control import leg as LG
    from convex_mpc_tpu.models.go2_params import DEFAULT_PARAMS as _gp

    tau_lim = np.minimum(
        np.array([_gp.hip_torque_max, _gp.thigh_torque_max, _gp.calf_torque_max]),
        45.0,
    )  # engine clip: min(per-joint ctrlrange, reference TAU_MAX)

    n_cycles = int(round(args.seconds * 50))  # one cycle = 20 ms sim
    qps, u0s, iters, heights, warms = [], [], [], [], []
    jacs, masks = [], []
    for cyc in range(n_cycles):
        if args.save:
            # warm-start state ENTERING this cycle's solve, so any flagged
            # accept can be reproduced offline bit-for-bit
            sv = state_b.solver if args.adaptive else state.solver
            warms.append(jax.tree.map(lambda a: np.asarray(a, np.float32), sv))
        if args.adaptive:
            state = jax.tree.map(lambda a: a[0], state_b)
        # capture the exact QP the engine will solve this cycle
        cmd = E.lookup_command(sched, state.t)
        obs, _, _ = E.observe(dyn, state.plant, state.yaw_cont, state.yaw_prev, state.vel_filt)
        traj, _ = R.generate(state.refgen, gait, obs, cmd, state.t, (1 / 3.0) / 16, 16,
                             brake_accel=brake_accel, brake_alpha=brake_alpha)
        p0 = np.asarray(traj.x0[0:3], float)
        x0_s = np.asarray(traj.x0, float).copy()
        x0_s[0:3] = 0.0
        x_ref_s = np.asarray(traj.x_ref, float).copy()
        x_ref_s[:, 0:3] -= p0

        d = oracle.assemble_qp(
            np.asarray(traj.dyn.Ad, float), np.asarray(traj.dyn.Bd, float),
            np.asarray(traj.dyn.gd, float), x0_s, x_ref_s,
            np.asarray(traj.contact), Q, 1e-5, 0.8, 10.0,
        )
        qps.append(d)
        # leg Jacobians + stance mask at the state the force acts on, for
        # the applied-torque parity report (stance map tau = J_leg'(-f),
        # clipped — what actually reaches the actuators)
        leg_obs = LG.make_leg_obs(dyn, state.plant.q, state.plant.dq, state.yaw_cont)
        jacs.append(np.stack([
            np.asarray(leg_obs.J_feet[l, :, 6 + 3 * l : 9 + 3 * l], float)
            for l in range(4)
        ]))
        masks.append(np.asarray(G.current_mask(gait, state.t), float))

        # step the engine (its own solve, warm-started)
        if args.adaptive:
            state_b, log = E.mpc_cycle_batch(
                dyn, gait_b, contact_b, sched_b, state_b,
                solver_iters=args.solver_iters, stall_tol=args.stall_tol,
                polish=not args.no_polish, q_diag=tuple(Q),
                brake_accel=brake_accel, brake_alpha=brake_alpha,
            )
            state = jax.tree.map(lambda a: a[0], state_b)
            iters.append(int(log.solver_iters[0]))
        else:
            state, log = E.mpc_cycle_fixed(
                dyn, gait, contact, sched, state,
                solver_iters=args.solver_iters, q_diag=tuple(Q),
            )
            iters.append(int(log.solver_iters))
        u0s.append(np.asarray(state.u0, float).reshape(12))
        heights.append(float(state.plant.q[2]))
        if (cyc + 1) % 100 == 0:
            print(f"  loop: {cyc + 1}/{n_cycles} cycles  z={heights[-1]:.3f}",
                  flush=True)

    import multiprocessing as mp

    # spawn, not fork: the parent holds a multithreaded JAX runtime and
    # fork() from it can deadlock the worker pool

    ctx = mp.get_context("spawn")
    with ctx.Pool(min(4, mp.cpu_count())) as pool:
        refs = pool.map(_oracle_solve, qps, chunksize=8)

    def tau_of(f12, J, mask):
        """Applied stance torques: tau_leg = J_leg'(-f_leg), engine clip."""
        f = f12.reshape(4, 3) * mask[:, None]
        tau = np.einsum("lji,lj->li", J, -f)
        return np.clip(tau, -tau_lim, tau_lim)

    errs, fzs, tau_errs = [], [], []
    for u0, u_ref0, J, mk in zip(u0s, refs, jacs, masks):
        scale = max(np.abs(u_ref0).max(), 1.0)
        errs.append(np.abs(u0 - u_ref0).max() / scale)
        fzs.append(u_ref0[2::3].sum())
        dtau = tau_of(u0, J, mk) - tau_of(u_ref0, J, mk)
        tau_errs.append(np.abs(dtau / tau_lim).max())  # % of actuator range

    errs = np.asarray(errs) * 100
    it = np.asarray(iters)
    hz = np.asarray(heights)
    if args.save:
        # full QPs only for the interesting (>=1% error) cycles — the whole
        # run's QPs would be a ~400 MB artifact
        bad = np.where(errs >= 1.0)[0][:64]
        payload = dict(errs=errs, iters=it, heights=hz,
                       u0=np.stack(u0s), u_ref=np.stack(refs), bad_idx=bad)
        for name in ("P", "q", "A", "l", "u"):
            payload[f"bad_{name}"] = np.stack([qps[i][name] for i in bad]) \
                if len(bad) else np.zeros((0,))
        for fld in ("x", "z", "y", "rho"):
            payload[f"bad_warm_{fld}"] = np.stack(
                [np.asarray(getattr(warms[i], fld)) for i in bad]
            ) if len(bad) else np.zeros((0,))
        np.savez_compressed(args.save, **payload)
        print(f"saved run + {len(bad)} flagged QPs to {args.save}")
    print(f"height: min {hz.min():.3f}  final {hz[-1]:.3f}  "
          f"(fell: {bool(hz.min() < 0.12)})")
    cmd_desc = "ref schedule" if args.schedule == "ref" else f"vx={args.vx} wz={args.wz}"
    print(f"cycles: {n_cycles}  ({cmd_desc}  "
          f"{'adaptive' if args.adaptive else 'fixed'} solver)")
    print(
        f"in-loop applied-force error vs f64 optimum [%]: "
        f"mean {errs.mean():.3f}  p95 {np.percentile(errs, 95):.3f}  max {errs.max():.3f}"
    )
    te = np.asarray(tau_errs) * 100
    print(
        f"applied-TORQUE error (post J'(-f) + actuator clip) [% of range]: "
        f"mean {te.mean():.3f}  p95 {np.percentile(te, 95):.3f}  max {te.max():.3f}"
    )
    print(f"solver iters: mean {it.mean():.0f}  p95 {np.percentile(it, 95):.0f}  "
          f"max {it.max()}")
    n_over = int((errs > 2.0).sum())
    print(f"over 2% budget: {n_over}/{n_cycles} cycles")
    if n_over:
        worst = np.argsort(errs)[::-1][:12]
        for w in sorted(worst):
            if errs[w] > 2.0:
                print(f"  cycle {w:4d} t={w * 0.02:5.2f}s  err {errs[w]:6.2f}%  "
                      f"iters {iters[w]}  sum_fz_ref {fzs[w]:7.1f} N  "
                      f"tau_err {te[w]:5.2f}% of range")
    # adaptive path (iteration escalation) must leave ZERO cycles over budget;
    # the fixed path tolerates up to 2% of cycles (documented round-1 gap)
    ok = n_over == 0 if args.adaptive else (errs > 2.0).mean() < 0.02
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
