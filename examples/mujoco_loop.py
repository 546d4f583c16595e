"""Closed loop with MuJoCo as the plant: the reference's own configuration.

Runs this framework's full controller (reference generation -> condensed QP
-> batched ADMM -> swing/stance leg control) against host-side MuJoCo
physics on the generated Go2 model — exactly the reference's setup
(test_MPC.py: controller at ~48 Hz, MuJoCo stepping at 1 kHz). This
cross-validates the whole TPU control stack against an independent physics
engine: if the robot walks here, the TPU plant is not masking controller
errors.

Usage: python examples/mujoco_loop.py [--seconds 3] [--vx 0.4] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--schedule", default="const", choices=["const", "ref"])
    ap.add_argument("--vx", type=float, default=0.4)
    ap.add_argument("--wz", type=float, default=0.0)
    ap.add_argument("--vy", type=float, default=0.0)
    ap.add_argument("--solver-iters", type=int, default=600)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tuned", action="store_true", help="Q_vy=8 profile")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.control import leg as L
    from convex_mpc_tpu.control import reference as R
    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.mpc import admm, condensed
    from convex_mpc_tpu.ops.rotations import quat_to_rpy, yaw_unwrap_step
    from convex_mpc_tpu.sim import engine as E
    from convex_mpc_tpu.sim.mujoco_bridge import MujocoGo2

    from convex_mpc_tpu.utils.config import DEFAULT_CONFIG, TUNED_CONFIG

    Q_DIAG = jnp.asarray(
        (TUNED_CONFIG if args.tuned else DEFAULT_CONFIG).mpc.q_diag, jnp.float32
    )
    dyn = D.build_dyn()
    gait = G.make_gait_params(3.0, 0.6)
    sched = E.constant_schedule(vx=args.vx, wz=args.wz)
    n = 16
    mpc_dt = (1.0 / 3.0) / 16

    bridge = MujocoGo2(ground=True, mu=0.8, armature=0.01, joint_damping=0.1)
    bridge.model.opt.timestep = 1e-3
    from convex_mpc_tpu.models.go2_params import DEFAULT_PARAMS

    q0 = DEFAULT_PARAMS.default_q()
    q0[2] += 0.0172  # start with foot spheres touching, not 17 mm penetrated
    bridge.set_q_pin(q0)

    # jitted controller pieces
    @jax.jit
    def observe(q, dq, yaw_cont, yaw_prev, vel_filt):
        rpy = quat_to_rpy(q[3:7])
        yc, yp = yaw_unwrap_step(rpy[2], yaw_prev, yaw_cont)
        from convex_mpc_tpu.models import kinematics as K
        from convex_mpc_tpu.ops.linalg import ein

        poses = K.fk(dyn.kin, q)
        com, vcom = D.com_state(dyn, q, dq)
        omega_w = ein("ij,j->i", poses.R[0], dq[3:6])
        raw6 = jnp.concatenate([vcom, omega_w])
        alpha = 1.0 - jnp.exp(-2.0 * jnp.pi * 30.0 * 1e-3)
        vf = vel_filt + alpha * (raw6 - vel_filt)
        x_vec = jnp.concatenate([com, jnp.stack([rpy[0], rpy[1], yc]), vf])
        obs = R.CentroidalObs(
            x_vec=x_vec, R_body_to_world=poses.R[0],
            foot_levers=poses.foot_w - com[None, :],
            mass=dyn.total_mass, inertia_world=D.centroidal_inertia(dyn, q),
        )
        return obs, yc, yp, vf

    @jax.jit
    def solve_mpc(obs, refgen, solver, t, cmd_vx, cmd_vy, cmd_wz):
        cmd = R.BodyCommand(
            vx=jnp.asarray(cmd_vx), vy=jnp.asarray(cmd_vy),
            z_pos=jnp.asarray(0.27), yaw_rate=jnp.asarray(cmd_wz),
        )
        traj, refgen = R.generate(refgen, gait, obs, cmd, t, mpc_dt, n)
        p0 = traj.x0[0:3]
        data, _ = condensed.build_condensed(
            traj.dyn, traj.x0.at[0:3].set(0.0),
            traj.x_ref.at[:, 0:3].add(-p0), traj.contact,
            Q_DIAG, 1e-5, 0.8, 10.0,
        )
        warm = solver._replace(rho=jnp.asarray(0.1, jnp.float32))
        sol = admm.solve(
            data, warm, max_iter=args.solver_iters,
            scaled_termination=True, eps_abs=1e-4, eps_rel=1e-4, box_tail=n * 12,
        )
        return sol.x[0:12].reshape(4, 3), sol.state, refgen, traj

    @jax.jit
    def leg_tick(leg_state, q, dq, yc, u0, pos_des, vel_des, wz_des, t):
        leg_obs = L.make_leg_obs(dyn, q, dq, yc)
        out, leg_state = L.compute_torques(
            leg_state, gait, leg_obs, u0, pos_des, vel_des, wz_des, t
        )
        return jnp.clip(out.tau, -45.0, 45.0).reshape(12), leg_state

    # host loop
    state_ref = R.init_state(jnp.asarray(np.concatenate([[0, 0, 0.2488], np.zeros(9)]), jnp.float32))
    solver = E.init_state(dyn, n=n).solver
    leg_state = L.init_state()
    yc = jnp.asarray(0.0)
    yp = jnp.asarray(0.0)
    vf = jnp.zeros(6)
    u0 = jnp.zeros((4, 3))
    traj = None
    cur_wz = 0.0

    ticks = int(args.seconds * 1000)
    xlog = np.zeros((ticks, 12))
    t0_wall = time.perf_counter()
    for i in range(ticks):
        t = i * 1e-3
        q_np, dq_np = bridge.get_q_dq_pin()
        q = jnp.asarray(q_np, jnp.float32)
        dq = jnp.asarray(dq_np, jnp.float32)
        obs, yc, yp, vf = observe(q, dq, yc, yp, vf)
        xlog[i] = np.asarray(obs.x_vec)
        if i % 20 == 0:
            if args.schedule == "ref":
                cmd_np = E.lookup_command(E.reference_schedule(), t)
                cvx, cvy, cwz = float(cmd_np.vx), float(cmd_np.vy), float(cmd_np.yaw_rate)
            else:
                cvx, cvy, cwz = args.vx, args.vy, args.wz
            u0, solver, state_ref, traj = solve_mpc(
                obs, state_ref, solver, t, cvx, cvy, cwz
            )
            cur_wz = cwz
        tau, leg_state = leg_tick(
            leg_state, q, dq, yc, u0, traj.pos_des_world, traj.vel_des_world,
            jnp.asarray(cur_wz), t,
        )
        bridge.step(np.asarray(tau, float))
    wall = time.perf_counter() - t0_wall

    if args.schedule == "ref":
        print(f"{'phase':16s} {'vx':>7s} {'vy':>7s} {'wz':>7s} {'z':>6s} {'|att|max':>8s}")
        for a, b, name in [(0, 1, "fwd 0.7"), (1.5, 3, "lat 0.3"), (4, 6, "yaw 2.0"),
                           (6.5, 8, "fwd0.6+yaw2"), (8, 9, "fwd 0.8"), (9, 10, "stop")]:
            seg = xlog[int(a * 1000):int(b * 1000)]
            if len(seg):
                print(f"{name:16s} {seg[:, 6].mean():+7.3f} {seg[:, 7].mean():+7.3f} "
                      f"{seg[:, 11].mean():+7.3f} {seg[:, 2].mean():6.3f} "
                      f"{np.abs(seg[:, 3:5]).max():8.3f}")
    tail = xlog[len(xlog) // 3 :]
    print(f"[mujoco-loop] {args.seconds:.1f}s sim in {wall:.0f}s wall")
    print(
        f"[mujoco-loop] vx={tail[:, 6].mean():+.3f} (cmd {args.vx})  "
        f"vy={tail[:, 7].mean():+.3f} (cmd {args.vy})  "
        f"wz={tail[:, 11].mean():+.3f} (cmd {args.wz})  z={tail[:, 2].mean():.3f}  "
        f"|roll|max={np.abs(tail[:, 3]).max():.3f}  |pitch|max={np.abs(tail[:, 4]).max():.3f}"
    )
    upright = np.abs(xlog[:, 3:5]).max() < 0.5 and xlog[-1, 2] > 0.15
    print(f"[mujoco-loop] upright: {upright}")
    sys.exit(0 if upright else 1)


if __name__ == "__main__":
    main()
