"""In-program cost decomposition of the full batched MPC cycle on TPU.

tools/solve_ablation.py decomposes the QP *solve*; this tool decomposes the
whole production cycle (engine.mpc_cycle_batch) into its phases:

  pre    — observe + reference generation + condensed QP assembly
  solve  — admm.solve_adaptive (warm-started, realistic rho carry)
  ticks  — 20 x 1 kHz leg-control + physics ticks
  tick subparts — make_leg_obs / compute_torques / physics step

Each phase runs K reps inside ONE jitted program via lax.scan with a
data-dependence chain threaded through the reps (an epsilon derived from the
previous rep's output perturbs the next rep's input), so XLA cannot hoist
the phase out of the loop and per-dispatch tunnel overhead (~25 ms here) is
amortized away.

Run: python tools/cycle_ablation.py [--batch 512] [--reps 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

MPC_DT = (1.0 / 3.0) / 16
QD = (1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1)


def timed(fn, *args, outer=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    B, K = args.batch, args.reps

    from convex_mpc_tpu.control import gait as G
    from convex_mpc_tpu.control import leg as L
    from convex_mpc_tpu.control import reference as R
    from convex_mpc_tpu.models import dynamics as D
    from convex_mpc_tpu.mpc import admm, condensed
    from convex_mpc_tpu.sim import engine as E
    from convex_mpc_tpu.sim import physics as P

    dyn = D.build_dyn()
    contact = P.default_contact(kn=30000, dn=1000)
    gait_b = E.broadcast_batch(G.make_gait_params(3.0, 0.6), B)
    contact_b = E.broadcast_batch(contact, B)
    sched_b = E.broadcast_batch(E.constant_schedule(vx=0.5), B)
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn, contact=contact))
    state_b = E.broadcast_batch(state, B)
    state_b = state_b._replace(
        plant=state_b.plant._replace(
            q=state_b.plant.q.at[:, 0].add(jnp.linspace(-0.02, 0.02, B))
        )
    )

    # settle into steady trot with warm starts (realistic mid-run state)
    settle = jax.jit(
        lambda s: E.mpc_cycle_batch(dyn, gait_b, contact_b, sched_b, s)[0]
    )
    for _ in range(8):
        state_b = settle(state_b)
    jax.block_until_ready(state_b)

    qd = jnp.asarray(QD, jnp.float32)

    def pre_one(gait_i, sched_i, state_i):
        """The engine's exact update stage (engine.cycle_update)."""
        return E.cycle_update(
            dyn, gait_i, sched_i, state_i, qd, 16, MPC_DT, 1e-5, 0.8, 10.0
        )

    def refgen_one(gait_i, sched_i, state_i):
        """Observe + reference generation only (no QP assembly)."""
        cmd = E.lookup_command(sched_i, state_i.t)
        obs, yc, yp = E.observe(
            dyn, state_i.plant, state_i.yaw_cont, state_i.yaw_prev, state_i.vel_filt
        )
        traj, refgen = R.generate(state_i.refgen, gait_i, obs, cmd, state_i.t, MPC_DT, 16)
        return traj, cmd, yc, yp

    data_b, traj_b, _refgen_b, cmd_b, yc_b, yp_b = jax.jit(jax.vmap(pre_one))(
        gait_b, sched_b, state_b
    )
    u0_b = state_b.u0

    # ---- phase: pre ------------------------------------------------------
    @jax.jit
    def run_pre(state_b):
        def rep(eps, _):
            st = state_b._replace(
                plant=state_b.plant._replace(q=state_b.plant.q.at[:, 2].add(eps))
            )
            data, traj, refgen, cmd, yc, yp = jax.vmap(pre_one)(gait_b, sched_b, st)
            return jnp.sum(data.q) * 1e-30, None

        out, _ = jax.lax.scan(rep, jnp.asarray(0.0, jnp.float32), None, length=K)
        return out

    # ---- phase: pre subparts (refgen alone / QP assembly alone) ----------
    @jax.jit
    def run_refgen(state_b):
        def rep(eps, _):
            st = state_b._replace(
                plant=state_b.plant._replace(q=state_b.plant.q.at[:, 2].add(eps))
            )
            traj, cmd, yc, yp = jax.vmap(refgen_one)(gait_b, sched_b, st)
            return jnp.sum(traj.x_ref) * 1e-30, None

        out, _ = jax.lax.scan(rep, jnp.asarray(0.0, jnp.float32), None, length=K)
        return out

    @jax.jit
    def run_qpbuild(traj_b):
        def build_one(traj):
            p0 = traj.x0[0:3]
            data, _ = condensed.build_condensed_structured(
                traj.dyn, traj.x0.at[0:3].set(0.0),
                traj.x_ref.at[:, 0:3].add(-p0), traj.contact, qd,
                1e-5, 0.8, 10.0,
            )
            return data

        def rep(eps, _):
            t = traj_b._replace(x_ref=traj_b.x_ref + eps)
            data = jax.vmap(build_one)(t)
            return jnp.sum(data.q) * 1e-30, None

        out, _ = jax.lax.scan(rep, jnp.asarray(0.0, jnp.float32), None, length=K)
        return out

    # ---- phase: solve (warm-started adaptive) ----------------------------
    def make_run_solve(up):
        @jax.jit
        def run_solve(data_b, warm):
            def rep(eps, _):
                d = data_b._replace(q=data_b.q + eps)
                sol = admm.solve_adaptive(
                    d, warm, max_iter=600, box_tail=192, use_pallas=up
                )
                return jnp.sum(sol.x) * 1e-30, sol.iters

            out, iters = jax.lax.scan(
                rep, jnp.asarray(0.0, jnp.float32), None, length=K
            )
            return out, iters

        return run_solve

    run_solve = make_run_solve(jax.default_backend() == "tpu")
    run_solve_xla = make_run_solve(False)

    # ---- phase: ticks ----------------------------------------------------
    @jax.jit
    def run_ticks(state_b, traj_b, cmd_b, u0_b):
        def post(gait_i, contact_i, cmd_i, traj_i, u0_i, plant, leg, yc, yp, vf, t):
            return E._run_ticks(
                dyn, gait_i, contact_i, cmd_i, traj_i, u0_i,
                plant, leg, yc, yp, vf, t, 20, 45.0, 1e-3, 30.0,
            )

        def rep(carry, _):
            plant, leg, vf, t = carry
            (plant, leg, yc, yp, vf, t), _ = jax.vmap(post)(
                gait_b, contact_b, cmd_b, traj_b, u0_b,
                plant, leg, state_b.yaw_cont, state_b.yaw_prev, vf, t,
            )
            return (plant, leg, vf, t), None

        carry0 = (state_b.plant, state_b.leg, state_b.vel_filt, state_b.t)
        out, _ = jax.lax.scan(rep, carry0, None, length=K)
        return out[0].q

    # ---- phase: full cycle ----------------------------------------------
    @jax.jit
    def run_full(state_b):
        def rep(s, _):
            s2, log = E.mpc_cycle_batch(dyn, gait_b, contact_b, sched_b, s)
            return s2, log.solver_iters

        s, iters = jax.lax.scan(rep, state_b, None, length=K)
        return s.plant.q, iters

    # ---- tick subparts (per 20 ticks, batched) ---------------------------
    @jax.jit
    def run_leg_obs(state_b):
        def rep(eps, _):
            q = state_b.plant.q.at[:, 2].add(eps)
            obs = jax.vmap(lambda qi, dqi: L.make_leg_obs(dyn, qi, dqi, 0.0))(
                q, state_b.plant.dq
            )
            return jnp.sum(obs.foot_pos) * 1e-30, None

        out, _ = jax.lax.scan(rep, jnp.asarray(0.0, jnp.float32), None, length=K * 20)
        return out

    @jax.jit
    def run_plant_step(state_b):
        def one(plant, tau):
            leg_obs = L.make_leg_obs(dyn, plant.q, plant.dq, 0.0)
            return P.step(
                dyn, contact, plant, tau, 1e-3,
                J=leg_obs.J_feet, M=leg_obs.M, bias=leg_obs.bias,
                base_R=leg_obs.base_R, foot_pos=leg_obs.foot_pos,
                foot_vel=leg_obs.foot_vel,
            )

        def rep(plant, _):
            tau = jnp.zeros((B, 12))
            plant = jax.vmap(one)(plant, tau)
            return plant, None

        out, _ = jax.lax.scan(rep, state_b.plant, None, length=K * 20)
        return out.q

    # ---- tick subpart: torque controller alone ---------------------------
    obs_b = jax.jit(
        jax.vmap(lambda q, dq: L.make_leg_obs(dyn, q, dq, 0.0))
    )(state_b.plant.q, state_b.plant.dq)

    @jax.jit
    def run_torques(state_b, obs_b, traj_b, cmd_b, u0_b):
        def one(leg, gait_i, obs_i, u0_i, traj_i, cmd_i, t):
            out, leg = L.compute_torques(
                leg, gait_i, obs_i, u0_i,
                traj_i.pos_des_world, traj_i.vel_des_world, cmd_i.yaw_rate, t,
            )
            return out.tau, leg

        def rep(carry, _):
            eps, leg = carry
            ob = obs_b._replace(foot_pos=obs_b.foot_pos + eps)
            tau, leg = jax.vmap(one)(
                leg, gait_b, ob, u0_b, traj_b, cmd_b, state_b.t
            )
            return (jnp.sum(tau) * 1e-30, leg), None

        out, _ = jax.lax.scan(
            rep, (jnp.asarray(0.0, jnp.float32), state_b.leg), None, length=K * 20
        )
        return out[0]

    # ---- tick subpart: the two 18x18 cholesky solves alone ---------------
    @jax.jit
    def run_chol(state_b, obs_b):
        def solve_one(c, J):  # c (18,18), J (4,3,18)
            return jax.vmap(
                lambda Jl: jax.scipy.linalg.cho_solve((c, True), Jl.T)
            )(J)

        def rep(eps, _):
            M = obs_b.M + eps * jnp.eye(18)
            with jax.default_matmul_precision("highest"):
                chol = jnp.linalg.cholesky(M)
                sol = jax.vmap(solve_one)(chol, obs_b.J_feet)
            return jnp.sum(sol) * 1e-30, None

        out, _ = jax.lax.scan(
            rep, jnp.asarray(0.0, jnp.float32), None, length=K * 20
        )
        return out

    res = {}
    res["pre_ms"] = timed(run_pre, state_b) / K * 1e3
    res["refgen_ms"] = timed(run_refgen, state_b) / K * 1e3
    res["qpbuild_ms"] = timed(run_qpbuild, traj_b) / K * 1e3
    res["solve_xla_twin_ms"] = timed(run_solve_xla, data_b, state_b.solver) / K * 1e3
    t_solve = timed(run_solve, data_b, state_b.solver)
    _, iters = run_solve(data_b, state_b.solver)
    res["solve_ms"] = t_solve / K * 1e3
    res["solve_iters_mean"] = float(np.asarray(iters).mean())
    res["ticks_ms"] = timed(run_ticks, state_b, traj_b, cmd_b, u0_b) / K * 1e3
    res["full_ms"] = timed(run_full, state_b) / K * 1e3
    res["legobs_plus_step_ms_per_cycle"] = timed(run_plant_step, state_b) / K * 1e3
    res["legobs_ms_per_cycle"] = timed(run_leg_obs, state_b) / K * 1e3
    res["torques_ms_per_cycle"] = (
        timed(run_torques, state_b, obs_b, traj_b, cmd_b, u0_b) / K * 1e3
    )
    res["chol_solve_ms_per_cycle"] = timed(run_chol, state_b, obs_b) / K * 1e3
    res["batch"] = B
    res["reps"] = K
    res["backend"] = jax.devices()[0].platform
    res["solves_per_s_full"] = B / (res["full_ms"] / 1e3)
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
