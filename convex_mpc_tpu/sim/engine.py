"""Closed-loop simulation engine: MPC at ~48 Hz, leg control + physics at 1 kHz.

Functional re-design of the reference harness loop (reference
test_MPC.py:160-236): one ``mpc_cycle`` = reference regeneration + QP solve +
``steps_per_mpc`` inner 1 kHz ticks of leg control and plant stepping, all
inside ``lax.scan`` so a full simulation jit-compiles to a single XLA
program; ``vmap`` over ``EngineState``/scenario parameters gives batched
rollouts, and ``shard_map`` over a device mesh scales the batch across chips
(see convex_mpc_tpu.parallel).

All reference statefulness is carried explicitly in ``EngineState``: plant
(q, dq), leg-controller latches, reference-generator position target, ADMM
warm start, continuous-yaw unwrap, and the applied MPC force.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from convex_mpc_tpu.control import gait as G
from convex_mpc_tpu.control import leg as L
from convex_mpc_tpu.control import reference as R
from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.mpc import admm, condensed, qp
from convex_mpc_tpu.ops.linalg import ein
from convex_mpc_tpu.ops.rotations import quat_to_rpy, yaw_unwrap_step
from convex_mpc_tpu.sim import physics as P


class CommandSchedule(NamedTuple):
    """Piecewise-constant body command schedule (reference test_MPC.py:28-47)."""

    t_start: jnp.ndarray  # (K,)
    t_end: jnp.ndarray  # (K,)
    vx: jnp.ndarray  # (K,)
    vy: jnp.ndarray  # (K,)
    z_pos: jnp.ndarray  # (K,)
    yaw_rate: jnp.ndarray  # (K,)


def reference_schedule() -> CommandSchedule:
    """The reference's 10 s command schedule (test_MPC.py:37-47)."""
    rows = [
        (0.0, 1.0, 0.7, 0.0, 0.27, 0.0),
        (1.0, 1.5, 0.0, 0.0, 0.27, 0.0),
        (1.5, 3.0, 0.0, 0.3, 0.27, 0.0),
        (3.0, 4.0, 0.0, 0.0, 0.27, 0.0),
        (4.0, 6.0, 0.0, 0.0, 0.27, 2.0),
        (6.0, 6.5, 0.0, 0.0, 0.27, 0.0),
        (6.5, 8.0, 0.6, 0.0, 0.27, 2.0),
        (8.0, 9.0, 0.8, 0.0, 0.27, 0.0),
        (9.0, 10.0, 0.0, 0.0, 0.27, 0.0),
    ]
    cols = list(zip(*rows))
    return CommandSchedule(*[jnp.asarray(c) for c in cols])


def constant_schedule(vx=0.0, vy=0.0, z=0.27, wz=0.0, t_end=1e9) -> CommandSchedule:
    return CommandSchedule(
        t_start=jnp.asarray([0.0]),
        t_end=jnp.asarray([t_end]),
        vx=jnp.asarray([vx]),
        vy=jnp.asarray([vy]),
        z_pos=jnp.asarray([z]),
        yaw_rate=jnp.asarray([wz]),
    )


def ramp_schedule(
    sched: CommandSchedule,
    max_acc: float = 1.5,  # m/s^2 for vx/vy
    max_alpha: float = 6.0,  # rad/s^2 for yaw rate
    step: float = 0.1,  # s, piecewise-constant resolution of the ramps
) -> CommandSchedule:
    """Slew-rate-limit a step schedule into short piecewise-constant ramps.

    The reference applies raw command steps (test_MPC.py:82-92); hard steps
    like its t=8 transition (2 rad/s turn -> 0.8 m/s) sit on a stability
    margin that flips with backend numerics. Ramping the *schedule* (host
    side, before the run) widens the margin without touching the engine or
    the reference's lookup semantics. Returns a denser CommandSchedule.
    """
    import numpy as np

    t_end = float(np.asarray(sched.t_end).max())
    ts = np.arange(0.0, t_end + step, step)

    def raw(t):
        inp = (np.asarray(sched.t_start) <= t) & (t < np.asarray(sched.t_end))
        if inp.any():
            i = int(np.argmax(inp))
            return np.array(
                [sched.vx[i], sched.vy[i], sched.z_pos[i], sched.yaw_rate[i]], float
            )
        return np.array([0.0, 0.0, 0.27, 0.0])

    cur = raw(0.0)
    rows = []
    for t in ts:
        tgt = raw(t)
        dv = np.clip(tgt[:2] - cur[:2], -max_acc * step, max_acc * step)
        dw = np.clip(tgt[3] - cur[3], -max_alpha * step, max_alpha * step)
        cur = np.array([cur[0] + dv[0], cur[1] + dv[1], tgt[2], cur[3] + dw])
        rows.append((t, t + step, *cur))
    cols = list(zip(*rows))
    return CommandSchedule(
        t_start=jnp.asarray(cols[0]), t_end=jnp.asarray(cols[1]),
        vx=jnp.asarray(cols[2]), vy=jnp.asarray(cols[3]),
        z_pos=jnp.asarray(cols[4]), yaw_rate=jnp.asarray(cols[5]),
    )


def lookup_command(sched: CommandSchedule, t) -> R.BodyCommand:
    """Piecewise lookup; default (0, 0, 0.27, 0) outside all phases
    (reference test_MPC.py:82-92)."""
    in_phase = (sched.t_start <= t) & (t < sched.t_end)  # (K,)
    pick = lambda v, default: jnp.where(jnp.any(in_phase), jnp.sum(jnp.where(in_phase, v, 0.0)), default)
    return R.BodyCommand(
        vx=pick(sched.vx, 0.0),
        vy=pick(sched.vy, 0.0),
        z_pos=pick(sched.z_pos, 0.27),
        yaw_rate=pick(sched.yaw_rate, 0.0),
    )


class EngineState(NamedTuple):
    plant: P.PlantState
    leg: L.LegControlState
    refgen: R.RefGenState
    solver: admm.AdmmState
    yaw_cont: jnp.ndarray  # () continuous yaw
    yaw_prev: jnp.ndarray  # () previous raw yaw measurement
    u0: jnp.ndarray  # (4, 3) applied MPC forces
    t: jnp.ndarray  # () sim time
    vel_filt: jnp.ndarray  # (6,) low-passed [vcom_world, omega_world]
    # The raw plant rings at O(100 Hz) (penalty contact + force-controlled
    # legs); sampling that at the 48 Hz MPC rate aliases into violent
    # spurious rate feedback. A 1-pole filter updated at the 1 kHz inner
    # rate (the role of a real robot's state estimator) feeds the MPC and
    # Raibert placement instead.


class TickLog(NamedTuple):
    """Per-1kHz-tick logs (reference test_MPC.py:100-131 storage)."""

    x_vec: jnp.ndarray  # (12,) centroidal state
    q: jnp.ndarray  # (19,) plant configuration (for replay/analysis)
    tau: jnp.ndarray  # (4, 3) applied (saturated) torques
    force: jnp.ndarray  # (4, 3) MPC contact forces in effect
    foot_pos_des: jnp.ndarray  # (4, 3)
    foot_pos_now: jnp.ndarray  # (4, 3)
    contact_mask: jnp.ndarray  # (4,)


class CycleLog(NamedTuple):
    ticks: TickLog  # stacked (steps_per_mpc, ...)
    solver_iters: jnp.ndarray  # ()
    prim_res: jnp.ndarray  # ()
    dual_res: jnp.ndarray  # ()


def init_state(dyn: D.Go2Dyn, n: int, x=0.0, y=0.0, formulation: str = "condensed") -> EngineState:
    plant = P.init_plant(dyn, x=x, y=y)
    com, _ = D.com_state(dyn, plant.q, jnp.zeros(18))
    x_vec0 = jnp.concatenate([com, jnp.zeros(9)])
    mod = condensed if formulation == "condensed" else qp
    nz = mod.n_vars(n)
    m = mod.n_rows(n)
    return EngineState(
        plant=plant,
        leg=L.init_state(),
        refgen=R.init_state(x_vec0),
        solver=admm.AdmmState(
            x=jnp.zeros(nz, jnp.float32),
            z=jnp.zeros(m, jnp.float32),
            y=jnp.zeros(m, jnp.float32),
            rho=jnp.asarray(0.1, jnp.float32),
        ),
        yaw_cont=jnp.asarray(0.0),
        yaw_prev=jnp.asarray(0.0),
        u0=jnp.zeros((4, 3)),
        t=jnp.asarray(0.0),
        vel_filt=jnp.zeros(6),
    )


def observe(
    dyn: D.Go2Dyn, plant: P.PlantState, yaw_cont, yaw_prev, vel_filt=None
) -> tuple:
    """Centroidal observation (reference go2_robot_data.compute_com_x_vec).

    If ``vel_filt`` (6,) is given, the velocity half of x_vec uses the
    low-passed estimate instead of the raw instantaneous one (see
    EngineState.vel_filt). Returns (CentroidalObs, new_yaw_cont, new_yaw_prev).
    """
    from convex_mpc_tpu.models import kinematics as K

    q, dq = plant.q, plant.dq
    rpy = quat_to_rpy(q[3:7])
    new_cont, new_prev = yaw_unwrap_step(rpy[2], yaw_prev, yaw_cont)
    poses = K.fk(dyn.kin, q)
    R_bw = poses.R[0]
    com, vcom = D.com_state(dyn, q, dq)
    omega_world = ein("ij,j->i", R_bw, dq[3:6])
    vel6 = jnp.concatenate([vcom, omega_world]) if vel_filt is None else vel_filt
    x_vec = jnp.concatenate([com, jnp.stack([rpy[0], rpy[1], new_cont]), vel6])
    obs = R.CentroidalObs(
        x_vec=x_vec,
        R_body_to_world=R_bw,
        foot_levers=poses.foot_w - com[None, :],
        mass=dyn.total_mass,
        inertia_world=D.centroidal_inertia(dyn, q),
    )
    return obs, new_cont, new_prev


@partial(
    jax.jit,
    static_argnames=(
        "n", "steps_per_mpc", "solver_iters", "tau_max", "mpc_dt", "sim_dt", "formulation",
        "use_pallas",
    ),
)
def mpc_cycle_fixed(
    dyn: D.Go2Dyn,
    gait: G.GaitParams,
    contact: P.ContactParams,
    sched: CommandSchedule,
    state: EngineState,
    n: int = 16,
    steps_per_mpc: int = 20,
    solver_iters: int = 200,
    tau_max: float = 45.0,
    mpc_dt: float = (1.0 / 3.0) / 16,
    sim_dt: float = 1e-3,
    q_diag=(1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1),
    r_value: float = 1e-5,
    mu_mpc: float = 0.8,
    fz_min: float = 10.0,
    vel_filter_hz: float = 30.0,
    formulation: str = "condensed",
    use_pallas: bool = False,
) -> tuple[EngineState, CycleLog]:
    """One MPC period on the LEGACY fixed-segment solver (``admm.solve``
    with rho reset each cycle).

    Retained only as the iteration->throughput reference curve (bench.py)
    and for solver-comparison tools/tests; every production behavior claim
    runs :func:`mpc_cycle` / :func:`mpc_cycle_batch` (the certified
    adaptive solver). Safe to ``vmap`` (per-scenario control flow is
    fixed-shape), unlike the batch-global adaptive path."""
    cmd = lookup_command(sched, state.t)

    obs, yaw_cont, yaw_prev = observe(
        dyn, state.plant, state.yaw_cont, state.yaw_prev, state.vel_filt
    )
    traj, refgen = R.generate(
        state.refgen, gait, obs, cmd, state.t, mpc_dt, n
    )
    # Solve in a position-relative frame: the QP is translation-invariant in
    # position, and shifting the origin to the current COM keeps q (and the
    # f32 dual-residual floor) bounded no matter how far the robot walks.
    p0 = traj.x0[0:3]
    x0_s = traj.x0.at[0:3].set(0.0)
    x_ref_s = traj.x_ref.at[:, 0:3].add(-p0)
    qargs = (
        traj.dyn, x0_s, x_ref_s, traj.contact,
        jnp.asarray(q_diag, jnp.float32), r_value, mu_mpc, fz_min,
    )
    if formulation == "condensed":
        # states eliminated: smaller QP, exact dynamics, but a dense-P f32
        # matvec floor means the strict dual tolerance is unreachable while
        # forces are already sub-0.1%-accurate (tests/test_condensed.py) —
        # hence the relaxed eps_dual_abs
        data, _ = condensed.build_condensed(*qargs)
        # carry (x, y) warm starts but reset rho each solve: carried rho
        # ratchets to its clip as the per-cycle Ruiz scaling shifts. The full
        # adaptive search from 0.1 over 4 segments costs extra
        # refactorizations but is what carries the robot through hard
        # command transitions (pinning rho at the steady-state attractor
        # ~1e-5 is ~20% faster but falls in the 2 rad/s-turn -> 0.8 m/s
        # transition of the reference schedule)
        warm = state.solver._replace(rho=jnp.asarray(0.1, jnp.float32))
        sol = admm.solve(
            data, warm, max_iter=solver_iters,
            scaled_termination=True, eps_abs=1e-4, eps_rel=1e-4,
            use_pallas=use_pallas, box_tail=n * 12,
        )
        u0 = sol.x[0:12].reshape(4, 3)
    else:
        data = qp.build_qp(*qargs)
        sol = admm.solve(data, state.solver, max_iter=solver_iters)
        _, u_opt = qp.split_solution(sol.x, n)
        u0 = u_opt[0].reshape(4, 3)

    (plant, leg_state, yaw_cont, yaw_prev, vel_filt, t), ticks = _run_ticks(
        dyn, gait, contact, cmd, traj, u0,
        state.plant, state.leg, yaw_cont, yaw_prev, state.vel_filt, state.t,
        steps_per_mpc, tau_max, sim_dt, vel_filter_hz,
    )

    new_state = EngineState(
        plant=plant,
        leg=leg_state,
        refgen=refgen,
        solver=sol.state,
        yaw_cont=yaw_cont,
        yaw_prev=yaw_prev,
        u0=u0,
        t=t,
        vel_filt=vel_filt,
    )
    log = CycleLog(
        ticks=ticks, solver_iters=sol.iters, prim_res=sol.prim_res, dual_res=sol.dual_res
    )
    return new_state, log


def _run_ticks(
    dyn, gait, contact, cmd, traj, u0,
    plant0, leg0, yaw_cont, yaw_prev, vel_filt0, t0,
    steps_per_mpc: int, tau_max: float, sim_dt: float, vel_filter_hz: float,
):
    """The 1 kHz inner loop of one MPC period (reference test_MPC.py:160-236)."""
    alpha = 1.0 - jnp.exp(-2.0 * jnp.pi * vel_filter_hz * sim_dt)
    # reference-level clip (test_MPC.py:71, +-45) AND the per-joint
    # actuator ctrlrange MuJoCo enforces on the cross-validation plant
    # (hip/thigh 23.7, calf 45.43, go2_params.py:103-105) — both plants
    # must saturate identically or TPU-plant margins overstate.
    from convex_mpc_tpu.models.go2_params import DEFAULT_PARAMS as _gp

    lim = jnp.minimum(
        jnp.tile(
            jnp.array(
                [_gp.hip_torque_max, _gp.thigh_torque_max, _gp.calf_torque_max],
                jnp.float32,
            ),
            4,
        ).reshape(4, 3),
        tau_max,
    )

    def tick(carry, i):
        plant, leg_state, yc, yp, vfilt, t = carry
        rpy = quat_to_rpy(plant.q[3:7])
        yc, yp = yaw_unwrap_step(rpy[2], yp, yc)
        leg_obs = L.make_leg_obs(dyn, plant.q, plant.dq, yc)
        # velocity estimator update (1 kHz, so contact ring is resolvable)
        omega_w = ein("ij,j->i", leg_obs.base_R, plant.dq[3:6])
        raw6 = jnp.concatenate([leg_obs.vel_com_world, omega_w])
        vfilt = vfilt + alpha * (raw6 - vfilt)
        leg_obs = leg_obs._replace(vel_com_world=vfilt[0:3])
        out, leg_state = L.compute_torques(
            leg_state, gait, leg_obs, u0,
            traj.pos_des_world, traj.vel_des_world, cmd.yaw_rate, t,
        )
        tau = jnp.clip(out.tau, -lim, lim)
        x_vec = jnp.concatenate(
            [leg_obs.pos_com_world, jnp.stack([rpy[0], rpy[1], yc]), raw6]
        )
        q_pre = plant.q
        plant = P.step(
            dyn, contact, plant, tau.reshape(12), sim_dt,
            J=leg_obs.J_feet, M=leg_obs.M, bias=leg_obs.bias,
            base_R=leg_obs.base_R, foot_pos=leg_obs.foot_pos,
            foot_vel=leg_obs.foot_vel,
        )
        log = TickLog(
            x_vec=x_vec,
            q=q_pre,
            tau=tau,
            force=u0,
            foot_pos_des=out.pos_des,
            foot_pos_now=out.pos_now,
            contact_mask=G.current_mask(gait, t),
        )
        return (plant, leg_state, yc, yp, vfilt, t + sim_dt), log

    return jax.lax.scan(
        tick,
        (plant0, leg0, yaw_cont, yaw_prev, vel_filt0, t0),
        jnp.arange(steps_per_mpc),
    )


def cycle_update(dyn, gait_i, sched_i, state_i, qd, n, mpc_dt, r_value,
                 mu_mpc, fz_min, brake_accel=0.0, brake_alpha=0.0):
    """Per-scenario "update" stage of the MPC cycle: command lookup +
    observation + reference generation + condensed QP assembly (the
    reference's `update`/`update_model_simplified` + CasADi assembly,
    test_MPC.py:181-205). Split out so tools/time_dashboard.py can time
    update vs solve per cycle with the engine's exact code path."""
    cmd = lookup_command(sched_i, state_i.t)
    obs, yaw_cont, yaw_prev = observe(
        dyn, state_i.plant, state_i.yaw_cont, state_i.yaw_prev, state_i.vel_filt
    )
    traj, refgen = R.generate(
        state_i.refgen, gait_i, obs, cmd, state_i.t, mpc_dt, n,
        brake_accel=brake_accel, brake_alpha=brake_alpha,
    )
    p0 = traj.x0[0:3]
    # block-form QP: the dense (m, nz) constraint matrix is never built
    # (condensed.StructuredQp — solve_adaptive consumes the blocks)
    data, _ = condensed.build_condensed_structured(
        traj.dyn, traj.x0.at[0:3].set(0.0), traj.x_ref.at[:, 0:3].add(-p0),
        traj.contact, qd, r_value, mu_mpc, fz_min,
    )
    return data, traj, refgen, cmd, yaw_cont, yaw_prev


@partial(
    jax.jit,
    static_argnames=(
        "n", "steps_per_mpc", "solver_iters", "tau_max", "mpc_dt", "sim_dt",
        "check_every", "stall_tol", "polish", "use_pallas", "return_polished",
        "brake_accel", "brake_alpha", "use_fused_ticks",
    ),
)
def mpc_cycle_batch(
    dyn: D.Go2Dyn,
    gait: G.GaitParams,
    contact: P.ContactParams,
    sched: CommandSchedule,
    state: EngineState,
    n: int = 16,
    steps_per_mpc: int = 20,
    solver_iters: int = 1000,
    tau_max: float = 45.0,
    mpc_dt: float = (1.0 / 3.0) / 16,
    sim_dt: float = 1e-3,
    q_diag=(1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1),
    r_value: float = 1e-5,
    mu_mpc: float = 0.8,
    fz_min: float = 10.0,
    vel_filter_hz: float = 30.0,
    check_every: int = 25,
    stall_tol: float = 0.02,
    polish: bool = True,
    use_pallas: bool | None = None,
    return_polished: bool = True,
    brake_accel: float = 0.0,
    brake_alpha: float = 0.0,
    use_fused_ticks: bool | None = None,
) -> tuple[EngineState, CycleLog]:
    """One MPC period for a scenario BATCH with the batch-global adaptive solver.

    Unlike ``vmap(mpc_cycle)``, the QP solve here is ONE program over the
    whole batch (``admm.solve_adaptive``): per-scenario convergence and rho
    live inside the loop, iterations stop when every scenario meets the OSQP
    criterion, and KKT refactorizations happen only when some scenario's rho
    actually moved (scalar ``lax.cond``). Steady trot cycles converge in a
    few chunks with one factorization; transition cycles escalate to
    ``solver_iters``. ``gait``/``contact``/``sched``/``state`` leaves all
    carry a leading batch axis. rho warm-carries across cycles (the
    refactor-on-demand logic absorbs Ruiz-scaling drift).
    """
    qd = jnp.asarray(q_diag, jnp.float32)

    def pre(gait_i, sched_i, state_i):
        return cycle_update(
            dyn, gait_i, sched_i, state_i, qd, n, mpc_dt, r_value, mu_mpc,
            fz_min, brake_accel=brake_accel, brake_alpha=brake_alpha,
        )

    data_b, traj_b, refgen_b, cmd_b, yc_b, yp_b = jax.vmap(pre)(gait, sched, state)

    if use_pallas is None:
        # Certified default: the VMEM-resident structured iteration kernel.
        # Its iterates are BITWISE identical to the XLA twin (every
        # reduction is an unrolled block sum or a fixed binary tree —
        # mpc/kernels.py, asserted on real condensed QPs in
        # tests/test_kernels.py), so closed-loop certification transfers
        # between the two paths and the choice is pure performance. Off-TPU
        # the kernel would run in interpret mode; use the twin there.
        use_pallas = jax.default_backend() == "tpu"
    sol = admm.solve_adaptive(
        data_b, state.solver, max_iter=solver_iters, check_every=check_every,
        box_tail=n * 12, stall_tol=stall_tol, polish=polish,
        use_pallas=use_pallas, nu=condensed.NU, return_polished=return_polished,
    )
    return cycle_apply(
        dyn, gait, contact, state, sol, traj_b, refgen_b, cmd_b, yc_b, yp_b,
        solver_iters, steps_per_mpc, tau_max, sim_dt, vel_filter_hz,
        use_fused_ticks=use_fused_ticks,
    )


def cycle_apply(dyn, gait, contact, state, sol, traj_b, refgen_b, cmd_b,
                yc_b, yp_b, solver_iters, steps_per_mpc=20, tau_max=45.0,
                sim_dt=1e-3, vel_filter_hz=30.0, use_fused_ticks=None):
    """Batched "apply" stage of the MPC cycle: 1 kHz leg-control/physics
    ticks from the solved forces + next-cycle state assembly (rho
    warm-carry). Split out for tools/time_dashboard.py (see cycle_update).

    ``use_fused_ticks``: run the whole 20-tick window as ONE batch-last
    Pallas program (sim/tick_fused.py) instead of ``vmap`` over per-tick
    small ops — same semantics at f32 reassociation level
    (tests/test_tick_fused.py). Default: off until the TPU path is
    certified (flip pending closed-loop ensemble/parity re-runs).
    """
    u0_b = sol.x[:, 0:12].reshape(-1, 4, 3)

    if use_fused_ticks is None:
        use_fused_ticks = False

    if use_fused_ticks:
        from convex_mpc_tpu.sim.tick_fused import run_ticks_fused

        (plant, leg_state, yaw_cont, yaw_prev, vel_filt, t), ticks = (
            run_ticks_fused(
                dyn, gait, contact, cmd_b, traj_b, u0_b,
                state.plant, state.leg, yc_b, yp_b, state.vel_filt, state.t,
                steps_per_mpc, tau_max, sim_dt, vel_filter_hz,
            )
        )
    else:
        def post(gait_i, contact_i, cmd_i, traj_i, u0_i, state_i, yc, yp):
            return _run_ticks(
                dyn, gait_i, contact_i, cmd_i, traj_i, u0_i,
                state_i.plant, state_i.leg, yc, yp, state_i.vel_filt,
                state_i.t, steps_per_mpc, tau_max, sim_dt, vel_filter_hz,
            )

        (plant, leg_state, yaw_cont, yaw_prev, vel_filt, t), ticks = jax.vmap(
            post
        )(gait, contact, cmd_b, traj_b, u0_b, state, yc_b, yp_b)

    # rho warm-carry policy: carry the adapted rho only out of EASY cycles
    # (converged within ~one adaptation period) — steady trot then skips the
    # 0.1 -> 1e-4 descent walk entirely (1 factorization, ~50-100 iters).
    # A slow/non-converged cycle signals a transition where the Ruiz scaling
    # shifted: reset to 0.1 so the next solve re-runs the full robust
    # descent from above (the adaptive policy cannot move rho up). Measured:
    # always-carry degrades closed-loop margins at the schedule's hard
    # transitions; always-reset costs ~3x iterations in steady state.
    rho_carry = jnp.where(
        sol.iters < solver_iters,
        jnp.clip(sol.state.rho, 1e-5, 0.1),
        jnp.full_like(sol.state.rho, 0.1),
    )

    new_state = EngineState(
        plant=plant,
        leg=leg_state,
        refgen=refgen_b,
        solver=sol.state._replace(rho=rho_carry),
        yaw_cont=yaw_cont,
        yaw_prev=yaw_prev,
        u0=u0_b,
        t=t,
        vel_filt=vel_filt,
    )
    log = CycleLog(
        ticks=ticks, solver_iters=sol.iters, prim_res=sol.prim_res, dual_res=sol.dual_res
    )
    return new_state, log


def mpc_cycle(
    dyn: D.Go2Dyn,
    gait: G.GaitParams,
    contact: P.ContactParams,
    sched: CommandSchedule,
    state: EngineState,
    **kwargs,
) -> tuple[EngineState, CycleLog]:
    """One MPC period for ONE scenario on the PRODUCTION solver.

    Thin B=1 wrapper over :func:`mpc_cycle_batch`: the QP solve is
    ``admm.solve_adaptive`` with certified polish accepts — the same code
    path (and therefore the same certified numerics) as every batched
    behavior/robustness claim. Accepts all ``mpc_cycle_batch`` keyword
    arguments. Do NOT ``vmap`` this wrapper — use :func:`mpc_cycle_batch`
    directly for batches (its control flow is batch-global); the legacy
    fixed-segment per-scenario path lives on as :func:`mpc_cycle_fixed`.
    """
    b1 = lambda tree: jax.tree.map(lambda x: jnp.asarray(x)[None], tree)
    new_b, log_b = mpc_cycle_batch(
        dyn, b1(gait), b1(contact), b1(sched), b1(state), **kwargs
    )
    sq = lambda tree: jax.tree.map(lambda x: x[0], tree)
    return sq(new_b), sq(log_b)


def broadcast_batch(tree, batch: int):
    """Tile an unbatched pytree (EngineState, GaitParams, ...) to a batch."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (batch,) + jnp.shape(x)).copy(), tree
    )


def simulate(
    dyn: D.Go2Dyn,
    gait: G.GaitParams,
    contact: P.ContactParams,
    sched: CommandSchedule,
    state: EngineState,
    n_cycles: int,
    **cycle_kwargs,
) -> tuple[EngineState, CycleLog]:
    """Run n_cycles MPC periods under one jit-compiled lax.scan (production
    adaptive solver via :func:`mpc_cycle`)."""

    def body(s, _):
        return mpc_cycle(dyn, gait, contact, sched, s, **cycle_kwargs)

    return jax.lax.scan(body, state, None, length=n_cycles)


def simulate_fixed(
    dyn: D.Go2Dyn,
    gait: G.GaitParams,
    contact: P.ContactParams,
    sched: CommandSchedule,
    state: EngineState,
    n_cycles: int,
    **cycle_kwargs,
) -> tuple[EngineState, CycleLog]:
    """:func:`simulate` on the legacy fixed-segment solver
    (:func:`mpc_cycle_fixed`) — solver-comparison use only."""

    def body(s, _):
        return mpc_cycle_fixed(dyn, gait, contact, sched, s, **cycle_kwargs)

    return jax.lax.scan(body, state, None, length=n_cycles)


def simulate_batched(
    dyn: D.Go2Dyn,
    gait: G.GaitParams,
    contact: P.ContactParams,
    sched: CommandSchedule,
    state: EngineState,
    n_cycles: int,
    **cycle_kwargs,
) -> tuple[EngineState, CycleLog]:
    """Batched-engine counterpart of :func:`simulate`: every input pytree
    carries a leading batch axis and the QP solve runs batch-globally with
    the adaptive solver (see :func:`mpc_cycle_batch`). Keep ``n_cycles``
    modest per call on the tunnel-attached TPU (long device programs can
    kill the remote worker); chunk at the host level for long runs."""

    def body(s, _):
        return mpc_cycle_batch(dyn, gait, contact, sched, s, **cycle_kwargs)

    return jax.lax.scan(body, state, None, length=n_cycles)
