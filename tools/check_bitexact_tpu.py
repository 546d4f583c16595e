"""Assert TPU-side bitwise equality of the two solve_adaptive iteration
engines (structured Pallas kernel vs XLA twin) on real engine QPs.

The closed-loop certification (tools/loop_parity.py, tools/ensemble_cert.py)
is measured once and transfers to BOTH paths because their iterates are
bit-identical; this script is the on-hardware witness for that claim (the
CPU test suite can only check interpret mode at allclose level — XLA's CPU
backend FMA-fuses the two programs differently).

Run on the TPU backend:  python tools/check_bitexact_tpu.py

Checks, on a batch of real mid-trot condensed QPs (cold + warm starts):
  1. chunk-level: admm_iterations_structured vs _xla over 1/25/150 iters;
  2. solver-level: full solve_adaptive(use_pallas=True/False) outputs.
Exits nonzero on any mismatch and prints per-field bit diffs.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from convex_mpc_tpu.control import gait as G
from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.mpc import admm
from convex_mpc_tpu.sim import engine as E
from convex_mpc_tpu.sim import physics as P


def real_qp_batch(B=8, cycles=8):
    """Real condensed QPs: B perturbed mid-trot scenarios + a warm state."""
    dyn = D.build_dyn()
    gait = G.make_gait_params(3.0, 0.6)
    sched = E.constant_schedule(vx=0.5)
    gait_b = E.broadcast_batch(gait, B)
    contact_b = E.broadcast_batch(P.default_contact(), B)
    sched_b = E.broadcast_batch(sched, B)
    state = E.init_state(dyn, n=16)
    state = state._replace(plant=P.init_plant(dyn))
    state_b = E.broadcast_batch(state, B)
    # perturb initial lateral velocity per scenario
    dv = jnp.linspace(-0.05, 0.05, B)
    plant = state_b.plant._replace(dq=state_b.plant.dq.at[:, 1].add(dv))
    state_b = state_b._replace(plant=plant)
    for _ in range(cycles):
        state_b, _ = E.mpc_cycle_batch(
            dyn, gait_b, contact_b, sched_b, state_b
        )
    return dyn, gait, sched, state_b


def bitdiff(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    eq = np.array_equal(a.view(np.uint32), b.view(np.uint32))
    if not eq:
        nbad = int((a.view(np.uint32) != b.view(np.uint32)).sum())
        print(f"  FAIL {name}: nbad={nbad}/{a.size} max|d|={np.abs(a - b).max():.3e}")
    else:
        print(f"  ok   {name}: bitwise equal ({a.size} elements)")
    return eq


def main() -> int:
    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend == "cpu":
        print("WARNING: CPU backend — kernel runs in interpret mode; this "
              "witness is only meaningful on TPU.")

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    import test_kernels as TK
    from convex_mpc_tpu.mpc import kernels

    ok = True
    print("[1/2] chunk-level: admm_iterations_structured vs XLA twin")
    args = TK._structured_problem(B=8)
    for iters in (1, 25, 150):
        ax = kernels.admm_iterations_structured_xla(*args, iters=iters)
        ap = kernels.admm_iterations_structured(*args, iters=iters)
        for name, a, b in zip("xzy", ax, ap):
            ok &= bitdiff(f"iters={iters} {name}", a, b)

    print("[2/2] solver-level: solve_adaptive on real engine QPs (warm batch)")
    dyn, gait, sched, state_b = real_qp_batch()
    # one more cycle, capturing the QP the engine actually solves
    from convex_mpc_tpu.mpc import condensed
    from convex_mpc_tpu.control import reference as R

    n = 16
    cmd = jax.vmap(lambda t: E.lookup_command(sched, t))(state_b.t)

    def build(state_i, cmd_i):
        obs, yc, yp = E.observe(
            dyn, state_i.plant, state_i.yaw_cont, state_i.yaw_prev,
            state_i.vel_filt,
        )
        traj, _ = R.generate(
            state_i.refgen, gait, obs, cmd_i, state_i.t, (1 / 3.0) / n, n
        )
        p0 = traj.x0[0:3]
        qd = jnp.asarray([1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1], jnp.float32)
        data, _ = condensed.build_condensed_structured(
            traj.dyn, traj.x0.at[0:3].set(0.0),
            traj.x_ref.at[:, 0:3].add(-p0), traj.contact, qd, 1e-5, 0.8, 10.0,
        )
        return data

    data_b = jax.vmap(build)(state_b, cmd)
    for label, st in (
        ("warm", state_b.solver),
        ("cold", jax.vmap(
            lambda _: admm.init_state(jax.tree.map(lambda x: x[0], data_b))
        )(jnp.arange(data_b.q.shape[0]))),
    ):
        sol_x = admm.solve_adaptive(data_b, st, max_iter=600, box_tail=n * 12)
        sol_p = admm.solve_adaptive(
            data_b, st, max_iter=600, box_tail=n * 12, use_pallas=True
        )
        ok &= bitdiff(f"{label} iters", sol_x.iters, sol_p.iters)
        for name in ("x", "z", "y", "rho"):
            ok &= bitdiff(
                f"{label} state.{name}",
                getattr(sol_x.state, name), getattr(sol_p.state, name),
            )

    print("RESULT:", "BITWISE EQUAL" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
