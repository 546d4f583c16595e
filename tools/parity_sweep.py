"""Force-parity sweep: the TPU solver vs the native f64 oracle at scale.

Certifies the BASELINE metric — "contact-force trajectories within 2% of the
CasADi/OSQP reference" — by solving many randomized trot QP instances with
both the batched JAX ADMM (condensed, engine settings) and the independent
C++ float64 oracle (native/qp_solver.cpp), and reporting the error
distribution of the applied (first-step) forces.

Usage: python tools/parity_sweep.py [--n 50] [--iters 400] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    import qp_oracle as oracle
    from convex_mpc_tpu.control.srb import SrbDynamics
    from convex_mpc_tpu.mpc import admm, condensed
    from convex_mpc_tpu.utils.native_oracle import solve_qp_native

    Q = np.array([1, 1, 50, 10, 20, 1, 2, 2, 1, 1, 1, 1], float)
    rng = np.random.default_rng(0)

    # mirror the engine's production solver settings (sim/engine.py)
    solve = jax.jit(
        lambda d, s: admm.solve(
            d, s, max_iter=args.iters, scaled_termination=True,
            eps_abs=1e-4, eps_rel=1e-4, box_tail=192,
        )
    )

    errs, kkts = [], []
    for i in range(args.n):
        sc = oracle.trot_scenario(
            t0=float(rng.uniform(0, 0.4)),
            vx=float(rng.uniform(-0.3, 0.8)),
            vy=float(rng.uniform(-0.3, 0.3)),
            wz=float(rng.uniform(-2, 2)),
            yaw0=float(rng.uniform(-3, 3)),
            seed=i,
        )
        d = oracle.assemble_qp(
            sc["Ad"], sc["Bd"], sc["gd"], sc["x0"], sc["x_ref"], sc["contact"],
            Q, 1e-5, 0.8, 10.0,
        )
        x_ref64, _, info = solve_qp_native(
            d["P"], d["q"], d["A"], d["l"], d["u"], max_iter=8000
        )
        if info["kkt"] > 1e-6:  # rare hard instance: give the oracle more iters
            x_ref64, _, info = solve_qp_native(
                d["P"], d["q"], d["A"], d["l"], d["u"], max_iter=60000
            )
        kkts.append(info["kkt"])
        u_ref = x_ref64[192:].reshape(16, 12)

        dyn = SrbDynamics(
            Ad=jnp.asarray(sc["Ad"], jnp.float32),
            Bd=jnp.asarray(sc["Bd"], jnp.float32),
            gd=jnp.asarray(sc["gd"], jnp.float32),
        )
        data, _ = condensed.build_condensed(
            dyn,
            jnp.asarray(sc["x0"], jnp.float32),
            jnp.asarray(sc["x_ref"], jnp.float32),
            jnp.asarray(sc["contact"]),
            jnp.asarray(Q, jnp.float32),
            1e-5, 0.8, 10.0,
        )
        st = admm.init_state(data)._replace(rho=jnp.asarray(0.1, jnp.float32))
        sol = solve(data, st)
        u = np.asarray(sol.x).reshape(16, 12)
        scale = max(np.abs(u_ref[0]).max(), 1.0)
        errs.append(np.abs(u[0] - u_ref[0]).max() / scale)

    errs = np.asarray(errs) * 100
    print(f"instances: {args.n}  (oracle worst KKT residual {max(kkts):.2e})")
    print(
        f"first-step force error vs f64 optimum [%]: "
        f"mean {errs.mean():.3f}  p50 {np.percentile(errs, 50):.3f}  "
        f"p95 {np.percentile(errs, 95):.3f}  max {errs.max():.3f}"
    )
    budget = 2.0
    n_over = int((errs > budget).sum())
    print(f"over the {budget}% BASELINE budget: {n_over}/{args.n}")
    sys.exit(0 if n_over == 0 else 1)


if __name__ == "__main__":
    main()
