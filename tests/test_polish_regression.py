"""Regression: certified polish on the real mask-edge warm-start population.

The 8 QP instances in tests/data/mask_edge_qps.npz are the hardest cycles
captured from a full 10 s reference-schedule closed-loop run (tuned profile,
`tools/loop_parity.py --save`): contact-mask-edge cycles whose warm starts
point at the previous active set. Round-1's fixed-iteration solver left these
2-7% from the f64 optimum inside the iteration budget — the "~2% of cycles
over the 2% parity budget" gap flagged by the round-1 review. The adaptive
solver's projector-based certified polish (mpc/admm.py attempt_polish) must
land every one of them inside the budget from the captured warm state.

Each instance carries the exact condensed QpData, the engine's warm solver
state entering that cycle, and the first-step forces of the independent
native f64 oracle (KKT-validated < 1e-6 at fixture creation). Regenerate
with tools/loop_parity.py --tuned --schedule ref --adaptive --save and the
dump/fixture recipe in the fixture's creation commit.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from convex_mpc_tpu.mpc import admm
from convex_mpc_tpu.mpc.qp import QpData

FIXTURE = Path(__file__).parent / "data" / "mask_edge_qps.npz"


def _load():
    z = np.load(FIXTURE)
    cycles = [int(c) for c in z["cycles"]]
    qp_b = QpData(*[
        jnp.asarray(np.stack([z[f"c{c}_{f}"] for c in cycles]))
        for f in QpData._fields
    ])
    warm_b = admm.AdmmState(
        x=jnp.asarray(np.stack([z[f"c{c}_warm_x"] for c in cycles])),
        z=jnp.asarray(np.stack([z[f"c{c}_warm_z"] for c in cycles])),
        y=jnp.asarray(np.stack([z[f"c{c}_warm_y"] for c in cycles])),
        rho=jnp.asarray(np.stack([z[f"c{c}_warm_rho"] for c in cycles])),
    )
    u_ref = np.stack([z[f"c{c}_u_ref"] for c in cycles])
    return cycles, qp_b, warm_b, u_ref


def test_mask_edge_warm_starts_within_budget():
    cycles, qp_b, warm_b, u_ref = _load()
    sol = admm.solve_adaptive(qp_b, warm_b, max_iter=1000, box_tail=192)
    u = np.asarray(sol.x[:, :12], float)
    scale = np.maximum(np.abs(u_ref).max(axis=1), 1.0)
    err = np.abs(u - u_ref).max(axis=1) / scale * 100
    assert (err < 2.0).all(), dict(zip(cycles, err.round(3)))
    # the population mean should sit well inside the budget, not at its edge
    assert err.mean() < 1.0, err.mean()


def test_mask_edge_cold_starts_within_budget():
    """Cold starts on the same hard instances must also certify (the rescue
    path plus accuracy-gated rho walk, no inherited active set)."""
    cycles, qp_b, warm_b, u_ref = _load()
    cold = admm.AdmmState(
        x=jnp.zeros_like(warm_b.x), z=jnp.zeros_like(warm_b.z),
        y=jnp.zeros_like(warm_b.y), rho=jnp.full_like(warm_b.rho, 0.1),
    )
    sol = admm.solve_adaptive(qp_b, cold, max_iter=1000, box_tail=192)
    u = np.asarray(sol.x[:, :12], float)
    scale = np.maximum(np.abs(u_ref).max(axis=1), 1.0)
    err = np.abs(u - u_ref).max(axis=1) / scale * 100
    assert (err < 2.0).all(), dict(zip(cycles, err.round(3)))
