"""Equivalence of the fused batch-last tick window vs the per-scenario path.

The fused Pallas window kernel (sim/tick_fused.py) must reproduce
``jax.vmap(engine._run_ticks)`` — the certified 1 kHz semantics — at f32
reassociation level: same FK/Jacobians/mass-matrix/bias/controller/plant
math, different layout and association order. Tolerances are loose-ish
because the stiff penalty contact amplifies reassociation-level diffs over
a 20-tick window (observed ~1e-4 relative after 20 ticks).

Runs the kernel through the Pallas interpreter on CPU (same code path the
TPU compiles) and the plain-XLA scan twin.
"""

from __future__ import annotations

from collections import namedtuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_mpc_tpu.control import gait as G
from convex_mpc_tpu.control import leg as L
from convex_mpc_tpu.control import reference as R
from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.sim import engine as E
from convex_mpc_tpu.sim import physics as P
from convex_mpc_tpu.sim import tick_fused as TF

_Traj = namedtuple("_Traj", ["pos_des_world", "vel_des_world"])


def _battery(B: int, seed: int = 0):
    """Random mid-gait batch covering swing/stance edges and contact."""
    rng = np.random.default_rng(seed)
    dyn = D.build_dyn()
    contact = P.default_contact()
    gait = G.make_gait_params(3.0, 0.6)
    plant = P.init_plant(dyn, contact=contact)

    q = np.tile(np.asarray(plant.q), (B, 1))
    q[:, 0:2] += rng.normal(0, 0.02, (B, 2))
    q[:, 2] += rng.normal(0, 0.01, B)
    q[:, 7:] += rng.normal(0, 0.05, (B, 12))
    plant_b = P.PlantState(
        q=jnp.asarray(q, jnp.float32),
        dq=jnp.asarray(rng.normal(0, 0.2, (B, 18)), jnp.float32),
    )
    leg_b = L.LegControlState(
        last_mask=jnp.asarray(rng.integers(0, 3, (B, 4)), jnp.int32),
        takeoff_time=jnp.asarray(rng.uniform(0, 0.05, (B, 4)), jnp.float32),
        swing_p0=jnp.asarray(
            rng.normal(0, 0.01, (B, 4, 3)) + np.array([0.2, 0.15, 0.02]),
            jnp.float32,
        ),
        swing_td=jnp.asarray(
            rng.normal(0, 0.01, (B, 4, 3)) + np.array([0.25, 0.15, 0.02]),
            jnp.float32,
        ),
    )
    u0_b = jnp.asarray(
        rng.normal(0, 5, (B, 4, 3)) + np.array([0, 0, 40.0]), jnp.float32
    )
    cmd_b = R.BodyCommand(
        vx=jnp.full((B,), 0.5),
        vy=jnp.zeros(B),
        z_pos=jnp.full((B,), 0.27),
        yaw_rate=jnp.asarray(rng.normal(0, 0.5, B), jnp.float32),
    )
    traj_b = _Traj(
        pos_des_world=jnp.asarray(q[:, 0:3] + np.array([0.02, 0, 0]), jnp.float32),
        vel_des_world=jnp.asarray(np.tile([0.5, 0, 0.0], (B, 1)), jnp.float32),
    )
    args = (
        dyn, E.broadcast_batch(gait, B), E.broadcast_batch(contact, B),
        cmd_b, traj_b, u0_b, plant_b, leg_b,
        jnp.asarray(rng.normal(0, 0.1, B), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, B), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (B, 6)), jnp.float32),
        jnp.asarray(rng.uniform(0.1, 0.4, B), jnp.float32),
    )
    return args


def _reference(args, steps=20, tau_max=45.0, sim_dt=1e-3, vfh=30.0):
    dyn = args[0]

    def post(gait_i, contact_i, cmd_i, traj_i, u0_i, plant_i, leg_i, yc, yp,
             vf, t):
        return E._run_ticks(
            dyn, gait_i, contact_i, cmd_i, traj_i, u0_i, plant_i, leg_i,
            yc, yp, vf, t, steps, tau_max, sim_dt, vfh,
        )

    return jax.vmap(post)(*args[1:])


def _assert_close(ref, fus, rtol):
    ref_c, ref_t = ref
    fus_c, fus_t = fus
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_c), jax.tree_util.tree_leaves(fus_c)
    ):
        a32 = jnp.asarray(a, jnp.float32)
        b32 = jnp.asarray(b, jnp.float32)
        scale = float(jnp.max(jnp.abs(a32))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(b32), np.asarray(a32), atol=rtol * scale, rtol=0
        )
    for f in ref_t._fields:
        a32 = jnp.asarray(getattr(ref_t, f), jnp.float32)
        b32 = jnp.asarray(getattr(fus_t, f), jnp.float32)
        scale = float(jnp.max(jnp.abs(a32))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(b32), np.asarray(a32), atol=rtol * scale, rtol=0,
            err_msg=f"ticks.{f}",
        )


def test_fused_interpret_matches_reference():
    args = _battery(B=6, seed=0)
    ref = _reference(args)
    fus = TF.run_ticks_fused(
        *args, 20, 45.0, 1e-3, 30.0, block_n=8, interpret=True
    )
    # contact-amplified reassociation: ~1e-4 rel observed; gate at 5e-3
    _assert_close(ref, fus, rtol=5e-3)


def test_fused_padding_partial_block():
    """B not a multiple of block_n: padded lanes must not leak into results."""
    args = _battery(B=5, seed=1)
    ref = _reference(args)
    fus = TF.run_ticks_fused(
        *args, 20, 45.0, 1e-3, 30.0, block_n=4, interpret=True
    )
    _assert_close(ref, fus, rtol=5e-3)


def test_xla_twin_matches_reference_one_tick():
    """One tick through the scan twin: tight tolerance (no contact buildup)."""
    args = _battery(B=4, seed=2)
    ref = _reference(args, steps=1)
    fus = TF.run_ticks_fused(
        *args, 1, 45.0, 1e-3, 30.0, block_n=4, interpret=True
    )
    _assert_close(ref, fus, rtol=2e-4)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="real-kernel path needs TPU"
)
def test_fused_kernel_on_tpu():
    args = _battery(B=8, seed=3)
    ref = _reference(args)
    fus = TF.run_ticks_fused(
        *args, 20, 45.0, 1e-3, 30.0, block_n=8, interpret=False
    )
    _assert_close(ref, fus, rtol=5e-3)
