"""Single-rigid-body (SRB) centroidal dynamics and exact ZOH discretization.

State x = [p_com_world(3), rpy_world(3), v_com_world(3), omega_world(3)] (12,)
Input u = [f_FL(3), f_FR(3), f_RL(3), f_RR(3)] world contact forces (12,)

Continuous model (reference com_trajectory.py:221-270):

    p_dot   = v
    rpy_dot = R_z(yaw_avg)^T @ omega        (yaw-averaged small-angle map)
    v_dot   = (1/m) * sum_i f_i + g
    w_dot   = I_w^{-1} * sum_i (r_i x f_i)  = sum_i I_w^{-1} @ hat(r_i) @ f_i

Key analytic property the reference misses: **Ac is nilpotent, Ac^2 = 0**
(only the (p <- v) and (rpy <- omega) blocks are nonzero). Hence the
zero-order-hold discretization is exact in closed form:

    Ad   = I + Ac*dt
    Bd_k = (I*dt + Ac*dt^2/2) @ Bc_k
    gd   = (I*dt + Ac*dt^2/2) @ gc

replacing the reference's 16x ``scipy.signal.cont2discrete`` + 50-point
trapezoid of ``expm`` (com_trajectory.py:272-286) with a few fused matmuls —
exact, jit-friendly, and trivially batched over horizon and scenarios.
Validated against scipy in tests/test_srb.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from jax import lax

from convex_mpc_tpu.ops.rotations import hat, rot_z

# These 12x12 ops are tiny but feed the QP data; on TPU the *default* matmul
# precision truncates f32 operands to bf16, which is visible (~3e-3 relative)
# in the discrete dynamics and would eat the entire 2% force-parity budget.
# Pin full f32 precision here — cost is negligible at this size.
_PRECISION = lax.Precision.HIGHEST

GRAVITY = 9.81
NX = 12
NU = 12


class SrbDynamics(NamedTuple):
    """Discrete-time SRB dynamics over an N-step horizon (batchable pytree)."""

    Ad: jnp.ndarray  # (12, 12) — constant over the horizon
    Bd: jnp.ndarray  # (N, 12, 12) — per-step input map (depends on foot levers)
    gd: jnp.ndarray  # (12,) — discrete gravity increment


def continuous_A(yaw_avg) -> jnp.ndarray:
    """Continuous-time A(yaw_avg) (12, 12) (reference com_trajectory.py:226-239)."""
    A = jnp.zeros((NX, NX))
    A = A.at[0:3, 6:9].set(jnp.eye(3))
    A = A.at[3:6, 9:12].set(rot_z(yaw_avg).T)
    return A


def continuous_B(r_feet_world: jnp.ndarray, mass, inertia_world: jnp.ndarray) -> jnp.ndarray:
    """Continuous-time input map Bc for one horizon step -> (12, 12).

    r_feet_world: (4, 3) COM->foot lever arms in world frame, order [FL,FR,RL,RR]
    (zeroed for swing legs by the reference trajectory generator).
    Reference com_trajectory.py:241-262.
    """
    I_inv = jnp.linalg.inv(inertia_world)  # (3,3)
    top = jnp.zeros((6, NU))
    lin = jnp.tile(jnp.eye(3) / mass, (1, 4))  # (3, 12)
    ang_blocks = jnp.einsum(
        "ij,fjk->fik", I_inv, hat(r_feet_world), precision=_PRECISION
    )  # (4, 3, 3)
    ang = jnp.concatenate([ang_blocks[i] for i in range(4)], axis=1)  # (3, 12)
    return jnp.concatenate([top, lin[None].reshape(3, NU), ang], axis=0)


def continuous_g() -> jnp.ndarray:
    """Continuous gravity vector gc (12,) (reference com_trajectory.py:264-270)."""
    return jnp.zeros((NX,)).at[8].set(-GRAVITY)


def discretize(
    yaw_avg,
    r_feet_world: jnp.ndarray,  # (N, 4, 3) per-step foot levers, world
    mass,
    inertia_world: jnp.ndarray,  # (3, 3) centroidal inertia in world axes
    dt,
) -> SrbDynamics:
    """Exact ZOH discretization of the SRB model over the horizon.

    Because Ac^2 = 0:  e^{Ac t} = I + Ac t, and
    int_0^dt e^{Ac s} ds = I dt + Ac dt^2/2  exactly.
    """
    import jax

    Ac = continuous_A(yaw_avg)
    E = jnp.eye(NX) * dt + Ac * (dt * dt / 2.0)  # ∫ e^{Ac s} ds

    Ad = jnp.eye(NX) + Ac * dt

    # Bc batched over the horizon. Build blocks directly to keep it fused:
    n = r_feet_world.shape[0]
    with jax.default_matmul_precision("highest"):
        I_inv = jnp.linalg.inv(inertia_world)
    ang = jnp.einsum("ij,nfjk->nfik", I_inv, hat(r_feet_world), precision=_PRECISION)  # (N, 4, 3, 3)
    ang = ang.transpose(0, 2, 1, 3).reshape(n, 3, NU)  # (N, 3, 12)
    lin = jnp.broadcast_to(jnp.tile(jnp.eye(3) / mass, (1, 4)), (n, 3, NU))
    Bc = jnp.concatenate([jnp.zeros((n, 6, NU)), lin, ang], axis=1)  # (N, 12, 12)

    Bd = jnp.einsum("ij,njk->nik", E, Bc, precision=_PRECISION)
    gd = jnp.matmul(E, continuous_g(), precision=_PRECISION)
    return SrbDynamics(Ad=Ad, Bd=Bd, gd=gd)


def rollout(dyn: SrbDynamics, x0: jnp.ndarray, u_seq: jnp.ndarray) -> jnp.ndarray:
    """Open-loop SRB rollout: x_{k+1} = Ad x_k + Bd_k u_k + gd -> (N+1, 12).

    Working equivalent of the reference's dead `run_simulation`
    (go2_robot_data.py:362-375), used by tests and the open-loop validation
    plots (reference test_MPC.py:256-266).
    """
    import jax

    def step(x, inputs):
        Bd_k, u_k = inputs
        x_next = (
            jnp.matmul(dyn.Ad, x, precision=_PRECISION)
            + jnp.matmul(Bd_k, u_k, precision=_PRECISION)
            + dyn.gd
        )
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, (dyn.Bd, u_seq))
    return jnp.concatenate([x0[None], xs], axis=0)
