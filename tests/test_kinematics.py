"""Batched Jacobian builders vs an independent per-body reference.

kinematics.point_jacobians / angular_jacobians collapse the 13-body (and
4-foot) Python loops into one fused graph for the 1 kHz tick. This pins the
refactor against a straight-line per-body re-derivation (tolerance covers
fma-order differences between batched and single matmul lowering; the
MuJoCo oracle tests in test_dynamics_vs_mujoco.py pin absolute physics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_mpc_tpu.models import dynamics as D
from convex_mpc_tpu.models import kinematics as K


@pytest.fixture(scope="module")
def dyn():
    return D.build_dyn()


def _configs(n=5, seed=0):
    rng = np.random.default_rng(seed)
    qs = []
    for _ in range(n):
        quat = rng.normal(size=4)
        quat /= np.linalg.norm(quat)
        q = np.concatenate(
            [rng.normal(size=3) * 0.2 + [0, 0, 0.3], quat,
             rng.uniform(-1.2, 1.2, size=12)]
        )
        qs.append(q)
    return jnp.asarray(np.stack(qs))


def _point_jacobian_ref(poses, point_w, body):
    """Independent NumPy re-derivation of the single-point Jacobian."""
    R0 = np.asarray(poses.R[0], np.float64)
    p0 = np.asarray(poses.p[0], np.float64)
    pt = np.asarray(point_w, np.float64)
    rel = pt - p0
    hat = np.array(
        [[0, -rel[2], rel[1]], [rel[2], 0, -rel[0]], [-rel[1], rel[0], 0]]
    )
    J = np.zeros((3, 18))
    J[:, 0:3] = R0
    J[:, 3:6] = -hat @ R0
    axes = np.asarray(poses.joint_axis_w, np.float64)
    origins = np.asarray(poses.joint_origin_w, np.float64)
    for j in range(12):
        if K._JOINT_MASK[body, j]:
            J[:, 6 + j] = np.cross(axes[j], pt - origins[j])
    return J


def test_point_jacobians_vs_reference(dyn):
    for q in _configs():
        poses = K.fk(dyn.kin, q)
        com_w = poses.p + jnp.einsum("bij,bj->bi", poses.R, dyn.com)
        batched = np.asarray(
            K.point_jacobians(poses, com_w, np.arange(K.NUM_BODIES))
        )
        for b in range(K.NUM_BODIES):
            ref = _point_jacobian_ref(poses, com_w[b], b)
            np.testing.assert_allclose(batched[b], ref, atol=2e-6)


def test_angular_jacobians_vs_reference(dyn):
    for q in _configs(seed=2):
        poses = K.fk(dyn.kin, q)
        batched = np.asarray(
            K.angular_jacobians(poses, np.arange(K.NUM_BODIES))
        )
        axes = np.asarray(poses.joint_axis_w, np.float64)
        for b in range(K.NUM_BODIES):
            ref = np.zeros((3, 18))
            ref[:, 3:6] = np.asarray(poses.R[0], np.float64)
            for j in range(12):
                if K._JOINT_MASK[b, j]:
                    ref[:, 6 + j] = axes[j]
            np.testing.assert_allclose(batched[b], ref, atol=2e-6)


def test_single_body_delegates_bit_equal(dyn):
    """point_jacobian/angular_jacobian are views of the batched path."""
    for q in _configs(seed=1, n=2):
        poses = K.fk(dyn.kin, q)
        batched = K.point_jacobians(poses, poses.foot_w, K.FOOT_BODIES)
        for l in range(4):
            single = K.point_jacobian(poses, poses.foot_w[l], 3 + 3 * l)
            np.testing.assert_array_equal(
                np.asarray(batched[l]), np.asarray(single)
            )


def test_batched_jacobians_under_vmap(dyn):
    """The batched builders vmap over configurations (the engine path)."""
    qs = _configs(seed=3)

    def foot_J(q):
        poses = K.fk(dyn.kin, q)
        return K.point_jacobians(poses, poses.foot_w, K.FOOT_BODIES)

    out = jax.vmap(foot_J)(qs)
    assert out.shape == (qs.shape[0], 4, 3, 18)
    np.testing.assert_array_equal(
        np.asarray(out[0]), np.asarray(foot_J(qs[0]))
    )
