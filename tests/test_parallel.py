"""Mesh sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from convex_mpc_tpu.parallel import mesh as M


def test_mesh_and_sharding():
    mesh = M.make_mesh()
    assert mesh.devices.size == 8
    x = jnp.arange(16.0).reshape(16, 1)
    xs = jax.device_put(x, M.batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8


def test_sharded_rollout_fn_psum():
    mesh = M.make_mesh()

    class S(dict):
        pass

    def step(batch):  # batched leading axis
        return batch + 1.0

    def metric(batch):
        return {"mean": batch[:, 0]}

    fn = M.sharded_rollout_fn(mesh, step, metric)
    x = jnp.tile(jnp.arange(16.0)[:, None], (1, 3))
    xb = jax.device_put(x, M.batch_sharding(mesh))
    out, metrics = fn(xb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) + 1.0)
    # global mean over all shards, not per-shard
    np.testing.assert_allclose(float(metrics["mean"]), np.mean(np.arange(16.0) + 1.0))


def test_full_engine_step_sharded():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
