"""Device-mesh scale-out for batched MPC rollouts.

The reference is a single-process, single-robot CPU program (SURVEY.md
section 2.2); the scale dimension of this framework is the *scenario batch*
(gait x velocity-command x terrain-friction sweeps, BASELINE.json). The
parallel design follows the standard JAX recipe:

- a 1-D ``Mesh`` over all devices with axis name ``"batch"``;
- the scenario batch is sharded over that axis with ``NamedSharding``; the
  per-scenario QP solves and physics steps are embarrassingly parallel, so
  the only collectives are ``psum``-style metric reductions inside
  ``shard_map`` (convergence counts, tracking-error aggregates) which ride
  ICI within a slice and DCN across hosts;
- multi-host: call :func:`init_distributed` first (jax.distributed), then
  build the mesh over ``jax.devices()`` as usual — each host feeds its local
  shard of the batch.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed for multi-host pods (no-op if single host).

    On TPU pods with the standard launcher the arguments are auto-detected.
    """
    if num_processes is not None and num_processes > 1 or coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'batch'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading (scenario) axis across the mesh."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every leaf of a batched pytree with its leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def sharded_rollout_fn(
    mesh: Mesh,
    step_fn: Callable,
    metric_fn: Callable | None = None,
):
    """Wrap a batched `state -> state` step into a mesh-sharded step.

    ``step_fn`` must already be vmapped over the leading scenario axis.
    Returns ``fn(state_batch) -> (state_batch, metrics)`` where metrics are
    globally reduced over the whole batch via an all-reduce on the mesh
    (``metric_fn(state_batch) -> dict of (local_batch,) arrays`` means are
    taken; None gives an empty dict).
    """

    def inner(state):
        new_state = step_fn(state)
        if metric_fn is None:
            metrics = {}
        else:
            local = metric_fn(new_state)
            # global mean over the sharded batch axis: sum + count via psum
            def reduce_mean(v):
                s = jax.lax.psum(jnp.sum(v), BATCH_AXIS)
                c = jax.lax.psum(jnp.asarray(v.shape[0], v.dtype), BATCH_AXIS)
                return s / c

            metrics = {k: reduce_mean(v) for k, v in local.items()}
        return new_state, metrics

    spec = P(BATCH_AXIS)
    return jax.jit(
        jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(spec,),
            out_specs=(spec, P()),
            check_vma=False,
        )
    )
