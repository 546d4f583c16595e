"""Checkpoint/resume of engine and scenario-batch state.

The reference has no checkpointing (SURVEY.md section 5.4); its closest
analog is the in-memory q/tau logs feeding deterministic replay. For long
batched sweeps on pods this module saves any pytree of arrays (EngineState,
ScenarioBatch, logs) to a single ``.npz`` and restores it with the original
tree structure — dependency-free and portable. For multi-host sharded
state, gather-to-host before saving (parallel.mesh keeps the batch axis
shardable, so a restored batch can be re-sharded with ``shard_batch``).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def _npz_path(path) -> Path:
    # np.savez appends ".npz" when absent; normalize so save/load agree on
    # the on-disk name regardless of the suffix the caller passed.
    p = Path(path)
    return p if p.suffix == ".npz" else p.with_suffix(p.suffix + ".npz")


def save_pytree(path, tree) -> None:
    """Save a pytree of arrays to an .npz (leaf paths as keys)."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for key_path, leaf in leaves_with_paths:
        key = jax.tree_util.keystr(key_path)
        arrays[key] = np.asarray(leaf)
    np.savez_compressed(_npz_path(path), **arrays)


def load_pytree(path, like):
    """Load an .npz saved by :func:`save_pytree` into the structure of `like`.

    ``like`` provides the pytree structure (e.g. a freshly-initialized
    EngineState). Loaded leaves go through ``jnp.asarray``, so under the
    default JAX config (x64 disabled) any float64 leaves saved from host
    NumPy come back as float32 — the engine state is f32 throughout, so
    round-trips are exact; enable ``jax_enable_x64`` before loading if f64
    leaves must survive.
    """
    data = np.load(_npz_path(path))
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for key_path, leaf in leaves_with_paths:
        key = jax.tree_util.keystr(key_path)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        saved = data[key]
        if np.shape(saved) != np.shape(leaf):
            raise ValueError(
                f"checkpoint leaf {key!r} shape {saved.shape} != expected {np.shape(leaf)}"
            )
        new_leaves.append(jax.numpy.asarray(saved))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
