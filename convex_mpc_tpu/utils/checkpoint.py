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


def save_pytree(path, tree) -> None:
    """Save a pytree of arrays to an .npz (leaf paths as keys)."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for key_path, leaf in leaves_with_paths:
        key = jax.tree_util.keystr(key_path)
        arrays[key] = np.asarray(leaf)
    np.savez_compressed(Path(path), **arrays)


def load_pytree(path, like):
    """Load an .npz saved by :func:`save_pytree` into the structure of `like`.

    ``like`` provides the pytree structure (e.g. a freshly-initialized
    EngineState); dtypes follow the saved arrays.
    """
    data = np.load(Path(path))
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
