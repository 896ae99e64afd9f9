"""Checkpointing of pytree train states.

Reference behavior: torch.save of whole modules gated on best eval reward
(rl/algos/ppo.py:129-137, 503-505). Here a checkpoint is a pickled
numpy-ified pytree plus its treedef-restoring template, so any flax.struct
train state (params + optimizer + normalizer + env/rng state) round-trips.
"""
from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def save_checkpoint(path: str, state, name: str = "checkpoint.pkl") -> str:
    """Serialize the leaves of `state` to <path>/<name>."""
    os.makedirs(path, exist_ok=True)
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state)]
    full = os.path.join(path, name)
    tmp = full + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(leaves, f)
    os.replace(tmp, full)
    return full


def load_checkpoint(path: str, template, name: str = "checkpoint.pkl"):
    """Restore leaves into the structure of `template` (a state with the same
    treedef, e.g. a freshly initialized one)."""
    full = os.path.join(path, name) if not path.endswith(".pkl") else path
    with open(full, "rb") as f:
        leaves = pickle.load(f)
    treedef = jax.tree_util.tree_structure(template)
    t_leaves = jax.tree_util.tree_leaves(template)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has {len(t_leaves)}")
    leaves = [
        np.asarray(saved, dtype=np.asarray(t).dtype).reshape(np.shape(t))
        for saved, t in zip(leaves, t_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
