"""Device-mesh utilities: env-axis data parallelism for RL training.

TPU-native replacement for the reference's Ray cluster scale-out
(`ray.init(redis_address=...)`, reference apex.py:130,207,227 + SURVEY.md
section 2.3): environments are sharded along an `env` mesh axis, parameters
replicated, and XLA inserts the psum reductions that replace Ray's
pickled-buffer merges (reference ppo.py:216-235). Multi-host runs use the
same code path via jax.distributed.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "env") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def env_sharding(mesh: Mesh, axis: str = "env") -> NamedSharding:
    """Leading-axis (env-fleet) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_runner(mesh: Mesh, runner, axis: str = "env"):
    """Place a RunnerState: per-env leaves (leading dim == fleet size)
    sharded over the env axis, everything else (rng key, scalars)
    replicated.

    The `rng` leaf is ALWAYS replicated by name: a (2,)-shaped PRNG key
    matches the shape heuristic when the fleet happens to be 2 envs wide,
    which would silently split the key across devices (the bug fixed in
    commit 27b1560)."""
    env_sh = env_sharding(mesh, axis)
    rep = replicated(mesh)
    num_envs = runner.obs.shape[0]
    rng_leaf = getattr(runner, "rng", None)

    def place(x):
        if x is rng_leaf:
            return jax.device_put(x, rep)
        if (getattr(x, "ndim", 0) >= 1 and x.shape[0] == num_envs
                and x.dtype != jax.numpy.uint32):
            return jax.device_put(x, env_sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, runner)


def shard_ppo_state(mesh: Mesh, state, axis: str = "env"):
    """Place a PPOTrainState: runner leaves sharded over the env axis,
    everything else (params, opt state, normalizer, rng) replicated."""
    rep = replicated(mesh)
    runner = shard_runner(mesh, state.runner, axis)
    rest = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep),
                                  state.replace(runner=state.runner))
    return rest.replace(runner=runner)
