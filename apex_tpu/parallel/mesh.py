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


def shard_ppo_state(mesh: Mesh, state, axis: str = "env"):
    """Place a PPOTrainState: runner leaves sharded over the env axis,
    everything else replicated."""
    env_sh = env_sharding(mesh, axis)
    rep = replicated(mesh)

    runner = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, env_sh) if getattr(x, "ndim", 0) >= 1
        else jax.device_put(x, rep),
        state.runner)
    rest = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep),
                                  state.replace(runner=state.runner))
    return rest.replace(runner=runner.replace(rng=jax.device_put(
        state.runner.rng, rep)))
