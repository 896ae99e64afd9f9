"""HBM-resident ring replay buffer.

TPU-native replacement for the reference's replay servers: the Ray-actor
deque (`ReplayBuffer_remote`, rl/utils/remote_replay.py:18-62) and the
list-based ring (`ReplayBuffer`, :65-108). Transitions live in fixed-size
device arrays; add is a dynamic_update_slice from the rollout scan, sample
is a gather -- no host round-trips (SURVEY.md section 2.3 "HBM-resident ring
buffer").
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    obs: jnp.ndarray        # (cap, obs_dim)
    action: jnp.ndarray     # (cap, act_dim)
    reward: jnp.ndarray     # (cap,)
    next_obs: jnp.ndarray   # (cap, obs_dim)
    not_done: jnp.ndarray   # (cap,) 1.0 if episode continued
    ptr: jnp.ndarray        # scalar int: next write position
    size: jnp.ndarray       # scalar int: filled entries

    @staticmethod
    def create(capacity: int, obs_dim: int, act_dim: int) -> "ReplayBuffer":
        return ReplayBuffer(
            obs=jnp.zeros((capacity, obs_dim)),
            action=jnp.zeros((capacity, act_dim)),
            reward=jnp.zeros((capacity,)),
            next_obs=jnp.zeros((capacity, obs_dim)),
            not_done=jnp.zeros((capacity,)),
            ptr=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]

    def add_batch(self, obs, action, reward, next_obs, not_done
                  ) -> "ReplayBuffer":
        """Bulk insert N transitions (reference add_bulk,
        remote_replay.py:34-44). N must be static; wraps modulo capacity."""
        n = obs.shape[0]
        cap = self.capacity
        idx = (self.ptr + jnp.arange(n)) % cap
        return self.replace(
            obs=self.obs.at[idx].set(obs),
            action=self.action.at[idx].set(action),
            reward=self.reward.at[idx].set(reward),
            next_obs=self.next_obs.at[idx].set(next_obs),
            not_done=self.not_done.at[idx].set(not_done),
            ptr=(self.ptr + n) % cap,
            size=jnp.minimum(self.size + n, cap),
        )

    def sample(self, rng, batch_size: int):
        """Uniform sample (reference remote_replay.py:46-62)."""
        idx = jax.random.randint(rng, (batch_size,), 0,
                                 jnp.maximum(self.size, 1))
        return (self.obs[idx], self.action[idx], self.reward[idx],
                self.next_obs[idx], self.not_done[idx])
