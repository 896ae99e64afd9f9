"""Functional environment protocol + vectorized auto-reset machinery.

The reference wraps stateful python envs in `WrapEnv` (rl/envs/wrappers.py:5-20,
a batch-of-1 facade) and fans rollouts across Ray worker processes
(rl/algos/ppo.py:139-237). Here an environment is a *static* object exposing
pure functions over explicit state pytrees:

    state, obs            = env.reset(rng)
    state, obs, r, term, info = env.step(state, action, rng)

so a fleet of N envs is just `vmap(env.step)` inside one jitted program -- the
TPU-native replacement for rollout worker processes (SURVEY.md section 2.3).

Termination semantics: `terminated` is environment death only. Time-limit
truncation (reference max_traj_len, ppo.py:170) is handled by the rollout
engine, which bootstraps the critic value at truncations (ppo.py:183-184).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class Env:
    """Static environment description; subclasses implement pure reset/step.

    Attributes mirrored from the reference env surface:
      observation_size / action_size   (cassie.py:49-68)
      mirrored_obs / mirrored_acts     signed mirror index lists (cassie.py:64-69,
                                       244-255) or None
      clock_inds                       indices of the sin/cos clock in the obs
                                       (cassie.py:264-270) or None
    """

    observation_size: int
    action_size: int
    mirrored_obs: Optional[Sequence[float]] = None
    mirrored_acts: Optional[Sequence[float]] = None
    clock_inds: Optional[Sequence[int]] = None

    def reset(self, rng) -> Tuple[Any, jnp.ndarray]:
        raise NotImplementedError

    def step(self, state, action, rng) -> Tuple[Any, jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict]:
        raise NotImplementedError


def mirror_matrix(mirrored: Sequence[float]) -> np.ndarray:
    """Signed permutation matrix from a mirror index list.

    Matches reference _get_symmetry_matrix (rl/envs/wrappers.py:70-77): entry
    (i, |m_i|) = sign(m_i); the -0.1 trick encodes "negate index 0".
    Returned as (n, n) so mirrored = obs @ M.
    """
    n = len(mirrored)
    mat = np.zeros((n, n), dtype=np.float32)
    for i, m in enumerate(mirrored):
        mat[i, int(abs(m))] = np.sign(m)
    # obs @ M convention (wrappers.py:51-54 uses act @ matrix with matrix built
    # transposed relative to this loop; building M^T here keeps obs @ M correct)
    return mat.T


def mirror_clock(obs_mirrored: jnp.ndarray, clock_inds: Sequence[int]) -> jnp.ndarray:
    """Advance the sin/cos clock by half a period after mirroring.

    Reference mirror_clock_observation (wrappers.py:59-67):
    sin(arcsin(clock) + pi) = -clock for both the sin and cos entries.
    """
    clock_inds = jnp.asarray(list(clock_inds))
    return obs_mirrored.at[..., clock_inds].multiply(-1.0)


@struct.dataclass
class PointMassState:
    """Toy-env state: planar double integrator tracking a commanded velocity."""
    pos: jnp.ndarray
    vel: jnp.ndarray
    cmd: jnp.ndarray
    t: jnp.ndarray


class PointMassEnv(Env):
    """Minimal pure-JAX control env used to validate the full training stack
    (learner, GAE, normalizer, mirror loss plumbing) before the physics engine.

    Obs: [vel(2), cmd(2)]; action: accel(2); reward: exp(-|vel-cmd|) with a
    small action penalty. Mirror symmetry: flipping y of everything.
    """

    observation_size = 4
    action_size = 2
    # flip sign of the y components: obs [vx, -vy, cx, -cy], act [ax, -ay]
    mirrored_obs = [0.1, -1, 2, -3]
    mirrored_acts = [0.1, -1]
    clock_inds = None

    def __init__(self, dt: float = 0.05, max_cmd: float = 1.0):
        self.dt = dt
        self.max_cmd = max_cmd

    def reset(self, rng):
        k1, k2 = jax.random.split(rng)
        cmd = jax.random.uniform(k1, (2,), minval=-self.max_cmd, maxval=self.max_cmd)
        vel = 0.1 * jax.random.normal(k2, (2,))
        state = PointMassState(pos=jnp.zeros(2), vel=vel, cmd=cmd,
                               t=jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    def _obs(self, state):
        return jnp.concatenate([state.vel, state.cmd])

    def step(self, state, action, rng):
        action = jnp.clip(action, -1.0, 1.0)
        vel = state.vel + self.dt * action
        pos = state.pos + self.dt * vel
        # occasional command change, like cassie's random speed changes
        # (cassie.py:486-491)
        change = jax.random.bernoulli(rng, 0.01)
        new_cmd = jax.random.uniform(
            jax.random.fold_in(rng, 1), (2,),
            minval=-self.max_cmd, maxval=self.max_cmd)
        cmd = jnp.where(change, new_cmd, state.cmd)
        state = PointMassState(pos=pos, vel=vel, cmd=cmd, t=state.t + 1)
        reward = jnp.exp(-jnp.linalg.norm(vel - cmd)) - 0.01 * jnp.sum(action ** 2)
        terminated = jnp.linalg.norm(vel) > 10.0
        return state, self._obs(state), reward, terminated, {}
