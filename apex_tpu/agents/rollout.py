"""Vectorized on-device rollout engine with auto-reset.

Replaces the reference's Ray worker pool (`PPO.sample` / `sample_parallel`,
rl/algos/ppo.py:139-237: pickled policies out, PPOBuffer pickled back) with a
single `lax.scan` over time of a `vmap` over environments, running entirely
on-device. Episode accounting (ep_returns / ep_lens, ppo.py:88-89) and
max-trajectory-length truncation (ppo.py:170) are carried in the runner state.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from apex_tpu.envs.base import Env


def tree_where(cond, x, y):
    """Select between two pytrees with a per-env boolean (broadcast over
    trailing dims). cond has shape (B,) or ()."""
    def sel(a, b):
        c = cond.reshape(cond.shape + (1,) * (a.ndim - cond.ndim))
        return jnp.where(c, a, b)
    return jax.tree_util.tree_map(sel, x, y)


@struct.dataclass
class RunnerState:
    """Per-env-fleet rollout carry."""
    env_state: Any          # vmapped env state pytree
    obs: jnp.ndarray        # (B, obs_dim) current observation
    traj_len: jnp.ndarray   # (B,) steps since last reset
    ep_return: jnp.ndarray  # (B,) running undiscounted return
    rng: jnp.ndarray


class Rollout(NamedTuple):
    """(T, B, ...) stacked trajectory slices."""
    obs: jnp.ndarray
    action: jnp.ndarray
    reward: jnp.ndarray
    terminated: jnp.ndarray   # env death at this step
    truncated: jnp.ndarray    # max_traj_len cut (alive) at this step
    next_obs: jnp.ndarray     # obs after the step (pre-reset), for bootstrap
    # episode stats, nonzero only at done steps
    done_ep_return: jnp.ndarray
    done_ep_len: jnp.ndarray


def init_runner(env: Env, rng, num_envs: int) -> RunnerState:
    # jitted: an eager vmapped reset would dispatch thousands of individual
    # ops, which is pathological on remote-compile TPU backends
    @jax.jit
    def _init(rng):
        rng, key = jax.random.split(rng)
        keys = jax.random.split(key, num_envs)
        env_state, obs = jax.vmap(env.reset)(keys)
        return RunnerState(
            env_state=env_state,
            obs=obs,
            traj_len=jnp.zeros((num_envs,), jnp.int32),
            ep_return=jnp.zeros((num_envs,)),
            rng=rng,
        )

    return _init(rng)


def rollout_scan(
    env: Env,
    policy_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    runner: RunnerState,
    num_steps: int,
    max_traj_len: int,
) -> Tuple[RunnerState, Rollout]:
    """Collect `num_steps` steps from every env in the fleet.

    policy_fn(rng, obs_batch) -> action_batch. Auto-resets finished envs;
    episodes continue across successive rollout_scan calls (the fleet never
    pauses, unlike the reference's episode-aligned workers).
    """

    def step(carry: RunnerState, _):
        rng, k_act, k_step, k_reset = jax.random.split(carry.rng, 4)
        action = policy_fn(k_act, carry.obs)

        B = carry.obs.shape[0]
        step_keys = jax.random.split(k_step, B)
        env_state, next_obs, reward, terminated, _ = jax.vmap(env.step)(
            carry.env_state, action, step_keys)

        traj_len = carry.traj_len + 1
        truncated = jnp.logical_and(traj_len >= max_traj_len,
                                    jnp.logical_not(terminated))
        done = jnp.logical_or(terminated, truncated)
        ep_return = carry.ep_return + reward

        # auto-reset finished envs
        reset_keys = jax.random.split(k_reset, B)
        reset_state, reset_obs = jax.vmap(env.reset)(reset_keys)
        new_env_state = tree_where(done, reset_state, env_state)
        new_obs = tree_where(done, reset_obs, next_obs)

        out = Rollout(
            obs=carry.obs,
            action=action,
            reward=reward,
            terminated=terminated,
            truncated=truncated,
            next_obs=next_obs,
            done_ep_return=jnp.where(done, ep_return, 0.0),
            done_ep_len=jnp.where(done, traj_len, 0),
        )
        new_carry = RunnerState(
            env_state=new_env_state,
            obs=new_obs,
            traj_len=jnp.where(done, 0, traj_len),
            ep_return=jnp.where(done, 0.0, ep_return),
            rng=rng,
        )
        return new_carry, out

    runner, traj = jax.lax.scan(step, runner, None, length=num_steps)
    return runner, traj


def episode_stats(traj: Rollout) -> Dict[str, jnp.ndarray]:
    """Mean episode return/length over episodes finished in this rollout
    (reference logs np.mean(batch.ep_returns), ppo.py:468-470)."""
    n_done = jnp.maximum(jnp.sum(traj.done_ep_len > 0), 1)
    return {
        "ep_return": jnp.sum(traj.done_ep_return) / n_done,
        "ep_len": jnp.sum(traj.done_ep_len) / n_done,
        "num_episodes": jnp.sum(traj.done_ep_len > 0),
        # continuing-fleet metric: mean per-step reward (episodes may span
        # multiple rollout windows, so ep_return can be sparse)
        "reward_per_step": traj.reward.mean(),
    }
