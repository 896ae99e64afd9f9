"""Return / advantage computation as reverse-time lax.scans.

Replaces the reference's per-trajectory python loop (`PPOBuffer.finish_path`,
rl/algos/ppo.py:73-89: R = gamma*R + r walked backwards per episode) with a
single batched reverse scan over fixed-shape (T, B) rollouts. Episode
boundaries inside the rollout are handled with terminated/truncated masks, so
thousands of vmapped envs with auto-reset share one scan.

Semantics at boundaries:
  * terminated (environment death): no bootstrap, R resets to 0 past the step.
    Matches `(not done) * value` in reference ppo.py:184.
  * truncated (time-limit / rollout end while alive): bootstrap with the
    critic value of the *next* state, matching reference
    `memory.finish_path(last_val=critic(state))` for alive truncation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def discounted_returns(
    rewards: jnp.ndarray,       # (T, ...) reward at step t
    terminated: jnp.ndarray,    # (T, ...) bool/0-1: env terminated at step t
    truncated: jnp.ndarray,     # (T, ...) bool/0-1: rollout cut at step t (alive)
    next_values: jnp.ndarray,   # (T, ...) V(s_{t+1}) used only at truncations
    gamma: float,
) -> jnp.ndarray:
    """Monte-Carlo discounted returns with bootstrap at truncation.

    Reference: PPOBuffer.finish_path (ppo.py:73-89) + sampling loop
    (ppo.py:170-184). Returns same shape as rewards.
    """
    terminated = terminated.astype(rewards.dtype)
    truncated = truncated.astype(rewards.dtype)

    def step(carry_R, xs):
        r, term, trunc, next_v = xs
        cont = (1.0 - term) * (1.0 - trunc)
        R = r + gamma * (cont * carry_R + (1.0 - term) * trunc * next_v)
        return R, R

    _, returns = jax.lax.scan(
        step,
        jnp.zeros_like(rewards[0]),
        (rewards, terminated, truncated, next_values),
        reverse=True,
    )
    return returns


def gae_advantages(
    rewards: jnp.ndarray,       # (T, ...)
    values: jnp.ndarray,        # (T, ...) V(s_t)
    next_values: jnp.ndarray,   # (T, ...) V(s_{t+1})
    terminated: jnp.ndarray,    # (T, ...)
    truncated: jnp.ndarray,     # (T, ...)
    gamma: float,
    lam: float,
):
    """GAE(lambda) advantages and value targets.

    delta_t = r_t + gamma*V_{t+1}*(1-term_t) - V_t
    A_t     = delta_t + gamma*lam*(1-done_t)*A_{t+1}
    Returns (advantages, value_targets = advantages + values).
    """
    terminated = terminated.astype(rewards.dtype)
    truncated = truncated.astype(rewards.dtype)
    done = jnp.clip(terminated + truncated, 0.0, 1.0)
    deltas = rewards + gamma * next_values * (1.0 - terminated) - values

    def step(carry_A, xs):
        delta, d = xs
        A = delta + gamma * lam * (1.0 - d) * carry_A
        return A, A

    _, advantages = jax.lax.scan(
        step, jnp.zeros_like(rewards[0]), (deltas, done), reverse=True
    )
    return advantages, advantages + values
