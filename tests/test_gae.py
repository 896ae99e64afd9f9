"""Return/advantage scans vs a straightforward python reference."""
import jax.numpy as jnp
import numpy as np

from apex_tpu.ops.gae import discounted_returns, gae_advantages


def _py_returns(rewards, terminated, truncated, next_values, gamma):
    T = len(rewards)
    out = np.zeros(T)
    R = 0.0
    for t in reversed(range(T)):
        if terminated[t]:
            R = rewards[t]
        elif truncated[t]:
            R = rewards[t] + gamma * next_values[t]
        else:
            R = rewards[t] + gamma * R
        out[t] = R
    return out


def test_discounted_returns_matches_reference_loop():
    """Parity with PPOBuffer.finish_path (ppo.py:73-89) incl. bootstrap."""
    rng = np.random.RandomState(0)
    T, B = 20, 3
    rewards = rng.randn(T, B)
    terminated = np.zeros((T, B), bool)
    truncated = np.zeros((T, B), bool)
    terminated[7, 0] = True
    truncated[12, 0] = True
    truncated[19, 1] = True
    terminated[19, 2] = True
    next_values = rng.randn(T, B)

    got = discounted_returns(
        jnp.asarray(rewards), jnp.asarray(terminated), jnp.asarray(truncated),
        jnp.asarray(next_values), 0.99)
    for b in range(B):
        expected = _py_returns(rewards[:, b], terminated[:, b], truncated[:, b],
                               next_values[:, b], 0.99)
        np.testing.assert_allclose(got[:, b], expected, rtol=1e-5)


def test_gae_reduces_to_mc_minus_value_at_lam_1():
    """With lam=1 and no mid-rollout dones, GAE = MC-return - V."""
    rng = np.random.RandomState(1)
    T = 15
    rewards = rng.randn(T, 1)
    values = rng.randn(T, 1)
    next_values = np.concatenate([values[1:], rng.randn(1, 1)])
    term = np.zeros((T, 1), bool)
    trunc = np.zeros((T, 1), bool)
    trunc[-1, 0] = True

    adv, targets = gae_advantages(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(next_values),
        jnp.asarray(term), jnp.asarray(trunc), 0.99, 1.0)
    mc = _py_returns(rewards[:, 0], term[:, 0], trunc[:, 0], next_values[:, 0],
                     0.99)
    np.testing.assert_allclose(adv[:, 0], mc - values[:, 0], rtol=1e-4)
    np.testing.assert_allclose(targets, adv + values, rtol=1e-6)


def test_gae_zero_when_critic_perfect():
    """A critic satisfying the Bellman equation gives zero advantage."""
    T = 10
    gamma = 0.9
    values = np.array([sum(gamma ** k for k in range(T - t)) for t in range(T)])
    rewards = np.ones(T)
    next_values = np.concatenate([values[1:], [0.0]])
    term = np.zeros(T, bool)
    term[-1] = True
    trunc = np.zeros(T, bool)
    adv, _ = gae_advantages(
        jnp.asarray(rewards)[:, None], jnp.asarray(values)[:, None],
        jnp.asarray(next_values)[:, None], jnp.asarray(term)[:, None],
        jnp.asarray(trunc)[:, None], gamma, 0.95)
    np.testing.assert_allclose(adv, np.zeros((T, 1)), atol=1e-5)
