"""CassiePlayground + CassieStandingEnv behavior tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_playground_mission_following():
    from apex_tpu.envs.cassie_playground import CassiePlayground

    env = CassiePlayground(mission="default")
    assert env.observation_size == 49
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (49,)
    state, obs, reward, term, _ = jax.jit(env.step)(
        state, jnp.zeros(10), jax.random.PRNGKey(1))
    assert np.isfinite(float(reward))
    assert int(state.command_counter) == 1
    # command speed appears in the obs appendix
    assert np.isfinite(np.asarray(obs)).all()


def test_playground_reward_modes():
    from apex_tpu.envs.cassie_playground import CassiePlayground

    for reward in ("command", "command_no_pos", "keepalive"):
        env = CassiePlayground(mission="default", reward=reward)
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
        _, _, r, _, _ = jax.jit(env.step)(state, jnp.zeros(10),
                                          jax.random.PRNGKey(1))
        assert np.isfinite(float(r)), reward


def test_standing_env_resets_on_trajectory():
    from apex_tpu.envs.cassie_standing import CassieStandingEnv

    env = CassieStandingEnv()
    assert env.observation_size == 46
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (46,)
    # resets land on the stepping trajectory: pelvis y zeroed, height sane
    np.testing.assert_allclose(float(state.phys.qpos[1]), 0.0, atol=1e-6)
    assert 0.7 < float(state.phys.qpos[2]) < 1.2
    state, obs, reward, term, _ = jax.jit(env.step)(
        state, jnp.zeros(10), jax.random.PRNGKey(1))
    assert np.isfinite(float(reward))
    assert -0.6 <= float(reward) <= 1.0
