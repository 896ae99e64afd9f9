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


def test_playground_obs_sees_heading_command():
    """Round-4 bug: _obs never rotated the pelvis state into the
    commanded-heading frame, so 90_left and 90_right missions produced
    bit-identical rollouts (the policy was blind to the turn). The
    reference rotates orientation + translational vel/accel by
    orient_add = cmd - pelvis.orientation[2]
    (cassie_playground.py:578-585); with the same physical state,
    opposite heading commands must now produce different observations in
    exactly the orientation/velocity channels."""
    from apex_tpu.envs.cassie_playground import CassiePlayground

    env_l = CassiePlayground(mission="90_left_1.4")
    env_r = CassiePlayground(mission="90_right_1.4")
    state_l, _ = jax.jit(env_l.reset)(jax.random.PRNGKey(0))
    state_r, _ = jax.jit(env_r.reset)(jax.random.PRNGKey(0))
    # jump both to a schedule index inside the corner (commands diverge)
    cc = jnp.asarray(600, jnp.int32)
    cl = float(env_l._cmd_orient[cc])
    cr = float(env_r._cmd_orient[cc])
    assert abs(cl - cr) > 0.5, "corner commands should diverge"
    from apex_tpu.physics.cassie_sim import estimate_state, static_diag

    est = estimate_state(env_l.model, state_l.phys,
                         static_diag(env_l.model, state_l.params,
                                     state_l.phys))
    obs_l = np.asarray(env_l._obs(state_l.replace(command_counter=cc), est))
    obs_r = np.asarray(env_r._obs(state_r.replace(command_counter=cc), est))
    # same physical state, different heading command -> different obs
    assert np.abs(obs_l - obs_r).max() > 1e-3
    # the difference lives in the rotated channels (orient quat at 1:5),
    # not the motor positions (5:15)
    assert np.abs(obs_l[1:5] - obs_r[1:5]).max() > 1e-3
    np.testing.assert_allclose(obs_l[5:15], obs_r[5:15], atol=1e-7)
