"""CassieTrajEnv behavior tests (agility + aslip trajectory modes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apex_tpu.envs.cassie_traj import CassieTrajEnv
from apex_tpu.envs.base import mirror_matrix


def test_obs_sizes():
    """set_up_state_space (cassie_traj.py:274-331): full+clock=50,
    full+traj(agility)=86, full+traj(aslip)=64."""
    assert CassieTrajEnv(command_profile="clock").observation_size == 50
    assert CassieTrajEnv(command_profile="traj").observation_size == 86
    assert CassieTrajEnv(traj="aslip",
                         command_profile="traj").observation_size == 64


def test_traj_mirror_involution():
    env = CassieTrajEnv(command_profile="traj")
    M = mirror_matrix(env.mirrored_obs)
    np.testing.assert_allclose(M @ M, np.eye(len(env.mirrored_obs)),
                               atol=1e-6)


def test_agility_reset_on_reference_and_iros_reward():
    env = CassieTrajEnv(command_profile="clock", reward="iros_paper",
                        dynamics_randomization=False)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (50,)
    # reset puts the sim on the reference trajectory: y zeroed
    np.testing.assert_allclose(float(state.phys.qpos[1]), 0.0, atol=1e-6)
    state, obs, reward, term, _ = jax.jit(env.step)(
        state, jnp.zeros(10), jax.random.PRNGKey(1))
    # standing on the reference with zero action: tracking reward is high
    assert 0.2 < float(reward) <= 1.0
    assert np.isfinite(np.asarray(obs)).all()


def test_aslip_env_steps_with_reward():
    env = CassieTrajEnv(traj="aslip", command_profile="traj",
                        reward="aslip_old", dynamics_randomization=False)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (64,)
    # speed comes from the trajectory library (0.0 .. 2.0)
    assert 0.0 <= float(state.speed) <= 2.0
    state, obs, reward, term, _ = jax.jit(env.step)(
        state, jnp.zeros(10), jax.random.PRNGKey(1))
    assert np.isfinite(float(reward))
    assert np.isfinite(np.asarray(obs)).all()


def test_no_delta_vs_delta_offsets_differ():
    env_nd = CassieTrajEnv(command_profile="clock", no_delta=True,
                           dynamics_randomization=False)
    env_d = CassieTrajEnv(command_profile="clock", no_delta=False,
                          dynamics_randomization=False)
    s1, _ = jax.jit(env_nd.reset)(jax.random.PRNGKey(0))
    s2, _ = jax.jit(env_d.reset)(jax.random.PRNGKey(0))
    # same reset state, but stepping uses different PD baselines
    o1 = jax.jit(env_nd.step)(s1, jnp.zeros(10), jax.random.PRNGKey(1))[1]
    o2 = jax.jit(env_d.step)(s2, jnp.zeros(10), jax.random.PRNGKey(1))[1]
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
