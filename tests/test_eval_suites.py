"""Eval harness smoke tests (tiny grids; Cassie compiles are cached)."""
import jax
import numpy as np
import pytest

from apex_tpu.envs.cassie import CassieEnv
from apex_tpu.models import GaussianFFActor, NormState
from apex_tpu.runtime.eval_suites import (
    eval_5k_matrix,
    eval_commands,
    eval_perturbation,
)


@pytest.fixture(scope="module")
def env_and_policy():
    env = CassieEnv(dynamics_randomization=False, reward="early_clock")
    actor = GaussianFFActor.init(jax.random.PRNGKey(0),
                                 env.observation_size, env.action_size,
                                 fixed_std=0.1)
    norm = NormState.create(env.observation_size)

    def policy_fn(obs):
        return actor.act(norm, obs, deterministic=True)

    return env, policy_fn


def test_perturbation_matrix_shapes(env_and_policy):
    env, policy_fn = env_and_policy
    out = eval_perturbation(env, policy_fn, num_angles=2, max_force=50.0,
                            force_step=50.0, num_phases=1, wait_steps=2,
                            perturb_steps=2, recover_steps=2)
    assert out["survival"].shape == (2, 1, 1)
    assert out["max_force_per_angle"].shape == (2,)


def test_command_following_runs(env_and_policy):
    env, policy_fn = env_and_policy
    out = eval_commands(env, policy_fn, n_trials=4, n_commands=2,
                        steps_per_command=3)
    assert 0.0 <= out["pass_rate"] <= 1.0
    assert out["passed"].shape == (4,)


def test_5k_matrix_runs(env_and_policy):
    env, policy_fn = env_and_policy
    out = eval_5k_matrix(env, policy_fn, speeds=(0.5,), frictions=(0.8,),
                         foot_mass_scales=(1.0,), slopes=(0.0,),
                         episode_steps=3)
    assert out["passed"].shape == (1, 1, 1, 1)
