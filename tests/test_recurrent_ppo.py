"""Recurrent PPO: BPTT chunk training on the toy env."""
import jax
import jax.numpy as jnp
import numpy as np

from apex_tpu.agents.ppo import PPOConfig
from apex_tpu.agents.ppo_recurrent import RecurrentPPO
from apex_tpu.envs.base import PointMassEnv


def test_recurrent_ppo_iteration_and_eval():
    env = PointMassEnv()
    cfg = PPOConfig(num_envs=8, num_steps=128, max_traj_len=40,
                    minibatch_size=4, epochs=2)
    rp = RecurrentPPO(env, cfg, layers=(32, 32))
    state = rp.init(seed=0)
    state = rp.prenormalize(state, steps=64)
    state, metrics = rp._train_iter(state, jnp.asarray(1.0))
    for k in ("actor_loss", "critic_loss", "kl", "mirror_loss"):
        assert np.isfinite(float(metrics[k])), k
    ev = rp._eval_iter(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(ev["ep_return"]))


def test_recurrent_ppo_learns_on_pointmass():
    """A few iterations should improve the deterministic eval return."""
    env = PointMassEnv()
    cfg = PPOConfig(num_envs=32, num_steps=1024, max_traj_len=60,
                    minibatch_size=8, epochs=3, lr=3e-3, std_dev=-1.0)
    rp = RecurrentPPO(env, cfg, layers=(32,))
    state = rp.init(seed=0)
    state = rp.prenormalize(state, steps=512)
    first = float(rp._eval_iter(state, jax.random.PRNGKey(0))["ep_return"])
    for _ in range(8):
        state, _ = rp._train_iter(state, jnp.asarray(1.0))
    last = float(rp._eval_iter(state, jax.random.PRNGKey(0))["ep_return"])
    assert last > first + 1.0, f"no improvement: {first} -> {last}"
