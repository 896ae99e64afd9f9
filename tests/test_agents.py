"""Agent smoke + behavior tests on the PointMass env (fast on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apex_tpu.agents.ars import ARS, ARSConfig
from apex_tpu.agents.dpg import DPG, DPGConfig
from apex_tpu.agents.replay import ReplayBuffer
from apex_tpu.agents.td3 import TD3, TD3Config
from apex_tpu.envs.base import PointMassEnv


def test_replay_ring_wraps_and_samples():
    buf = ReplayBuffer.create(16, 3, 2)
    obs = jnp.arange(30.0).reshape(10, 3)
    act = jnp.zeros((10, 2))
    r = jnp.arange(10.0)
    buf = buf.add_batch(obs, act, r, obs, jnp.ones(10))
    assert int(buf.size) == 10 and int(buf.ptr) == 10
    buf = buf.add_batch(obs, act, r + 100, obs, jnp.ones(10))
    assert int(buf.size) == 16 and int(buf.ptr) == 4
    o, a, rw, no, nd = buf.sample(jax.random.PRNGKey(0), 8)
    assert o.shape == (8, 3) and rw.shape == (8,)


def test_td3_iteration_runs_and_updates():
    env = PointMassEnv()
    cfg = TD3Config(num_envs=8, collect_steps=16, batch_size=32,
                    updates_per_iter=8, replay_size=4096, max_traj_len=50,
                    start_timesteps=64)
    td3 = TD3(env, cfg)
    state = td3.init(seed=0)
    # materialize before the donated call deletes the buffer
    p0 = np.asarray(jax.tree_util.tree_leaves(state.critic.params)[0]).copy()
    state, metrics = td3._train_iter(state, random_actions=True)
    # refresh the acting snapshot as train() does -- with a copy, because
    # the train state is donated and must not alias its own leaves
    from apex_tpu.agents.td3 import _tree_copy

    state = state.replace(behavior=_tree_copy(state.actor))
    state, metrics = td3._train_iter(state, random_actions=False)
    assert np.isfinite(float(metrics["critic_loss"]))
    p1 = jax.tree_util.tree_leaves(state.critic.params)[0]
    assert not np.allclose(p0, p1), "critic did not update"
    assert int(state.replay.size) == 2 * 16 * 8


def test_td3_param_noise_sigma_adapts():
    env = PointMassEnv()
    cfg = TD3Config(num_envs=4, collect_steps=8, batch_size=16,
                    updates_per_iter=2, replay_size=1024, max_traj_len=50,
                    param_noise=True)
    td3 = TD3(env, cfg)
    state = td3.init(seed=0)
    s0 = float(state.param_noise_sigma)
    state, _ = td3._train_iter(state, random_actions=False)
    assert float(state.param_noise_sigma) != s0


def test_ddpg_iteration_runs():
    env = PointMassEnv()
    cfg = DPGConfig(num_envs=8, collect_steps=16, batch_size=32,
                    updates_per_iter=4, replay_size=2048, max_traj_len=50)
    dpg = DPG(env, cfg)
    state = dpg.init(seed=0)
    state, metrics = dpg._train_iter(state, random_actions=False)
    assert np.isfinite(float(metrics["critic_loss"]))
    assert np.isfinite(float(metrics["actor_loss"]))


def test_rdpg_episode_buffer_and_bptt():
    env = PointMassEnv()
    cfg = DPGConfig(num_envs=4, max_traj_len=20, traj_batch=2,
                    updates_per_iter=8, episode_capacity=64, recurrent=True)
    dpg = DPG(env, cfg)
    state = dpg.init(seed=0)
    state, metrics = dpg._train_iter(state, random_actions=False)
    assert np.isfinite(float(metrics["critic_loss"]))
    assert int(state.replay.size) == 4
    ev = dpg._eval_iter(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(ev["ep_return"]))


def test_ars_improves_on_pointmass():
    """ARS on the toy velocity-tracking task should improve mean return."""
    env = PointMassEnv()
    cfg = ARSConfig(deltas=32, deltas_used=8, step_size=0.1,
                    delta_std=0.1, max_traj_len=60, hidden_size=8,
                    algo="v2")
    ars = ARS(env, cfg)
    # the train state is donated by _step: always rebind it
    state = ars.init(seed=0)
    # break the zero-init symmetry (the reference's Linear_Actor is
    # zero-initialized, actor.py:31-32; with both layers at zero the
    # antithetic differences of a two-layer linear net vanish identically)
    state = state.replace(theta=0.01 * jax.random.normal(
        jax.random.PRNGKey(42), state.theta.shape))
    state, m0 = ars._step(state)
    first = float(m0["mean_return"])
    rets = []
    for _ in range(30):
        state, m = ars._step(state)
        rets.append(float(m["mean_return"]))
    assert max(rets[-5:]) > first + 1.0, (
        f"no improvement: {first} -> {rets[-5:]}")


def test_recurrent_ars_lstm_policy():
    """ARS with the LSTM policy (reference ars.py:168-181 --recurrent path).

    Derivative-free search over RNN weights is far weaker than the linear
    case (the ARS paper's motivation for linear policies) -- the reference
    would face the same landscape -- so the learning bound here is modest;
    the test additionally pins that the rollout really carries hidden
    state (same observation, different history => different action)."""
    env = PointMassEnv()
    cfg = ARSConfig(deltas=64, deltas_used=64, step_size=0.015,
                    delta_std=0.025, max_traj_len=60, hidden_size=4,
                    algo="v1", recurrent=True)
    ars = ARS(env, cfg)
    state = ars.init(seed=0)

    # memory check: step the policy twice on the same obs; the second
    # action must differ because the hidden state advanced
    from apex_tpu.models import GaussianLSTMActor, NormState

    theta = 0.3 * jax.random.normal(jax.random.PRNGKey(3),
                                    state.theta.shape)
    actor = GaussianLSTMActor(params=ars._unravel(theta), fixed_std=1.0,
                              layers=ars._lstm_layers)
    norm = NormState.create(env.observation_size)
    obs = jax.numpy.ones(env.observation_size)
    h0 = actor.zero_carry(())
    h1, (a1, _) = actor.step_dist(norm, h0, obs)
    h2, (a2, _) = actor.step_dist(norm, h1, obs)
    assert float(jax.numpy.abs(a1 - a2).max()) > 1e-4

    # learning: small-std, all-directions config; modest but real
    # improvement over 100 iterations (measured: ~+0.9 on this seed)
    state = state.replace(theta=0.01 * jax.random.normal(
        jax.random.PRNGKey(7), state.theta.shape))
    state, m0 = ars._step(state)
    first = float(m0["mean_return"])
    best = -np.inf
    for _ in range(100):
        state, m = ars._step(state)
        best = max(best, float(m["mean_return"]))
    assert np.isfinite(best)
    assert best > first + 0.5, (
        f"recurrent ARS did not improve: first {first}, best {best}")
