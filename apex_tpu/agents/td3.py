"""Twin Delayed DDPG (TD3), sync and async-equivalent, fused on device.

Re-design of reference rl/algos/sync_td3.py (348 LoC) and async_td3.py
(587 LoC). The reference's two architectures:
  * sync: Ray-parallel episode collection + central replay + per-episode
    update bursts (sync_td3.py:48-54, 98-232);
  * async (Ape-X style): actor processes with action/parameter noise pushing
    to a replay server, one learner, tapered policy polling
    (async_td3.py:150-312, 316-527).
collapse on TPU into one jitted loop: a vmapped env fleet writes into an
HBM replay ring, the learner updates in the same program. `async_mode`
emulates the Ape-X ingredients that matter for learning dynamics: per-env
exploration-noise spread and bounded policy staleness (actors act with a
snapshot refreshed every `load_freq` iterations, async_td3.py:206-213).

TD3 math follows the reference exactly: clipped target policy smoothing,
twin-critic min backup, delayed policy + soft target updates
(async_td3.py:406-487, sync_td3.py:123-180).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from apex_tpu.agents.replay import ReplayBuffer
from apex_tpu.agents.rollout import RunnerState, episode_stats, init_runner, rollout_scan
from apex_tpu.envs.base import Env
from apex_tpu.models import DualQCritic, FFActor, NormState


def _tree_copy(x):
    """Deep-copy a pytree's buffers. Needed because the train state is
    donated: aliased leaves (target nets initialized from the online nets,
    identical zero-constant buffers) would be donated twice."""
    return jax.tree_util.tree_map(jnp.copy, x)


@dataclasses.dataclass(frozen=True)
class TD3Config:
    """Defaults mirror reference apex.py:174-212."""
    num_envs: int = 64
    collect_steps: int = 80            # env steps per iteration per env
    start_timesteps: int = 10000       # random warmup (sync_td3.py:260)
    expl_noise: float = 0.1
    batch_size: int = 64
    discount: float = 0.99
    tau: float = 0.005
    policy_noise: float = 0.2
    noise_clip: float = 0.5
    policy_freq: int = 2
    a_lr: float = 1e-4
    c_lr: float = 1e-4
    replay_size: int = 1_000_000
    max_traj_len: int = 400
    max_action: float = 1.0
    updates_per_iter: int = 80         # ~1 update per wall-clock env step
    async_mode: bool = False
    load_freq: int = 1                 # iterations between actor snapshot
                                       # refresh in async mode
    param_noise: bool = False
    noise_spread: float = 2.0          # async: env i noise = expl_noise *
                                       # spread^(i/B - 0.5) (Ape-X style)


@struct.dataclass
class TD3TrainState:
    actor: FFActor
    actor_target: FFActor
    behavior: FFActor                  # acting snapshot (async staleness)
    critic: DualQCritic
    critic_target: DualQCritic
    norm: NormState
    actor_opt: Any
    critic_opt: Any
    replay: ReplayBuffer
    runner: RunnerState
    rng: jnp.ndarray
    update_count: jnp.ndarray
    param_noise_sigma: jnp.ndarray


@dataclasses.dataclass
class TD3:
    env: Env
    config: TD3Config

    def __post_init__(self):
        cfg = self.config
        self.actor_tx = optax.adam(cfg.a_lr)
        self.critic_tx = optax.adam(cfg.c_lr)
        if cfg.async_mode:
            B = cfg.num_envs
            self.noise_scales = jnp.asarray(
                cfg.expl_noise * cfg.noise_spread **
                (np.arange(B) / max(B - 1, 1) - 0.5))
        else:
            self.noise_scales = jnp.full((cfg.num_envs,), cfg.expl_noise)
        self._train_iter = jax.jit(self._train_iteration,
                                   donate_argnums=(0,),
                                   static_argnames=("random_actions",))
        self._eval_iter = jax.jit(self._evaluate)

    def init(self, seed: int) -> TD3TrainState:
        cfg = self.config
        rng = jax.random.PRNGKey(seed)
        rng, k_a, k_c, k_r = jax.random.split(rng, 4)
        obs_dim, act_dim = self.env.observation_size, self.env.action_size
        actor = FFActor.init(k_a, obs_dim, act_dim, max_action=cfg.max_action)
        critic = DualQCritic.init(k_c, obs_dim, act_dim)
        state = TD3TrainState(
            actor=actor, actor_target=actor, behavior=actor,
            critic=critic, critic_target=critic,
            norm=NormState.create(obs_dim),
            actor_opt=self.actor_tx.init(actor.params),
            critic_opt=self.critic_tx.init(critic.params),
            replay=ReplayBuffer.create(cfg.replay_size, obs_dim, act_dim),
            runner=init_runner(self.env, k_r, cfg.num_envs),
            rng=rng,
            update_count=jnp.zeros((), jnp.int32),
            param_noise_sigma=jnp.asarray(0.05),
        )
        return _tree_copy(state)

    # ------------------------------------------------------------------
    def _perturbed_actor(self, state: TD3TrainState, rng) -> FFActor:
        """Parameter-space exploration (reference rl/utils/param_noise.py:50-58:
        every actor weight perturbed with N(0, sigma))."""
        leaves, treedef = jax.tree_util.tree_flatten(state.behavior.params)
        keys = jax.random.split(rng, len(leaves))
        new_leaves = [
            p + state.param_noise_sigma * jax.random.normal(k, p.shape)
            for p, k in zip(leaves, keys)]
        return state.behavior.replace(
            params=jax.tree_util.tree_unflatten(treedef, new_leaves))

    def _train_iteration(self, state: TD3TrainState, random_actions: bool):
        cfg = self.config
        rng, k_collect, k_pn, k_updates = jax.random.split(state.rng, 4)

        # ---- collect (actors, async_td3.py:240-295) ----
        if cfg.param_noise:
            act_net = self._perturbed_actor(state, k_pn)
        else:
            act_net = state.behavior

        def policy_fn(k, obs):
            if random_actions:
                # uniform warmup (sync_td3.py:259-261)
                return jax.random.uniform(
                    k, (obs.shape[0], self.env.action_size),
                    minval=-cfg.max_action, maxval=cfg.max_action)
            a = act_net.act(state.norm, obs)
            noise = jax.random.normal(k, a.shape) * self.noise_scales[:, None]
            return jnp.clip(a + noise, -cfg.max_action, cfg.max_action)

        runner, traj = rollout_scan(self.env, policy_fn, state.runner,
                                    cfg.collect_steps, cfg.max_traj_len)
        T, B = traj.reward.shape
        flat = lambda x: x.reshape((T * B,) + x.shape[2:])
        # not_done excludes true terminations only (time-limit bootstraps,
        # matching done_bool semantics in sync_td3.py:282-284)
        replay = state.replay.add_batch(
            flat(traj.obs), flat(traj.action), flat(traj.reward),
            flat(traj.next_obs), 1.0 - flat(traj.terminated).astype(jnp.float32))

        # ---- param-noise sigma adaptation (param_noise.py:10-48) ----
        if cfg.param_noise:
            a_plain = state.behavior.act(state.norm, flat(traj.obs))
            dist = jnp.sqrt(jnp.mean((flat(traj.action) - a_plain) ** 2))
            sigma = jnp.where(dist < cfg.expl_noise,
                              state.param_noise_sigma * 1.01,
                              state.param_noise_sigma / 1.01)
        else:
            sigma = state.param_noise_sigma

        # ---- updates (TD3 core, async_td3.py:406-487) ----
        def update(carry, key):
            (actor, actor_t, critic, critic_t, a_opt, c_opt, count) = carry
            k_samp, k_noise = jax.random.split(key)
            obs, action, reward, next_obs, not_done = replay.sample(
                k_samp, cfg.batch_size)

            noise = jnp.clip(
                jax.random.normal(k_noise, action.shape) * cfg.policy_noise,
                -cfg.noise_clip, cfg.noise_clip)
            next_action = jnp.clip(
                actor_t.act(state.norm, next_obs) + noise,
                -cfg.max_action, cfg.max_action)
            q1_t, q2_t = critic_t.q(state.norm, next_obs, next_action)
            target_q = reward[:, None] + not_done[:, None] * cfg.discount * \
                jnp.minimum(q1_t, q2_t)
            target_q = jax.lax.stop_gradient(target_q)

            def critic_loss_fn(params):
                q1, q2 = critic.replace(params=params).q(state.norm, obs, action)
                return ((q1 - target_q) ** 2).mean() + ((q2 - target_q) ** 2).mean()

            c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(critic.params)
            c_updates, c_opt = self.critic_tx.update(c_grads, c_opt,
                                                     critic.params)
            critic = critic.replace(
                params=optax.apply_updates(critic.params, c_updates))

            def do_policy(_):
                def actor_loss_fn(params):
                    a = actor.replace(params=params).act(state.norm, obs)
                    return -critic.q1(state.norm, obs, a).mean()

                a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(
                    actor.params)
                a_updates, new_a_opt = self.actor_tx.update(
                    a_grads, a_opt, actor.params)
                new_actor = actor.replace(
                    params=optax.apply_updates(actor.params, a_updates))
                soft = lambda t, s: jax.tree_util.tree_map(
                    lambda pt, ps: (1 - cfg.tau) * pt + cfg.tau * ps, t, s)
                new_actor_t = actor_t.replace(
                    params=soft(actor_t.params, new_actor.params))
                new_critic_t = critic_t.replace(
                    params=soft(critic_t.params, critic.params))
                return new_actor, new_actor_t, new_critic_t, new_a_opt, a_loss

            def skip_policy(_):
                return actor, actor_t, critic_t, a_opt, jnp.zeros(())

            actor, actor_t, critic_t, a_opt, a_loss = jax.lax.cond(
                (count % cfg.policy_freq) == 0, do_policy, skip_policy, None)
            count = count + 1
            return ((actor, actor_t, critic, critic_t, a_opt, c_opt, count),
                    jnp.stack([c_loss, a_loss]))

        keys = jax.random.split(k_updates, cfg.updates_per_iter)
        carry = (state.actor, state.actor_target, state.critic,
                 state.critic_target, state.actor_opt, state.critic_opt,
                 state.update_count)
        carry, losses = jax.lax.scan(update, carry, keys)
        (actor, actor_t, critic, critic_t, a_opt, c_opt, count) = carry

        stats = episode_stats(traj)
        metrics = {
            "critic_loss": losses[:, 0].mean(),
            "actor_loss": losses[:, 1].mean(),
            "train_ep_return": stats["ep_return"],
            "train_ep_len": stats["ep_len"],
            "reward_per_step": stats["reward_per_step"],
            "replay_size": replay.size,
        }
        new_state = state.replace(
            actor=actor, actor_target=actor_t, critic=critic,
            critic_target=critic_t, actor_opt=a_opt, critic_opt=c_opt,
            replay=replay, runner=runner, rng=rng, update_count=count,
            param_noise_sigma=sigma,
        )
        return new_state, metrics

    def _evaluate(self, state: TD3TrainState, rng):
        """Deterministic eval (evaluate_policy, sync_td3.py:23-44)."""
        cfg = self.config

        def policy_fn(_, obs):
            return state.actor.act(state.norm, obs)

        runner = init_runner(self.env, rng, cfg.num_envs)
        _, traj = rollout_scan(self.env, policy_fn, runner,
                               cfg.max_traj_len, cfg.max_traj_len)
        return episode_stats(traj)

    # ------------------------------------------------------------------
    def train(self, state: TD3TrainState, max_timesteps: int,
              eval_freq_iters: int = 10, logger=None, save_fn=None,
              verbose: bool = True) -> TD3TrainState:
        cfg = self.config
        steps_per_iter = cfg.collect_steps * cfg.num_envs
        n_iters = max(1, int(max_timesteps) // steps_per_iter)
        warmup_iters = max(1, cfg.start_timesteps // steps_per_iter)
        highest = -np.inf
        total_steps = 0

        for it in range(n_iters):
            # async staleness: refresh the acting snapshot every load_freq
            # iterations (async_td3.py:206-213); sync mode refreshes always
            if not cfg.async_mode or it % cfg.load_freq == 0:
                state = state.replace(behavior=_tree_copy(state.actor))
            t0 = time.time()
            state, metrics = self._train_iter(
                state, random_actions=(it < warmup_iters))
            metrics = {k: float(v) for k, v in metrics.items()}
            total_steps += steps_per_iter
            dt = time.time() - t0

            if it % eval_freq_iters == 0:
                ev = self._eval_iter(state, jax.random.fold_in(
                    jax.random.PRNGKey(7), it))
                eval_ret = float(ev["ep_return"])
                if verbose:
                    print(f"it {it:5d} | steps {total_steps:9d} | "
                          f"eval {eval_ret:8.2f} | "
                          f"closs {metrics['critic_loss']:8.4f} | {dt:.2f}s")
                if logger is not None:
                    logger.add_scalar("Test/Return", eval_ret, total_steps)
                    logger.add_scalar("Train/Return",
                                      metrics["train_ep_return"], total_steps)
                    logger.add_scalar("Misc/Critic Loss",
                                      metrics["critic_loss"], total_steps)
                    logger.add_scalar("Misc/Actor Loss",
                                      metrics["actor_loss"], total_steps)
                    logger.add_scalar("Misc/Timesteps", total_steps, it)
                if eval_ret > highest:
                    highest = eval_ret
                    if save_fn is not None:
                        save_fn(state)
        return state


def run_experiment(args, async_mode: bool = False):
    """CLI entry (reference sync_td3.py:235-349 / async_td3.py:27-97)."""
    from apex_tpu.envs.registry import env_factory
    from apex_tpu.runtime.checkpoint import save_checkpoint
    from apex_tpu.runtime.log import create_logger

    env = env_factory(
        args.env_name, simrate=args.simrate,
        command_profile=args.command_profile,
        input_profile=args.input_profile, learn_gains=args.learn_gains,
        dynamics_randomization=args.dyn_random, reward=args.reward,
        history=args.history)

    cfg = TD3Config(
        num_envs=args.num_procs, start_timesteps=args.start_timesteps,
        expl_noise=args.expl_noise, batch_size=args.batch_size,
        discount=args.discount, tau=args.tau,
        policy_noise=args.policy_noise, noise_clip=args.noise_clip,
        policy_freq=args.policy_freq, a_lr=args.a_lr, c_lr=args.c_lr,
        max_traj_len=args.max_traj_len, async_mode=async_mode,
        param_noise=args.param_noise)
    td3 = TD3(env, cfg)
    state = td3.init(seed=args.seed)
    logger = create_logger(args)
    print(f"{'Asynchronous' if async_mode else 'Synchronous'} "
          f"Twin-Delayed DDPG (on-device)")

    def save_fn(st):
        save_checkpoint(logger.dir, st)

    return td3.train(state, max_timesteps=int(args.max_timesteps),
                     logger=logger, save_fn=save_fn)
