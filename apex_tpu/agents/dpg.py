"""DDPG and recurrent DPG (RDPG), fused on device.

Re-design of reference rl/algos/dpg.py (341 LoC): single-process
deterministic policy gradient with soft target updates, plus the recurrent
variant that replays whole padded trajectories (dpg.py:43-86) through LSTM
actor/critic with BPTT.

TPU mapping: DDPG shares the flat HBM replay ring; RDPG stores fixed-length
episode tensors (episode ring) and scans LSTMs over time with done-masking,
replacing torch pad_sequence (dpg.py:62-86).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from apex_tpu.agents.replay import ReplayBuffer
from apex_tpu.agents.rollout import episode_stats, init_runner, rollout_scan
from apex_tpu.envs.base import Env
from apex_tpu.models import FFQ, FFActor, LSTMQ, NormState
from apex_tpu.models.nets import LSTMActor
from apex_tpu.models.nets import lstm_step, lstm_zero_carry


def _tree_copy(x):
    """Deep-copy a pytree's buffers (donation safety: aliased leaves in the
    donated train state would be donated twice)."""
    return jax.tree_util.tree_map(jnp.copy, x)


@dataclasses.dataclass(frozen=True)
class DPGConfig:
    """Defaults mirror reference apex.py ddpg/rdpg flags."""
    num_envs: int = 64
    collect_steps: int = 80
    start_timesteps: int = 10000
    expl_noise: float = 0.2
    batch_size: int = 64
    discount: float = 0.99
    tau: float = 0.001
    a_lr: float = 1e-4
    c_lr: float = 1e-3
    replay_size: int = 1_000_000
    max_traj_len: int = 400
    max_action: float = 1.0
    updates_per_iter: int = 80
    recurrent: bool = False
    episode_capacity: int = 2048      # RDPG episode ring
    traj_batch: int = 16              # RDPG trajectories per update


# ---------------------------------------------------------------------------
# episode ring for RDPG (replaces trajectory sampling, dpg.py:43-86)
# ---------------------------------------------------------------------------

@struct.dataclass
class EpisodeBuffer:
    obs: jnp.ndarray        # (cap, T, obs_dim)
    action: jnp.ndarray     # (cap, T, act_dim)
    reward: jnp.ndarray     # (cap, T)
    next_obs: jnp.ndarray   # (cap, T, obs_dim)
    mask: jnp.ndarray       # (cap, T) 1 while episode alive
    not_done: jnp.ndarray   # (cap, T) 0 at true termination
    ptr: jnp.ndarray
    size: jnp.ndarray

    @staticmethod
    def create(cap, T, obs_dim, act_dim):
        return EpisodeBuffer(
            obs=jnp.zeros((cap, T, obs_dim)),
            action=jnp.zeros((cap, T, act_dim)),
            reward=jnp.zeros((cap, T)),
            next_obs=jnp.zeros((cap, T, obs_dim)),
            mask=jnp.zeros((cap, T)),
            not_done=jnp.zeros((cap, T)),
            ptr=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32))

    def add_episodes(self, obs, action, reward, next_obs, mask, not_done):
        n = obs.shape[0]
        cap = self.obs.shape[0]
        idx = (self.ptr + jnp.arange(n)) % cap
        return self.replace(
            obs=self.obs.at[idx].set(obs),
            action=self.action.at[idx].set(action),
            reward=self.reward.at[idx].set(reward),
            next_obs=self.next_obs.at[idx].set(next_obs),
            mask=self.mask.at[idx].set(mask),
            not_done=self.not_done.at[idx].set(not_done),
            ptr=(self.ptr + n) % cap, size=jnp.minimum(self.size + n, cap))

    def sample(self, rng, batch):
        idx = jax.random.randint(rng, (batch,), 0, jnp.maximum(self.size, 1))
        return (self.obs[idx], self.action[idx], self.reward[idx],
                self.next_obs[idx], self.mask[idx], self.not_done[idx])


@struct.dataclass
class DPGTrainState:
    actor: Any
    actor_target: Any
    critic: Any
    critic_target: Any
    norm: NormState
    actor_opt: Any
    critic_opt: Any
    replay: Any
    runner: Any
    rng: jnp.ndarray


@dataclasses.dataclass
class DPG:
    env: Env
    config: DPGConfig

    def __post_init__(self):
        cfg = self.config
        self.actor_tx = optax.adam(cfg.a_lr)
        self.critic_tx = optax.adam(cfg.c_lr)
        self._train_iter = jax.jit(
            self._train_iteration_rnn if cfg.recurrent
            else self._train_iteration_ff,
            donate_argnums=(0,), static_argnames=("random_actions",))
        self._eval_iter = jax.jit(self._evaluate)

    def init(self, seed: int) -> DPGTrainState:
        cfg = self.config
        rng = jax.random.PRNGKey(seed)
        rng, k_a, k_c, k_r = jax.random.split(rng, 4)
        obs_dim, act_dim = self.env.observation_size, self.env.action_size
        if cfg.recurrent:
            # tanh-bounded deterministic LSTM actor (reference LSTM_Actor,
            # actor.py:74-139). Round-4 used an unbounded Gaussian mean
            # head here; the DPG actor loss then pushes the mean beyond
            # the action clip without limit, which is exactly the
            # monotone policy decay recorded in curves/rdpg_walker.npz
            actor = LSTMActor.init(k_a, obs_dim, act_dim,
                                   max_action=cfg.max_action)
            critic = LSTMQ.init(k_c, obs_dim, act_dim)
            replay = EpisodeBuffer.create(cfg.episode_capacity,
                                          cfg.max_traj_len, obs_dim, act_dim)
        else:
            actor = FFActor.init(k_a, obs_dim, act_dim,
                                 max_action=cfg.max_action)
            critic = FFQ.init(k_c, obs_dim, act_dim)
            replay = ReplayBuffer.create(cfg.replay_size, obs_dim, act_dim)
        state = DPGTrainState(
            actor=actor, actor_target=actor, critic=critic,
            critic_target=critic, norm=NormState.create(obs_dim),
            actor_opt=self.actor_tx.init(actor.params),
            critic_opt=self.critic_tx.init(critic.params),
            replay=replay, runner=init_runner(self.env, k_r, cfg.num_envs),
            rng=rng)
        return _tree_copy(state)

    # ------------------------------------------------------------------
    # feed-forward DDPG
    # ------------------------------------------------------------------
    def _train_iteration_ff(self, state: DPGTrainState, random_actions: bool):
        cfg = self.config
        rng, k_collect, k_updates = jax.random.split(state.rng, 3)

        def policy_fn(k, obs):
            if random_actions:
                return jax.random.uniform(
                    k, (obs.shape[0], self.env.action_size),
                    minval=-cfg.max_action, maxval=cfg.max_action)
            a = state.actor.act(state.norm, obs)
            return jnp.clip(a + cfg.expl_noise * jax.random.normal(k, a.shape),
                            -cfg.max_action, cfg.max_action)

        runner, traj = rollout_scan(self.env, policy_fn, state.runner,
                                    cfg.collect_steps, cfg.max_traj_len)
        T, B = traj.reward.shape
        flat = lambda x: x.reshape((T * B,) + x.shape[2:])
        replay = state.replay.add_batch(
            flat(traj.obs), flat(traj.action), flat(traj.reward),
            flat(traj.next_obs),
            1.0 - flat(traj.terminated).astype(jnp.float32))

        def update(carry, key):
            actor, actor_t, critic, critic_t, a_opt, c_opt = carry
            obs, action, reward, next_obs, not_done = replay.sample(
                key, cfg.batch_size)
            target_q = reward[:, None] + not_done[:, None] * cfg.discount * \
                critic_t.q(state.norm, next_obs, actor_t.act(state.norm, next_obs))
            target_q = jax.lax.stop_gradient(target_q)

            def critic_loss_fn(params):
                q = critic.replace(params=params).q(state.norm, obs, action)
                return ((q - target_q) ** 2).mean()

            c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(critic.params)
            c_up, c_opt = self.critic_tx.update(c_grads, c_opt, critic.params)
            critic = critic.replace(
                params=optax.apply_updates(critic.params, c_up))

            def actor_loss_fn(params):
                a = actor.replace(params=params).act(state.norm, obs)
                return -critic.q(state.norm, obs, a).mean()

            a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(actor.params)
            a_up, a_opt = self.actor_tx.update(a_grads, a_opt, actor.params)
            actor = actor.replace(params=optax.apply_updates(actor.params, a_up))

            soft = lambda t, s: jax.tree_util.tree_map(
                lambda pt, ps: (1 - cfg.tau) * pt + cfg.tau * ps, t, s)
            actor_t = actor_t.replace(params=soft(actor_t.params, actor.params))
            critic_t = critic_t.replace(
                params=soft(critic_t.params, critic.params))
            return ((actor, actor_t, critic, critic_t, a_opt, c_opt),
                    jnp.stack([c_loss, a_loss]))

        keys = jax.random.split(k_updates, cfg.updates_per_iter)
        carry = (state.actor, state.actor_target, state.critic,
                 state.critic_target, state.actor_opt, state.critic_opt)
        carry, losses = jax.lax.scan(update, carry, keys)
        actor, actor_t, critic, critic_t, a_opt, c_opt = carry

        stats = episode_stats(traj)
        new_state = state.replace(
            actor=actor, actor_target=actor_t, critic=critic,
            critic_target=critic_t, actor_opt=a_opt, critic_opt=c_opt,
            replay=replay, runner=runner, rng=rng)
        return new_state, {
            "critic_loss": losses[:, 0].mean(),
            "actor_loss": losses[:, 1].mean(),
            "train_ep_return": stats["ep_return"],
            "train_ep_len": stats["ep_len"],
            "reward_per_step": stats["reward_per_step"],
        }

    # ------------------------------------------------------------------
    # recurrent DPG
    # ------------------------------------------------------------------
    def _collect_episodes(self, state: DPGTrainState, rng, random_actions):
        """Fresh-reset fleet, one full (masked) episode per env -- the
        episode-aligned collection the recurrent replay needs
        (dpg.py:174-195)."""
        cfg = self.config
        B = cfg.num_envs
        k_reset, k_roll = jax.random.split(rng)
        runner = init_runner(self.env, k_reset, B)
        layers = state.actor.layers

        def step(carry, key):
            r, lstm_carry = carry
            obs = r.obs
            if random_actions:
                action = jax.random.uniform(
                    key, (B, self.env.action_size),
                    minval=-cfg.max_action, maxval=cfg.max_action)
                new_lstm = lstm_carry
            else:
                new_lstm, mean = state.actor.step_act(
                    state.norm, lstm_carry, obs)
                action = jnp.clip(
                    mean + cfg.expl_noise * jax.random.normal(key, mean.shape),
                    -cfg.max_action, cfg.max_action)
            keys = jax.random.split(jax.random.fold_in(key, 1), B)
            env_state, next_obs, reward, terminated, _ = jax.vmap(
                self.env.step)(r.env_state, action, keys)
            new_r = r.replace(env_state=env_state, obs=next_obs,
                              traj_len=r.traj_len + 1)
            out = (obs, action, reward, next_obs, terminated)
            return (new_r, new_lstm), out

        init_lstm = lstm_zero_carry(layers, (B,))
        keys = jax.random.split(k_roll, cfg.max_traj_len)
        (_, _), (obs, action, reward, next_obs, terminated) = jax.lax.scan(
            step, (runner, init_lstm), keys)
        # time-major -> episode-major
        obs = jnp.swapaxes(obs, 0, 1)
        action = jnp.swapaxes(action, 0, 1)
        reward = jnp.swapaxes(reward, 0, 1)
        next_obs = jnp.swapaxes(next_obs, 0, 1)
        terminated = jnp.swapaxes(terminated, 0, 1).astype(jnp.float32)
        # mask: alive up to and including first termination
        died_before = jnp.cumsum(terminated, axis=1) - terminated
        mask = (died_before == 0).astype(jnp.float32)
        not_done = 1.0 - terminated
        return obs, action, reward, next_obs, mask, not_done

    def _train_iteration_rnn(self, state: DPGTrainState, random_actions: bool):
        cfg = self.config
        rng, k_collect, k_updates = jax.random.split(state.rng, 3)
        eps = self._collect_episodes(state, k_collect, random_actions)
        replay = state.replay.add_episodes(*eps)

        def update(carry, key):
            actor, actor_t, critic, critic_t, a_opt, c_opt = carry
            obs, action, reward, next_obs, mask, not_done = replay.sample(
                key, cfg.traj_batch)
            # time-major for scans
            tm = lambda x: jnp.swapaxes(x, 0, 1)
            obs_t, act_t = tm(obs), tm(action)
            next_t = tm(next_obs)
            rew_t, mask_t, nd_t = tm(reward), tm(mask), tm(not_done)

            next_a = actor_t.seq_act(state.norm, next_t)
            q_next = critic_t.seq_q(state.norm, next_t, next_a)[..., 0]
            target = rew_t + nd_t * cfg.discount * q_next
            target = jax.lax.stop_gradient(target)

            def critic_loss_fn(params):
                q = critic.replace(params=params).seq_q(
                    state.norm, obs_t, act_t)[..., 0]
                return (((q - target) ** 2) * mask_t).sum() / mask_t.sum()

            c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(critic.params)
            c_up, c_opt = self.critic_tx.update(c_grads, c_opt, critic.params)
            critic = critic.replace(
                params=optax.apply_updates(critic.params, c_up))

            def actor_loss_fn(params):
                a = actor.replace(params=params).seq_act(state.norm, obs_t)
                q = critic.seq_q(state.norm, obs_t, a)[..., 0]
                return -(q * mask_t).sum() / mask_t.sum()

            a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(actor.params)
            a_up, a_opt = self.actor_tx.update(a_grads, a_opt, actor.params)
            actor = actor.replace(params=optax.apply_updates(actor.params, a_up))

            soft = lambda t, s: jax.tree_util.tree_map(
                lambda pt, ps: (1 - cfg.tau) * pt + cfg.tau * ps, t, s)
            actor_t = actor_t.replace(params=soft(actor_t.params, actor.params))
            critic_t = critic_t.replace(
                params=soft(critic_t.params, critic.params))
            return ((actor, actor_t, critic, critic_t, a_opt, c_opt),
                    jnp.stack([c_loss, a_loss]))

        # full update budget: the round-4 //8 throttle left RDPG with ~10
        # BPTT updates per 25k collected steps -- an order of magnitude
        # under the reference's per-step update cadence (dpg.py:312-325)
        keys = jax.random.split(k_updates, max(1, cfg.updates_per_iter))
        carry = (state.actor, state.actor_target, state.critic,
                 state.critic_target, state.actor_opt, state.critic_opt)
        carry, losses = jax.lax.scan(update, carry, keys)
        actor, actor_t, critic, critic_t, a_opt, c_opt = carry

        obs, action, reward, next_obs, mask, not_done = eps
        ep_ret = (reward * mask).sum(axis=1).mean()
        ep_len = mask.sum(axis=1).mean()
        new_state = state.replace(
            actor=actor, actor_target=actor_t, critic=critic,
            critic_target=critic_t, actor_opt=a_opt, critic_opt=c_opt,
            replay=replay, runner=state.runner, rng=rng)
        return new_state, {
            "critic_loss": losses[:, 0].mean(),
            "actor_loss": losses[:, 1].mean(),
            "train_ep_return": ep_ret,
            "train_ep_len": ep_len,
            "reward_per_step": (reward * mask).sum() / mask.sum(),
        }

    # ------------------------------------------------------------------
    def _evaluate(self, state: DPGTrainState, rng):
        cfg = self.config
        if cfg.recurrent:
            B = cfg.num_envs
            runner = init_runner(self.env, rng, B)

            def step(carry, _):
                r, lstm_carry = carry
                lstm_carry, mean = state.actor.step_act(
                    state.norm, lstm_carry, r.obs)
                keys = jax.random.split(
                    jax.random.fold_in(rng, r.traj_len[0]), B)
                env_state, next_obs, reward, terminated, _ = jax.vmap(
                    self.env.step)(r.env_state, mean, keys)
                new_r = r.replace(env_state=env_state, obs=next_obs,
                                  traj_len=r.traj_len + 1)
                return (new_r, lstm_carry), (reward, terminated)

            (_, _), (rewards, terminated) = jax.lax.scan(
                step, (runner, lstm_zero_carry(state.actor.layers, (B,))),
                None, length=cfg.max_traj_len)
            term = terminated.astype(jnp.float32)
            died_before = jnp.cumsum(term, axis=0) - term
            mask = (died_before == 0).astype(jnp.float32)
            return {"ep_return": (rewards * mask).sum(axis=0).mean(),
                    "ep_len": mask.sum(axis=0).mean(),
                    "reward_per_step": (rewards * mask).sum() / mask.sum(),
                    "num_episodes": jnp.asarray(cfg.num_envs)}

        def policy_fn(_, obs):
            return state.actor.act(state.norm, obs)

        runner = init_runner(self.env, rng, cfg.num_envs)
        _, traj = rollout_scan(self.env, policy_fn, runner,
                               cfg.max_traj_len, cfg.max_traj_len)
        return episode_stats(traj)

    def train(self, state, max_timesteps, eval_freq_iters=10, logger=None,
              save_fn=None, verbose=True):
        cfg = self.config
        steps_per_iter = (cfg.max_traj_len if cfg.recurrent
                          else cfg.collect_steps) * cfg.num_envs
        n_iters = max(1, int(max_timesteps) // steps_per_iter)
        warmup = max(1, cfg.start_timesteps // steps_per_iter)
        highest = -np.inf
        total = 0
        for it in range(n_iters):
            t0 = time.time()
            state, metrics = self._train_iter(
                state, random_actions=(it < warmup))
            metrics = {k: float(v) for k, v in metrics.items()}
            total += steps_per_iter
            if it % eval_freq_iters == 0:
                ev = self._eval_iter(state, jax.random.fold_in(
                    jax.random.PRNGKey(5), it))
                ret = float(ev["ep_return"])
                if verbose:
                    print(f"it {it:5d} | steps {total:9d} | eval {ret:8.2f} "
                          f"| {time.time()-t0:.2f}s")
                if logger:
                    logger.add_scalar("Test/Return", ret, total)
                    logger.add_scalar("Misc/Critic Loss",
                                      metrics["critic_loss"], total)
                if ret > highest:
                    highest = ret
                    if save_fn:
                        save_fn(state)
        return state


def run_experiment(args, recurrent: bool = False):
    """CLI entry (reference dpg.py:197-341)."""
    from apex_tpu.envs.registry import env_factory
    from apex_tpu.runtime.checkpoint import save_checkpoint
    from apex_tpu.runtime.log import create_logger

    env = env_factory(
        args.env_name, simrate=args.simrate,
        command_profile=args.command_profile,
        input_profile=args.input_profile, learn_gains=args.learn_gains,
        dynamics_randomization=args.dyn_random, reward=args.reward,
        history=args.history)
    cfg = DPGConfig(
        num_envs=args.num_procs, expl_noise=args.expl_noise,
        batch_size=args.batch_size, discount=args.discount, tau=args.tau,
        a_lr=args.a_lr, c_lr=args.c_lr, max_traj_len=args.max_traj_len,
        recurrent=recurrent)
    dpg = DPG(env, cfg)
    state = dpg.init(seed=args.seed)
    logger = create_logger(args)
    print(("Recurrent " if recurrent else "") + "Deterministic Policy "
          "Gradient (on-device)")
    return dpg.train(state, max_timesteps=int(args.max_timesteps),
                     logger=logger,
                     save_fn=lambda st: save_checkpoint(logger.dir, st))
