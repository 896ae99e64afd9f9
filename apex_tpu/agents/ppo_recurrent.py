"""Recurrent PPO: LSTM actor/critic with BPTT over rollout chunks.

Rebuild of the reference's `--recurrent` PPO path (rl/algos/ppo.py:411-430:
whole padded trajectories as minibatches through Gaussian_LSTM_Actor /
LSTM_V). The vectorized-fleet equivalent: every env contributes one
fixed-length rollout chunk; hidden states are carried in the runner between
chunks and reset at episode boundaries *inside* the chunk via done-masked
scans, so BPTT sees exactly the same episode segmentation the reference's
pad_sequence batching does (minus cross-chunk history, which the carried
hidden state preserves at collection time).

Minibatches are sets of env chunks (the reference samples sets of whole
trajectories, ppo.py:412-413).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from apex_tpu.agents.ppo import PPOConfig
from apex_tpu.envs.base import Env, mirror_matrix, mirror_clock
from apex_tpu.models import (
    DiagGaussian,
    GaussianLSTMActor,
    LSTMV,
    NormState,
)
from apex_tpu.models.nets import lstm_step, lstm_zero_carry
from apex_tpu.ops.gae import discounted_returns, gae_advantages


def _carry_where(done, zero, carry):
    """Per-env reset of a list[(h, c)] LSTM carry. done: (B,)."""
    d = done[:, None]
    return [(jnp.where(d, zh, h), jnp.where(d, zc, c))
            for (zh, zc), (h, c) in zip(zero, carry)]


@struct.dataclass
class RecurrentRunner:
    env_state: Any
    obs: jnp.ndarray
    traj_len: jnp.ndarray
    ep_return: jnp.ndarray
    actor_carry: Any
    critic_carry: Any
    rng: jnp.ndarray


class RecurrentRollout(NamedTuple):
    obs: jnp.ndarray          # (T, B, obs)
    action: jnp.ndarray
    reward: jnp.ndarray
    terminated: jnp.ndarray
    truncated: jnp.ndarray
    next_obs: jnp.ndarray
    episode_start: jnp.ndarray  # (T, B) 1 if this step begins an episode
    done_ep_return: jnp.ndarray
    done_ep_len: jnp.ndarray


@struct.dataclass
class RecurrentPPOState:
    actor: GaussianLSTMActor
    critic: LSTMV
    norm: NormState
    actor_opt: Any
    critic_opt: Any
    runner: RecurrentRunner
    rng: jnp.ndarray


@dataclasses.dataclass
class RecurrentPPO:
    env: Env
    config: PPOConfig
    layers: tuple = (128, 128)

    def __post_init__(self):
        cfg = self.config
        self.actor_tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr, eps=cfg.eps))
        self.critic_tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr, eps=cfg.eps))
        if cfg.use_mirror and self.env.mirrored_obs is not None:
            self.obs_mirror = jnp.asarray(mirror_matrix(self.env.mirrored_obs))
            self.act_mirror = jnp.asarray(mirror_matrix(self.env.mirrored_acts))
        else:
            self.obs_mirror = None
            self.act_mirror = None
        self._train_iter = jax.jit(self._train_iteration, donate_argnums=(0,))
        self._eval_iter = jax.jit(self._evaluate)

    # ------------------------------------------------------------------
    def init(self, seed: int) -> RecurrentPPOState:
        cfg = self.config
        rng = jax.random.PRNGKey(seed)
        rng, k_a, k_c, k_r = jax.random.split(rng, 4)
        obs_dim, act_dim = self.env.observation_size, self.env.action_size
        # fixed_std = exp(-2) for the recurrent reference policy
        # (ppo.py:537)
        actor = GaussianLSTMActor.init(k_a, obs_dim, act_dim, self.layers,
                                       fixed_std=float(np.exp(-2)))
        critic = LSTMV.init(k_c, obs_dim, self.layers)
        runner = self._init_runner(k_r)
        return RecurrentPPOState(
            actor=actor, critic=critic, norm=NormState.create(obs_dim),
            actor_opt=self.actor_tx.init(actor.params),
            critic_opt=self.critic_tx.init(critic.params),
            runner=runner, rng=rng)

    def _init_runner(self, rng) -> RecurrentRunner:
        B = self.config.num_envs

        @jax.jit
        def _init(rng):
            rng, key = jax.random.split(rng)
            keys = jax.random.split(key, B)
            env_state, obs = jax.vmap(self.env.reset)(keys)
            return RecurrentRunner(
                env_state=env_state, obs=obs,
                traj_len=jnp.zeros((B,), jnp.int32),
                ep_return=jnp.zeros((B,)),
                actor_carry=lstm_zero_carry(self.layers, (B,)),
                critic_carry=lstm_zero_carry(self.layers, (B,)),
                rng=rng)

        return _init(rng)

    def prenormalize(self, state: RecurrentPPOState, steps: int = 10000,
                     noise_std: float = 1.0) -> RecurrentPPOState:
        """Obs-normalizer burn-in (reference normalize.py:35-48). Uses the
        untrained policy mean + N(0,1) noise, like the FF path."""
        cfg = self.config
        T = max(1, steps // cfg.num_envs)
        B = cfg.num_envs

        @jax.jit
        def run(runner):
            def step(carry, _):
                r = carry
                rng, k_act, k_step = jax.random.split(r.rng, 3)
                a_carry, (mean, _) = state.actor.step_dist(
                    state.norm, r.actor_carry, r.obs)
                action = mean + noise_std * jax.random.normal(
                    k_act, mean.shape)
                keys = jax.random.split(k_step, B)
                env_state, next_obs, _, _, _ = jax.vmap(self.env.step)(
                    r.env_state, action, keys)
                new_r = r.replace(env_state=env_state, obs=next_obs,
                                  actor_carry=a_carry, rng=rng)
                return new_r, r.obs

            return jax.lax.scan(step, runner, None, length=T)

        _, obs = run(state.runner)
        norm = NormState.create(self.env.observation_size).update(obs)
        rng, k = jax.random.split(state.rng)
        return state.replace(norm=norm, runner=self._init_runner(k), rng=rng)

    # ------------------------------------------------------------------
    def _rollout(self, state: RecurrentPPOState, runner: RecurrentRunner,
                 anneal, deterministic: bool):
        cfg = self.config
        B = cfg.num_envs
        zero = lstm_zero_carry(self.layers, (B,))

        def step(carry, _):
            r, ep_start = carry
            rng, k_act, k_step, k_reset = jax.random.split(r.rng, 4)
            a_carry, (mean, std) = state.actor.step_dist(
                state.norm, r.actor_carry, r.obs)
            if deterministic:
                action = mean
            else:
                action = DiagGaussian.sample(k_act, mean, std * anneal)

            keys = jax.random.split(k_step, B)
            env_state, next_obs, reward, terminated, _ = jax.vmap(
                self.env.step)(r.env_state, action, keys)
            traj_len = r.traj_len + 1
            truncated = (traj_len >= cfg.max_traj_len) & ~terminated
            done = terminated | truncated
            ep_return = r.ep_return + reward

            reset_keys = jax.random.split(k_reset, B)
            reset_state, reset_obs = jax.vmap(self.env.reset)(reset_keys)
            from apex_tpu.agents.rollout import tree_where

            new_env_state = tree_where(done, reset_state, env_state)
            new_obs = tree_where(done, reset_obs, next_obs)

            out = RecurrentRollout(
                obs=r.obs, action=action, reward=reward,
                terminated=terminated, truncated=truncated,
                next_obs=next_obs, episode_start=ep_start,
                done_ep_return=jnp.where(done, ep_return, 0.0),
                done_ep_len=jnp.where(done, traj_len, 0))
            new_r = RecurrentRunner(
                env_state=new_env_state, obs=new_obs,
                traj_len=jnp.where(done, 0, traj_len),
                ep_return=jnp.where(done, 0.0, ep_return),
                actor_carry=_carry_where(done, zero, a_carry),
                critic_carry=r.critic_carry,  # critic scans at update time
                rng=rng)
            return (new_r, done.astype(jnp.float32)), out

        init_start = (runner.traj_len == 0).astype(jnp.float32)
        (runner, _), traj = jax.lax.scan(
            step, (runner, init_start), None, length=cfg.rollout_len)
        return runner, traj

    # ------------------------------------------------------------------
    def _seq_apply(self, cells, norm, obs_seq, ep_start, init_carry, head):
        """Scan an LSTM stack over (T, B, obs) with per-step episode-start
        resets; head maps top hidden -> outputs."""
        B = obs_seq.shape[1]
        zero = lstm_zero_carry(self.layers, (B,))

        def step(carry, x):
            obs_t, start_t = x
            carry = _carry_where(start_t > 0.5, zero, carry)
            carry, top = lstm_step(cells, carry, (obs_t - norm.mean) / norm.std)
            return carry, top

        _, tops = jax.lax.scan(step, init_carry, (obs_seq, ep_start))
        return head(tops)

    def _actor_seq_dist(self, actor, norm, obs_seq, ep_start, init_carry,
                        anneal):
        tops = self._seq_apply(actor.params["cells"], norm, obs_seq, ep_start,
                               init_carry, lambda t: t)
        mean = tops @ actor.params["out"]["w"] + actor.params["out"]["b"]
        std = jnp.full_like(mean, actor.fixed_std) * anneal
        return mean, std

    def _critic_seq(self, critic, norm, obs_seq, ep_start, init_carry):
        tops = self._seq_apply(critic.params["cells"], norm, obs_seq,
                               ep_start, init_carry, lambda t: t)
        return (tops @ critic.params["out"]["w"]
                + critic.params["out"]["b"])[..., 0]

    # ------------------------------------------------------------------
    def _train_iteration(self, state: RecurrentPPOState, anneal):
        cfg = self.config
        rng, k_perm = jax.random.split(state.rng)
        state = state.replace(rng=rng)

        init_actor_carry = state.runner.actor_carry
        init_critic_carry = state.runner.critic_carry
        runner, traj = self._rollout(state, state.runner, anneal, False)
        T, B = traj.reward.shape

        # values over the chunk (critic scan with resets)
        values = self._critic_seq(state.critic, state.norm, traj.obs,
                                  traj.episode_start, init_critic_carry)
        # bootstrap values of next_obs: re-scan over next_obs with the same
        # episode segmentation (the carry at each step matches the critic's
        # carry after consuming obs up to t)
        next_values = self._critic_seq(
            state.critic, state.norm, traj.next_obs, traj.episode_start,
            init_critic_carry)

        if cfg.use_gae:
            advantages, returns = gae_advantages(
                traj.reward, values, next_values, traj.terminated,
                traj.truncated, cfg.gamma, cfg.lam)
        else:
            returns = discounted_returns(
                traj.reward, traj.terminated, traj.truncated, next_values,
                cfg.gamma)
            advantages = returns - values
        advantages = (advantages - advantages.mean()) / \
            (advantages.std() + cfg.eps)

        old_mean, old_std = self._actor_seq_dist(
            state.actor, state.norm, traj.obs, traj.episode_start,
            init_actor_carry, anneal)
        old_log_prob = DiagGaussian.log_prob(old_mean, old_std,
                                             traj.action).sum(-1)

        # ---- minibatches over env chunks (sets of whole trajectories,
        # ppo.py:412-413) ----
        mb_envs = max(1, min(cfg.minibatch_size, B))
        n_mb = B // mb_envs

        def mb_update(carry, env_idx):
            actor, critic, a_opt, c_opt, stop = carry
            obs_mb = traj.obs[:, env_idx]
            act_mb = traj.action[:, env_idx]
            ret_mb = returns[:, env_idx]
            adv_mb = advantages[:, env_idx]
            olp_mb = old_log_prob[:, env_idx]
            om_mb, os_mb = old_mean[:, env_idx], old_std[:, env_idx]
            start_mb = traj.episode_start[:, env_idx]
            a_carry0 = [(h[env_idx], c[env_idx]) for h, c in init_actor_carry]
            c_carry0 = [(h[env_idx], c[env_idx]) for h, c in init_critic_carry]

            def actor_loss_fn(params):
                a = actor.replace(params=params)
                mean, std = self._actor_seq_dist(a, state.norm, obs_mb,
                                                 start_mb, a_carry0, anneal)
                lp = DiagGaussian.log_prob(mean, std, act_mb).sum(-1)
                ratio = jnp.exp(lp - olp_mb)
                cpi = ratio * adv_mb
                clip = jnp.clip(ratio, 1 - cfg.clip, 1 + cfg.clip) * adv_mb
                actor_loss = -jnp.minimum(cpi, clip).mean()
                entropy = DiagGaussian.entropy(std).mean()
                if self.obs_mirror is not None:
                    mir_obs = obs_mb @ self.obs_mirror
                    if self.env.clock_inds:
                        mir_obs = mirror_clock(mir_obs, self.env.clock_inds)
                    mir_mean, _ = self._actor_seq_dist(
                        a, state.norm, mir_obs, start_mb, a_carry0, anneal)
                    mirror_loss = cfg.mirror_coeff * (
                        (mean - mir_mean @ self.act_mirror) ** 2).mean()
                else:
                    mirror_loss = 0.0
                kl = DiagGaussian.kl(mean, std, om_mb, os_mb).mean()
                total = actor_loss - cfg.entropy_coeff * entropy + mirror_loss
                return total, (actor_loss, entropy, kl, mirror_loss)

            def critic_loss_fn(params):
                v = self._critic_seq(critic.replace(params=params),
                                     state.norm, obs_mb, start_mb, c_carry0)
                return 0.5 * ((ret_mb - v) ** 2).mean()

            def do(_):
                (total, aux), a_g = jax.value_and_grad(
                    actor_loss_fn, has_aux=True)(actor.params)
                c_loss, c_g = jax.value_and_grad(critic_loss_fn)(critic.params)
                a_up, new_a_opt = self.actor_tx.update(a_g, a_opt, actor.params)
                c_up, new_c_opt = self.critic_tx.update(c_g, c_opt,
                                                        critic.params)
                new_actor = actor.replace(
                    params=optax.apply_updates(actor.params, a_up))
                new_critic = critic.replace(
                    params=optax.apply_updates(critic.params, c_up))
                a_loss, ent, kl, mir = aux
                return (new_actor, new_critic, new_a_opt, new_c_opt,
                        jnp.stack([a_loss, ent, c_loss, kl, mir]))

            def skip(_):
                return actor, critic, a_opt, c_opt, jnp.zeros(5)

            actor, critic, a_opt, c_opt, metrics = jax.lax.cond(
                stop, skip, do, None)
            return (actor, critic, a_opt, c_opt, stop), metrics

        def epoch_body(carry, key):
            actor, critic, a_opt, c_opt, stop = carry
            perm = jax.random.permutation(key, B)[: n_mb * mb_envs]
            batches = perm.reshape(n_mb, mb_envs)
            (actor, critic, a_opt, c_opt, stop), metrics = jax.lax.scan(
                mb_update, (actor, critic, a_opt, c_opt, stop), batches)
            stop = stop | (metrics[:, 3].mean() > cfg.kl_max)
            return (actor, critic, a_opt, c_opt, stop), metrics.mean(axis=0)

        keys = jax.random.split(k_perm, cfg.epochs)
        (actor, critic, a_opt, c_opt, _), em = jax.lax.scan(
            epoch_body,
            (state.actor, state.critic, state.actor_opt, state.critic_opt,
             jnp.zeros((), bool)), keys)

        n_done = jnp.maximum(jnp.sum(traj.done_ep_len > 0), 1)
        metrics = {
            "train_ep_return": jnp.sum(traj.done_ep_return) / n_done,
            "train_ep_len": jnp.sum(traj.done_ep_len) / n_done,
            "reward_per_step": traj.reward.mean(),
            "actor_loss": em[:, 0].mean(), "entropy": em[:, 1].mean(),
            "critic_loss": em[:, 2].mean(), "kl": em[:, 3].mean(),
            "mirror_loss": em[:, 4].mean(),
        }
        return state.replace(actor=actor, critic=critic, actor_opt=a_opt,
                             critic_opt=c_opt, runner=runner), metrics

    # ------------------------------------------------------------------
    def _evaluate(self, state: RecurrentPPOState, rng):
        """Deterministic eval: fresh fleet, first-episode stats."""
        cfg = self.config
        B = cfg.num_envs
        runner = self._init_runner(rng)

        def step(carry, _):
            r = carry
            rng2, k_step = jax.random.split(r.rng)
            a_carry, (mean, _) = state.actor.step_dist(
                state.norm, r.actor_carry, r.obs)
            keys = jax.random.split(k_step, B)
            env_state, next_obs, reward, terminated, _ = jax.vmap(
                self.env.step)(r.env_state, mean, keys)
            traj_len = r.traj_len + 1
            new_r = r.replace(env_state=env_state, obs=next_obs,
                              traj_len=traj_len,
                              actor_carry=a_carry, rng=rng2)
            return new_r, (reward, terminated)

        runner, (rewards, terminated) = jax.lax.scan(
            step, runner, None, length=cfg.max_traj_len)
        term = terminated.astype(jnp.float32)
        died_before = jnp.cumsum(term, axis=0) - term
        mask = (died_before == 0).astype(jnp.float32)
        return {"ep_return": (rewards * mask).sum(axis=0).mean(),
                "ep_len": mask.sum(axis=0).mean()}

    # ------------------------------------------------------------------
    def train(self, state, n_itr, logger=None, save_fn=None, verbose=True,
              mesh=None):
        assert mesh is None, "recurrent PPO trains via GSPMD placement " \
            "(shard_ppo_state), not the manual-SPMD path"
        cfg = self.config
        highest = -np.inf
        curr_anneal = 1.0
        for itr in range(n_itr):
            t0 = time.time()
            if highest > (2 / 3) * cfg.max_traj_len and curr_anneal > 0.5:
                curr_anneal *= cfg.anneal_rate
            state, metrics = self._train_iter(state, jnp.asarray(curr_anneal))
            metrics = {k: float(v) for k, v in metrics.items()}
            ev = self._eval_iter(state, jax.random.fold_in(
                jax.random.PRNGKey(3), itr))
            ret = float(ev["ep_return"])
            if verbose:
                print(f"itr {itr:4d} | test {ret:8.2f} | "
                      f"train {metrics['train_ep_return']:8.2f} | "
                      f"kl {metrics['kl']:.4f} | {time.time()-t0:.2f}s")
            if logger is not None:
                logger.add_scalar("Test/Return", ret, itr)
                logger.add_scalar("Train/Return",
                                  metrics["train_ep_return"], itr)
                logger.add_scalar("Train/Mean KL Div", metrics["kl"], itr)
            if ret > highest:
                highest = ret
                if save_fn is not None:
                    save_fn(state)
        return state