"""Augmented Random Search (v1/v2), antithetic vmapped policy fleets.

Re-design of reference rl/algos/ars.py (268 LoC): the 25M-float shared noise
table in the Ray object store (ars.py:14-49) and ARS_process worker rollouts
(:51-93) become on-device noise generated from fold_in seeds and ONE vmapped
batch of 2*deltas policies rolled out in lockstep (SURVEY.md section 2.3).
Update rule matches ARS.step (ars.py:122-157): rank deltas by
max(r+, r-), use the top `deltas_used`, step by
alpha / (n * sigma_R) * sum (r+ - r-) * delta.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.flatten_util  # registers jax.flatten_util.ravel_pytree
import jax.numpy as jnp
import numpy as np
from flax import struct

from apex_tpu.envs.base import Env
from apex_tpu.models import GaussianLSTMActor, LinearActor, NormState


@dataclasses.dataclass(frozen=True)
class ARSConfig:
    """Defaults mirror reference apex.py:44-69."""
    deltas: int = 64
    deltas_used: int = 32
    step_size: float = 0.01           # lr
    delta_std: float = 0.0075         # std
    max_traj_len: int = 400
    hidden_size: int = 32
    algo: str = "v1"                  # v2 adds observation normalization
    # LSTM policy option (reference ars.py:168-181 builds an LSTM_Actor
    # when --recurrent; params zero-initialized per the ARS paper either
    # way). Hidden state is reset at episode start and carried through
    # the rollout scan.
    recurrent: bool = False


@struct.dataclass
class ARSTrainState:
    theta: jnp.ndarray      # flat policy parameters
    norm: NormState
    rng: jnp.ndarray
    total_steps: jnp.ndarray


@dataclasses.dataclass
class ARS:
    env: Env
    config: ARSConfig

    def __post_init__(self):
        cfg = self.config
        if cfg.recurrent:
            self._lstm_layers = (cfg.hidden_size, cfg.hidden_size)
            template = GaussianLSTMActor.init(
                jax.random.PRNGKey(0), self.env.observation_size,
                self.env.action_size, layers=self._lstm_layers,
                fixed_std=1.0)
        else:
            template = LinearActor.init(self.env.observation_size,
                                        self.env.action_size, cfg.hidden_size)
        flat, self._unravel = jax.flatten_util.ravel_pytree(template.params)
        self._dim = flat.shape[0]
        self._step = jax.jit(self._iteration, donate_argnums=(0,))

    def init(self, seed: int) -> ARSTrainState:
        # zero init (reference Linear_Actor zeroes all params, actor.py:31-32)
        return ARSTrainState(
            theta=jnp.zeros(self._dim),
            norm=NormState.create(self.env.observation_size),
            rng=jax.random.PRNGKey(seed),
            total_steps=jnp.zeros((), jnp.int32))

    def _rollout_batch(self, thetas, norm, rng):
        """Deterministic episode return for each policy in the stacked batch
        (reference ARS_process.rollout, ars.py:65-93)."""
        n = thetas.shape[0]
        cfg = self.config
        keys = jax.random.split(rng, n)

        def single(theta, key):
            state, obs = self.env.reset(key)
            if cfg.recurrent:
                actor = GaussianLSTMActor(params=self._unravel(theta),
                                          fixed_std=1.0,
                                          layers=self._lstm_layers)
                hidden0 = actor.zero_carry(())

                def policy(hidden, ob):
                    hidden, (mean, _std) = actor.step_dist(norm, hidden, ob)
                    return hidden, mean
            else:
                actor = LinearActor(params=self._unravel(theta))
                hidden0 = ()

                def policy(hidden, ob):
                    return hidden, actor.act(norm, ob)

            def step(carry, k):
                st, ob, hidden, ret, steps, alive = carry
                hidden, action = policy(hidden, ob)
                st2, ob2, r, term, _ = self.env.step(st, action, k)
                ret = ret + r * alive
                steps = steps + alive.astype(jnp.int32)
                alive = alive * (1.0 - term.astype(jnp.float32))
                return (st2, ob2, hidden, ret, steps, alive), ob

            keys2 = jax.random.split(jax.random.fold_in(key, 1),
                                     cfg.max_traj_len)
            (_, _, _, ret, steps, _), obs_seq = jax.lax.scan(
                step, (state, obs, hidden0, jnp.zeros(()),
                       jnp.zeros((), jnp.int32), jnp.ones(())), keys2)
            return ret, steps, obs_seq

        return jax.vmap(single)(thetas, keys)

    def _iteration(self, state: ARSTrainState):
        cfg = self.config
        rng, k_delta, k_roll = jax.random.split(state.rng, 3)
        deltas = jax.random.normal(k_delta, (cfg.deltas, self._dim))
        cand = jnp.concatenate([state.theta + cfg.delta_std * deltas,
                                state.theta - cfg.delta_std * deltas])
        returns, steps, obs_seq = self._rollout_batch(cand, state.norm, k_roll)
        r_pos, r_neg = returns[:cfg.deltas], returns[cfg.deltas:]

        # rank by max(r+, r-), keep top deltas_used (ars.py:137-147)
        scores = jnp.maximum(r_pos, r_neg)
        top = jnp.argsort(-scores)[:cfg.deltas_used]
        r_p, r_n, d = r_pos[top], r_neg[top], deltas[top]
        sigma_r = jnp.std(jnp.concatenate([r_p, r_n])) + 1e-8
        update = (cfg.step_size / (cfg.deltas_used * sigma_r)) * \
            ((r_p - r_n) @ d)
        theta = state.theta + update

        norm = state.norm
        if cfg.algo == "v2":
            norm = norm.update(obs_seq.reshape(-1, obs_seq.shape[-1]))

        metrics = {
            "mean_return": returns.mean(),
            "max_return": returns.max(),
            "sigma_r": sigma_r,
            "timesteps": steps.sum(),
        }
        return state.replace(theta=theta, norm=norm, rng=rng,
                             total_steps=state.total_steps + steps.sum()), metrics

    def train(self, state: ARSTrainState, n_itr: int, logger=None,
              save_fn=None, verbose=True) -> ARSTrainState:
        highest = -np.inf
        for it in range(n_itr):
            t0 = time.time()
            state, metrics = self._step(state)
            metrics = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t0
            if verbose:
                sps = metrics["timesteps"] / dt
                print(f"itr {it:4d} | mean {metrics['mean_return']:8.2f} | "
                      f"max {metrics['max_return']:8.2f} | {dt:.2f}s "
                      f"({sps:,.0f} steps/s)")
            if logger is not None:
                logger.add_scalar("Test/Return", metrics["mean_return"], it)
                logger.add_scalar("Misc/Timesteps",
                                  int(state.total_steps), it)
            if metrics["mean_return"] > highest:
                highest = metrics["mean_return"]
                if save_fn is not None:
                    save_fn(state)
        return state


def run_experiment(args):
    """CLI entry (reference ars.py:159-268)."""
    from apex_tpu.envs.registry import env_factory
    from apex_tpu.runtime.checkpoint import save_checkpoint
    from apex_tpu.runtime.log import create_logger

    env = env_factory(
        args.env_name, simrate=args.simrate,
        command_profile=args.command_profile,
        input_profile=args.input_profile, reward=args.reward,
        dynamics_randomization=args.dyn_random, history=args.history)
    cfg = ARSConfig(
        deltas=args.deltas, deltas_used=args.deltas_used, step_size=args.lr,
        delta_std=args.std, max_traj_len=args.max_traj_len,
        hidden_size=args.hidden_size, algo=args.algo,
        recurrent=getattr(args, "recurrent", False))
    ars = ARS(env, cfg)
    state = ars.init(seed=args.seed)
    logger = create_logger(args)
    print("Augmented Random Search (on-device antithetic fleet)")
    return ars.train(state, n_itr=args.n_itr, logger=logger,
                     save_fn=lambda st: save_checkpoint(logger.dir, st))
