"""Actor and critic networks as explicit parameter pytrees (pure JAX).

Parity map to the reference (rl/policies/):
  GaussianFFActor   <-> Gaussian_FF_Actor    (actor.py:142-215)
  FFActor           <-> FF_Actor             (actor.py:43-71)
  LinearActor       <-> Linear_Actor         (actor.py:22-41)
  GaussianLSTMActor <-> Gaussian_LSTM_Actor  (actor.py:218-311)
  FFV               <-> FF_V                 (critic.py:37-77)
  FFQ               <-> FF_Q                 (critic.py:80-116)
  DualQCritic       <-> Dual_Q_Critic        (critic.py:118-168)
  LSTMV             <-> LSTM_V               (critic.py:236-294)

Design notes (TPU-first):
  * Each net is a flax.struct dataclass: `params` is the trainable pytree
    (nested dicts of jnp arrays); architecture switches are static fields
    (pytree_node=False) so they stay Python values under jit.
  * Weight layout is (in, out) so a forward pass is `x @ W + b` -- batched
    over envs this is one MXU matmul per layer for the whole fleet.
  * Observation normalization (obs_mean/obs_std folded into the forward pass,
    reference actor.py:181) lives in a NormState pytree carried alongside
    params and excluded from the optimizer.
  * normc initialization matches reference base.py:7-13: unit-norm columns
    over the input dimension; mean layer scaled by 0.01 (actor.py:175-178).
  * LSTMs use lax.scan over time instead of python loops over LSTMCell
    (reference actor.py:259-269).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from apex_tpu.models.distributions import DiagGaussian

Params = Dict[str, Any]

# Bounds for learned log-std, reference actor.py:9-10.
LOG_STD_HI = -1.5
LOG_STD_LO = -20.0


@struct.dataclass
class NormState:
    """Observation normalizer statistics, folded into policy forward passes.

    The reference burns mean/std into the policy after a noisy-rollout prepass
    (rl/envs/normalize.py:35-48, rl/algos/ppo.py:546-549); NormState is the
    pytree equivalent. `update` implements parallel-merge RunningMeanStd
    (normalize.py:182-208) for streaming use.
    """
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # scalar

    @staticmethod
    def create(obs_dim: int) -> "NormState":
        return NormState(
            mean=jnp.zeros((obs_dim,)), var=jnp.ones((obs_dim,)),
            count=jnp.asarray(1e-4),
        )

    @property
    def std(self) -> jnp.ndarray:
        return jnp.sqrt(self.var + 1e-8)

    def update(self, batch: jnp.ndarray) -> "NormState":
        """Merge a (..., obs_dim) batch using the parallel variance algorithm
        (reference normalize.py:193-208)."""
        batch = batch.reshape(-1, batch.shape[-1])
        b_mean = batch.mean(axis=0)
        b_var = batch.var(axis=0)
        b_count = jnp.asarray(batch.shape[0], dtype=self.count.dtype)
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta ** 2 * self.count * b_count / tot
        return NormState(mean=new_mean, var=m2 / tot, count=tot)


def normalize_obs(norm: NormState, obs: jnp.ndarray) -> jnp.ndarray:
    """(obs - mean) / std, reference actor.py:181 / normalize.py:141-147."""
    return (obs - norm.mean) / norm.std


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def normc_init(rng, in_dim: int, out_dim: int, scale: float = 1.0):
    """normc: N(0,1) then unit-norm per output column (reference base.py:7-13;
    torch normalizes rows of (out,in), here columns of (in,out) -- same thing).
    """
    w = jax.random.normal(rng, (in_dim, out_dim))
    w = w / jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
    return w * scale


def _linear_init(rng, in_dim: int, out_dim: int):
    """torch.nn.Linear default init: U(-k, k), k = 1/sqrt(in_dim). Used where
    the reference does NOT apply normc (e.g. Dual_Q_Critic, LSTM heads)."""
    k = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    wkey, bkey = jax.random.split(rng)
    w = jax.random.uniform(wkey, (in_dim, out_dim), minval=-k, maxval=k)
    b = jax.random.uniform(bkey, (out_dim,), minval=-k, maxval=k)
    return {"w": w, "b": b}


def _mlp_init(rng, sizes: Sequence[int], normc: bool = True) -> list:
    layers = []
    keys = jax.random.split(rng, len(sizes) - 1)
    for i, key in enumerate(keys):
        if normc:
            layers.append({"w": normc_init(key, sizes[i], sizes[i + 1]),
                           "b": jnp.zeros((sizes[i + 1],))})
        else:
            layers.append(_linear_init(key, sizes[i], sizes[i + 1]))
    return layers


def _mlp_apply(layers: list, x: jnp.ndarray, act=jax.nn.relu) -> jnp.ndarray:
    for layer in layers:
        x = act(x @ layer["w"] + layer["b"])
    return x


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Gaussian feed-forward actor  (reference Gaussian_FF_Actor, actor.py:142-215)
# ---------------------------------------------------------------------------

@struct.dataclass
class GaussianFFActor:
    params: Params
    fixed_std: Optional[float] = struct.field(pytree_node=False, default=None)
    bounded: bool = struct.field(pytree_node=False, default=False)

    @staticmethod
    def init(rng, obs_dim: int, action_dim: int, layers: Sequence[int] = (256, 256),
             fixed_std: Optional[float] = None, bounded: bool = False
             ) -> "GaussianFFActor":
        """fixed_std=None => learned std head (actor.py:152-157); bounded =>
        tanh on the mean (actor.py:188-189)."""
        k_hidden, k_mean, k_std = jax.random.split(rng, 3)
        params: Params = {
            "layers": _mlp_init(k_hidden, (obs_dim, *layers), normc=True),
            # mean layer scaled by 0.01 (actor.py:175-178)
            "mean": {"w": normc_init(k_mean, layers[-1], action_dim, scale=0.01),
                     "b": jnp.zeros((action_dim,))},
        }
        if fixed_std is None:
            params["log_std"] = {"w": normc_init(k_std, layers[-1], action_dim),
                                 "b": jnp.zeros((action_dim,))}
        return GaussianFFActor(params=params, fixed_std=fixed_std, bounded=bounded)

    def dist(self, norm: NormState, obs, anneal=1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(mean, std) of the policy distribution (actor.py:180-197)."""
        x = _mlp_apply(self.params["layers"], normalize_obs(norm, obs))
        mean = x @ self.params["mean"]["w"] + self.params["mean"]["b"]
        if self.bounded:
            mean = jnp.tanh(mean)
        if self.fixed_std is None:
            # sd = exp(-2 + 0.5*tanh(logstd_head)) (actor.py:193)
            log_std = x @ self.params["log_std"]["w"] + self.params["log_std"]["b"]
            std = jnp.exp(-2.0 + 0.5 * jnp.tanh(log_std))
        else:
            std = jnp.full_like(mean, self.fixed_std)
        return mean, std * anneal

    def act(self, norm: NormState, obs, rng=None, deterministic: bool = False,
            anneal=1.0) -> jnp.ndarray:
        """Sample (or take the mean of) the policy (actor.py:199-208)."""
        mean, std = self.dist(norm, obs, anneal)
        if deterministic or rng is None:
            return mean
        return DiagGaussian.sample(rng, mean, std)


# ---------------------------------------------------------------------------
# Deterministic feed-forward actor (reference FF_Actor, actor.py:43-71)
# ---------------------------------------------------------------------------

@struct.dataclass
class FFActor:
    params: Params
    max_action: float = struct.field(pytree_node=False, default=1.0)

    @staticmethod
    def init(rng, obs_dim, action_dim, layers=(256, 256), max_action=1.0) -> "FFActor":
        k_hidden, k_out = jax.random.split(rng)
        params = {
            "layers": _mlp_init(k_hidden, (obs_dim, *layers), normc=True),
            "out": {"w": normc_init(k_out, layers[-1], action_dim),
                    "b": jnp.zeros((action_dim,))},
        }
        return FFActor(params=params, max_action=max_action)

    def act(self, norm: NormState, obs):
        """tanh-bounded deterministic action (actor.py:62-68)."""
        x = _mlp_apply(self.params["layers"], normalize_obs(norm, obs))
        a = jnp.tanh(x @ self.params["out"]["w"] + self.params["out"]["b"])
        return a * self.max_action


# ---------------------------------------------------------------------------
# Linear actor for ARS (reference Linear_Actor, actor.py:22-41; zero-init)
# ---------------------------------------------------------------------------

@struct.dataclass
class LinearActor:
    params: Params

    @staticmethod
    def init(obs_dim, action_dim, hidden_size=32) -> "LinearActor":
        return LinearActor(params={
            "l1": {"w": jnp.zeros((obs_dim, hidden_size)),
                   "b": jnp.zeros((hidden_size,))},
            "l2": {"w": jnp.zeros((hidden_size, action_dim)),
                   "b": jnp.zeros((action_dim,))},
        })

    def act(self, norm: NormState, obs):
        x = normalize_obs(norm, obs)
        x = x @ self.params["l1"]["w"] + self.params["l1"]["b"]
        return x @ self.params["l2"]["w"] + self.params["l2"]["b"]


# ---------------------------------------------------------------------------
# Feed-forward critics
# ---------------------------------------------------------------------------

@struct.dataclass
class FFV:
    params: Params

    @staticmethod
    def init(rng, obs_dim, layers=(256, 256)) -> "FFV":
        """V(s) (reference FF_V, critic.py:37-77; normc init everywhere)."""
        k_hidden, k_out = jax.random.split(rng)
        return FFV(params={
            "layers": _mlp_init(k_hidden, (obs_dim, *layers), normc=True),
            "out": {"w": normc_init(k_out, layers[-1], 1), "b": jnp.zeros((1,))},
        })

    def value(self, norm: NormState, obs):
        x = _mlp_apply(self.params["layers"], normalize_obs(norm, obs))
        return x @ self.params["out"]["w"] + self.params["out"]["b"]


@struct.dataclass
class FFQ:
    params: Params

    @staticmethod
    def init(rng, obs_dim, action_dim, layers=(256, 256)) -> "FFQ":
        """Q(s,a) (reference FF_Q, critic.py:80-116)."""
        k_hidden, k_out = jax.random.split(rng)
        return FFQ(params={
            "layers": _mlp_init(k_hidden, (obs_dim + action_dim, *layers), normc=True),
            "out": {"w": normc_init(k_out, layers[-1], 1), "b": jnp.zeros((1,))},
        })

    def q(self, norm: NormState, obs, action):
        x = jnp.concatenate([normalize_obs(norm, obs), action], axis=-1)
        x = _mlp_apply(self.params["layers"], x)
        return x @ self.params["out"]["w"] + self.params["out"]["b"]


def _q_branch(branch, x):
    x = _mlp_apply(branch["layers"], x)
    return x @ branch["out"]["w"] + branch["out"]["b"]


@struct.dataclass
class DualQCritic:
    params: Params

    @staticmethod
    def init(rng, obs_dim, action_dim, hidden_size=256, hidden_layers=2
             ) -> "DualQCritic":
        """Twin Q networks (reference Dual_Q_Critic, critic.py:118-168; torch
        default init, no normc)."""
        k1, k2 = jax.random.split(rng)
        sizes = (obs_dim + action_dim,) + (hidden_size,) * hidden_layers

        def make(k):
            kh, ko = jax.random.split(k)
            return {"layers": _mlp_init(kh, sizes, normc=False),
                    "out": _linear_init(ko, hidden_size, 1)}

        return DualQCritic(params={"q1": make(k1), "q2": make(k2)})

    def q(self, norm: NormState, obs, action):
        x = jnp.concatenate([normalize_obs(norm, obs), action], axis=-1)
        return _q_branch(self.params["q1"], x), _q_branch(self.params["q2"], x)

    def q1(self, norm: NormState, obs, action):
        """Q1-only accessor for the actor loss (critic.py:154-168)."""
        x = jnp.concatenate([normalize_obs(norm, obs), action], axis=-1)
        return _q_branch(self.params["q1"], x)


# ---------------------------------------------------------------------------
# LSTM stack (reference nn.LSTMCell chains, actor.py:74-139, 218-311)
# ---------------------------------------------------------------------------

def lstm_init(rng, in_dim: int, layers: Sequence[int] = (128, 128)) -> list:
    """Stack of LSTM cells. Gate layout follows torch LSTMCell: [i, f, g, o].

    Weights stored as (in, 4H) / (H, 4H) so a step is two MXU matmuls.
    """
    cells = []
    dims = (in_dim, *layers)
    keys = jax.random.split(rng, len(layers))
    for i, key in enumerate(keys):
        kih, khh, kb1, kb2 = jax.random.split(key, 4)
        h = dims[i + 1]
        k = 1.0 / jnp.sqrt(jnp.asarray(h, jnp.float32))
        cells.append({
            "w_ih": jax.random.uniform(kih, (dims[i], 4 * h), minval=-k, maxval=k),
            "w_hh": jax.random.uniform(khh, (h, 4 * h), minval=-k, maxval=k),
            "b_ih": jax.random.uniform(kb1, (4 * h,), minval=-k, maxval=k),
            "b_hh": jax.random.uniform(kb2, (4 * h,), minval=-k, maxval=k),
        })
    return cells


def lstm_zero_carry(layers: Sequence[int], batch_shape=()) -> list:
    """Zeroed (h, c) per cell (reference init_hidden_state, actor.py:104-106)."""
    return [
        (jnp.zeros(batch_shape + (h,)), jnp.zeros(batch_shape + (h,)))
        for h in layers
    ]


def _lstm_cell_step(cell, h, c, x):
    gates = x @ cell["w_ih"] + cell["b_ih"] + h @ cell["w_hh"] + cell["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_step(cells: list, carry: list, x: jnp.ndarray):
    """One time-step through the whole stack. Returns (new_carry, top_h)."""
    new_carry = []
    for cell, (h, c) in zip(cells, carry):
        h, c = _lstm_cell_step(cell, h, c, x)
        new_carry.append((h, c))
        x = h
    return new_carry, x


@struct.dataclass
class GaussianLSTMActor:
    params: Params
    fixed_std: Optional[float] = struct.field(pytree_node=False, default=None)
    layers: Tuple[int, ...] = struct.field(pytree_node=False, default=(128, 128))

    @staticmethod
    def init(rng, obs_dim, action_dim, layers=(128, 128),
             fixed_std: Optional[float] = None) -> "GaussianLSTMActor":
        """Reference Gaussian_LSTM_Actor (actor.py:218-311): LSTM stack +
        linear mean head, fixed or learned-clamped std."""
        k_cells, k_out, k_std = jax.random.split(rng, 3)
        params = {
            "cells": lstm_init(k_cells, obs_dim, layers),
            "out": _linear_init(k_out, layers[-1], action_dim),
        }
        if fixed_std is None:
            params["log_std"] = _linear_init(k_std, layers[-1], action_dim)
        return GaussianLSTMActor(params=params, fixed_std=fixed_std,
                                 layers=tuple(layers))

    def _head(self, top_h):
        mean = top_h @ self.params["out"]["w"] + self.params["out"]["b"]
        if self.fixed_std is None:
            log_std = top_h @ self.params["log_std"]["w"] + self.params["log_std"]["b"]
            std = jnp.exp(jnp.clip(log_std, LOG_STD_LO, LOG_STD_HI))
        else:
            std = jnp.full_like(mean, self.fixed_std)
        return mean, std

    def zero_carry(self, batch_shape=()):
        return lstm_zero_carry(self.layers, batch_shape)

    def step_dist(self, norm: NormState, carry, obs):
        """Single control step: (carry, obs) -> (carry', (mean, std))."""
        carry, top = lstm_step(self.params["cells"], carry, normalize_obs(norm, obs))
        return carry, self._head(top)

    def seq_dist(self, norm: NormState, obs_seq):
        """(T, ..., obs_dim) sequence -> (mean, std) over the whole sequence
        via lax.scan (replaces the python time loop, actor.py:259-269)."""
        init = lstm_zero_carry(self.layers, obs_seq.shape[1:-1])

        def step(carry, obs_t):
            return lstm_step(self.params["cells"], carry, normalize_obs(norm, obs_t))

        _, tops = jax.lax.scan(step, init, obs_seq)
        return self._head(tops)


@struct.dataclass
class LSTMActor:
    """Deterministic tanh-bounded LSTM actor (reference LSTM_Actor,
    actor.py:74-139: LSTM stack + bounded output head, max_action scale).
    The recurrent DPG actor: an UNBOUNDED mean head here lets the
    deterministic-policy-gradient loss push actions beyond the clip range
    without limit (the round-4 RDPG critic-collapse root cause -- the
    collected actions rail at the clip while the learned mean diverges)."""
    params: Params
    max_action: float = struct.field(pytree_node=False, default=1.0)
    layers: Tuple[int, ...] = struct.field(pytree_node=False,
                                           default=(128, 128))

    @staticmethod
    def init(rng, obs_dim, action_dim, layers=(128, 128),
             max_action: float = 1.0) -> "LSTMActor":
        k_cells, k_out = jax.random.split(rng)
        params = {
            "cells": lstm_init(k_cells, obs_dim, layers),
            "out": _linear_init(k_out, layers[-1], action_dim),
        }
        return LSTMActor(params=params, max_action=max_action,
                         layers=tuple(layers))

    def _head(self, top_h):
        a = jnp.tanh(top_h @ self.params["out"]["w"]
                     + self.params["out"]["b"])
        return a * self.max_action

    def zero_carry(self, batch_shape=()):
        return lstm_zero_carry(self.layers, batch_shape)

    def step_act(self, norm: NormState, carry, obs):
        carry, top = lstm_step(self.params["cells"], carry,
                               normalize_obs(norm, obs))
        return carry, self._head(top)

    def seq_act(self, norm: NormState, obs_seq):
        init = lstm_zero_carry(self.layers, obs_seq.shape[1:-1])

        def step(carry, obs_t):
            return lstm_step(self.params["cells"], carry,
                             normalize_obs(norm, obs_t))

        _, tops = jax.lax.scan(step, init, obs_seq)
        return self._head(tops)


@struct.dataclass
class LSTMV:
    params: Params
    layers: Tuple[int, ...] = struct.field(pytree_node=False, default=(128, 128))

    @staticmethod
    def init(rng, obs_dim, layers=(128, 128)) -> "LSTMV":
        """Reference LSTM_V (critic.py:236-294)."""
        k_cells, k_out = jax.random.split(rng)
        return LSTMV(params={
            "cells": lstm_init(k_cells, obs_dim, layers),
            "out": _linear_init(k_out, layers[-1], 1),
        }, layers=tuple(layers))

    def zero_carry(self, batch_shape=()):
        return lstm_zero_carry(self.layers, batch_shape)

    def step_value(self, norm: NormState, carry, obs):
        carry, top = lstm_step(self.params["cells"], carry, normalize_obs(norm, obs))
        return carry, top @ self.params["out"]["w"] + self.params["out"]["b"]

    def seq_value(self, norm: NormState, obs_seq):
        init = lstm_zero_carry(self.layers, obs_seq.shape[1:-1])

        def step(carry, obs_t):
            return lstm_step(self.params["cells"], carry, normalize_obs(norm, obs_t))

        _, tops = jax.lax.scan(step, init, obs_seq)
        return tops @ self.params["out"]["w"] + self.params["out"]["b"]


@struct.dataclass
class LSTMQ:
    """Reference LSTM_Q (critic.py:170-234)."""
    params: Params
    layers: Tuple[int, ...] = struct.field(pytree_node=False, default=(128, 128))

    @staticmethod
    def init(rng, obs_dim, action_dim, layers=(128, 128)) -> "LSTMQ":
        k_cells, k_out = jax.random.split(rng)
        return LSTMQ(params={
            "cells": lstm_init(k_cells, obs_dim + action_dim, layers),
            "out": _linear_init(k_out, layers[-1], 1),
        }, layers=tuple(layers))

    def zero_carry(self, batch_shape=()):
        return lstm_zero_carry(self.layers, batch_shape)

    def step_q(self, norm: NormState, carry, obs, action):
        x = jnp.concatenate([normalize_obs(norm, obs), action], axis=-1)
        carry, top = lstm_step(self.params["cells"], carry, x)
        return carry, top @ self.params["out"]["w"] + self.params["out"]["b"]

    def seq_q(self, norm: NormState, obs_seq, action_seq):
        init = lstm_zero_carry(self.layers, obs_seq.shape[1:-1])
        xs = jnp.concatenate([normalize_obs(norm, obs_seq), action_seq], axis=-1)

        def step(carry, x_t):
            return lstm_step(self.params["cells"], carry, x_t)

        _, tops = jax.lax.scan(step, init, xs)
        return tops @ self.params["out"]["w"] + self.params["out"]["b"]
