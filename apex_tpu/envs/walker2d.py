"""Walker2d environment (benchmark anchor, BASELINE.md: "reference PPO+GAE
on Walker2d-v2").

Classic gym semantics: obs = [qpos[1:], clip(qvel, +-10)] (17-dim), reward =
forward velocity + alive bonus - 1e-3 |a|^2, terminate when torso height
leaves [0.8, 2.0] or |pitch| > 1. Planar dynamics run on the same
generalized-coordinate engine as Cassie, frame_skip=4 at dt=0.002.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from apex_tpu.envs.base import Env
from apex_tpu.physics.engine import PhysParams, step
from apex_tpu.physics.models.walker2d import make_model

_MODEL = None


def walker_model():
    global _MODEL
    if _MODEL is None:
        _MODEL = make_model()
    return _MODEL


@struct.dataclass
class WalkerState:
    qpos: jnp.ndarray
    qvel: jnp.ndarray


@dataclasses.dataclass
class Walker2dEnv(Env):
    frame_skip: int = 4
    ctrl_cost: float = 1e-3
    alive_bonus: float = 1.0
    reset_noise: float = 5e-3

    observation_size = 17
    action_size = 6
    # mirror: swap left/right legs (obs layout: [z, pitch, 3 left joints,
    # 3 right joints, vx, vz, vpitch, 3 left jvel, 3 right jvel])
    mirrored_obs = [0.1, 1, 5, 6, 7, 2, 3, 4, 8, 9, 10, 14, 15, 16, 11, 12, 13]
    mirrored_acts = [3, 4, 5, 0.1, 1, 2]
    clock_inds = None

    def __post_init__(self):
        self.model = walker_model()
        self.params = PhysParams.from_model(self.model)

    def _obs(self, qpos, qvel):
        return jnp.concatenate([qpos[1:], jnp.clip(qvel, -10.0, 10.0)])

    def reset(self, rng):
        m = self.model
        k1, k2 = jax.random.split(rng)
        qpos = jnp.asarray(m.qpos0) + self.reset_noise * jax.random.uniform(
            k1, (m.nq,), minval=-1.0, maxval=1.0)
        qvel = self.reset_noise * jax.random.uniform(
            k2, (m.nv,), minval=-1.0, maxval=1.0)
        state = WalkerState(qpos=qpos, qvel=qvel)
        return state, self._obs(qpos, qvel)

    def step(self, state, action, rng):
        m = self.model
        x_before = state.qpos[0]

        def substep(carry, _):
            qp, qv = carry
            out = step(m, self.params, qp, qv, action)
            return (out.qpos, out.qvel), None

        (qpos, qvel), _ = jax.lax.scan(
            substep, (state.qpos, state.qvel), None, length=self.frame_skip)

        dt = m.timestep * self.frame_skip
        forward_vel = (qpos[0] - x_before) / dt
        reward = (forward_vel + self.alive_bonus
                  - self.ctrl_cost * jnp.sum(jnp.square(action)))
        # a single non-finite reward in the replay ring would poison every
        # critic update that ever samples it
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)
        height, pitch = qpos[1], qpos[2]
        # non-finite guard: NaN evades the range checks (NaN comparisons
        # are False), so a blown-up env would never auto-reset and would
        # poison the fleet forever
        bad = jnp.logical_not(jnp.isfinite(qpos).all()
                              & jnp.isfinite(qvel).all())
        terminated = ((height < 0.8) | (height > 2.0)
                      | (jnp.abs(pitch) > 1.0) | bad)
        new_state = WalkerState(qpos=qpos, qvel=qvel)
        return new_state, self._obs(qpos, qvel), reward, terminated, {}
