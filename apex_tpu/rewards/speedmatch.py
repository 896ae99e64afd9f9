"""Speed-matching reward family.

Rebuilds the actively-used members of reference
cassie/rewards/speedmatch_rewards.py (26 variants of the same term algebra):
  * old_speed_reward (:64-80) -- registered as "5k_speed_reward", the reward
    of the reference's flagship trained artifact
    (trained_models/5k_retrain/experiment.info)
  * speedmatch_reward (:4-35)
  * speedmatch_footorient_hiprollvelact_reward (:37-62)
  * speedmatch_footheightsmooth_footorient_hiprollyawvelact_reward
    (:275-303), which consumes the smooth foot-height clock costs
    accumulated per substep (reference cassie_mininput_env.py:418-504).

All operate on SpeedmatchInputs, the superset of per-step quantities the
env layer tracks.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SpeedmatchInputs(NamedTuple):
    qpos: jnp.ndarray
    qvel: jnp.ndarray
    speed: jnp.ndarray
    orient_add: jnp.ndarray
    pelvis_orientation: jnp.ndarray
    l_foot_orient_cost: jnp.ndarray   # substep-mean 1 - <neutral, q>^2
    r_foot_orient_cost: jnp.ndarray
    hiproll_cost: jnp.ndarray         # substep-mean (|qvel6|+|qvel19|)/3
    hiproll_act: jnp.ndarray
    hipyaw_vel: jnp.ndarray           # substep-mean |qvel7|+|qvel20|
    hipyaw_act: jnp.ndarray
    l_foot_cost_smooth: jnp.ndarray   # substep-mean smooth height clock cost
    r_foot_cost_smooth: jnp.ndarray


def _deadzone(x, lo):
    return jnp.where(x < lo, 0.0, x)


def old_speed_reward(ri: SpeedmatchInputs):
    """aka 5k_speed_reward (speedmatch_rewards.py:64-80)."""
    diff = _deadzone(jnp.abs(ri.qvel[0] - ri.speed), 0.05)
    orient_diff = jnp.linalg.norm(
        ri.qpos[3:7] - jnp.array([1.0, 0, 0, 0]))
    y_vel = _deadzone(jnp.abs(ri.qvel[1]), 0.03)
    straight_diff = _deadzone(jnp.abs(ri.qpos[1]), 0.05)
    return (0.5 * jnp.exp(-diff) + 0.15 * jnp.exp(-orient_diff)
            + 0.1 * jnp.exp(-y_vel) + 0.25 * jnp.exp(-straight_diff))


def _base_terms(ri: SpeedmatchInputs):
    """Shared forward/orient/straight/yvel terms (speedmatch_rewards.py:4-35
    with the orientation command active, orient_time=0)."""
    forward_diff = _deadzone(jnp.abs(ri.qvel[0] - ri.speed), 0.05)
    orient_diff = 1.0 - ri.qpos[3] ** 2   # 1 - <(1,0,0,0), q>^2
    orient_diff = jnp.where(orient_diff < 5e-3, 0.0, 30.0 * orient_diff)
    y_vel = _deadzone(jnp.abs(ri.qvel[1]), 0.05)
    straight_diff = _deadzone(8.0 * jnp.abs(ri.qpos[1]), 8.0 * 0.05)
    return forward_diff, orient_diff, straight_diff, y_vel


def speedmatch_reward(ri: SpeedmatchInputs):
    f, o, s, y = _base_terms(ri)
    return (0.5 * jnp.exp(-f) + 0.2 * jnp.exp(-o)
            + 0.15 * jnp.exp(-s) + 0.15 * jnp.exp(-y))


def speedmatch_footorient_hiprollvelact_reward(ri: SpeedmatchInputs):
    """speedmatch_rewards.py:37-62."""
    f, o, s, y = _base_terms(ri)
    return (0.3 * jnp.exp(-f) + 0.2 * jnp.exp(-o)
            + 0.1 * jnp.exp(-s) + 0.1 * jnp.exp(-y)
            + 0.1 * jnp.exp(-(ri.l_foot_orient_cost + ri.r_foot_orient_cost))
            + 0.1 * jnp.exp(-ri.hiproll_cost)
            + 0.1 * jnp.exp(-ri.hiproll_act))


def speedmatch_footheightsmooth_footorient_hiprollyawvelact_reward(
        ri: SpeedmatchInputs):
    """speedmatch_rewards.py:275-303."""
    f, o, s, y = _base_terms(ri)
    return (0.2 * jnp.exp(-f) + 0.1 * jnp.exp(-o)
            + 0.05 * jnp.exp(-s) + 0.05 * jnp.exp(-y)
            + 0.15 * jnp.exp(-ri.l_foot_cost_smooth)
            + 0.15 * jnp.exp(-ri.r_foot_cost_smooth)
            + 0.05 * jnp.exp(-ri.l_foot_orient_cost)
            + 0.05 * jnp.exp(-ri.r_foot_orient_cost)
            + 0.05 * jnp.exp(-ri.hiproll_cost)
            + 0.05 * jnp.exp(-ri.hiproll_act)
            + 0.05 * jnp.exp(-ri.hipyaw_vel)
            + 0.05 * jnp.exp(-ri.hipyaw_act))


SPEEDMATCH_FUNCS = {
    "5k_speed_reward": old_speed_reward,
    "old_speed_reward": old_speed_reward,
    "speedmatch": speedmatch_reward,
    "speedmatch_footorient_hiprollvelact": speedmatch_footorient_hiprollvelact_reward,
    "speedmatch_footheightsmooth_footorient_hiprollyawvelact":
        speedmatch_footheightsmooth_footorient_hiprollyawvelact_reward,
}
