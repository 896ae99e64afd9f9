"""Periodic-gait clock construction + clock-based reward functions.

Rebuilds reference cassie/phase_function.py:5-136 (create_phase_reward:
PCHIP splines over swing/stance segments, 3-cycle tiling) and
cassie/rewards/clock_rewards.py (clock_reward :6-110, early_clock_reward
:119-223, no_speed_clock_reward :225-..., max_vel_clock_reward) as pure JAX.

Because swing/stance durations are resampled per episode (cassie.py:545-559),
the spline *construction* must itself be jittable -- it runs inside the env
reset. A built clock is (x(24,), y(4,24), d(4,24), phaselen) carried in env
state; evaluation is a 24-knot Hermite lookup per step.

Channel order in y: [l_frc, l_vel, r_frc, r_vel].
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from apex_tpu.utils.pchip import pchip_derivatives, pchip_eval


@struct.dataclass
class GaitClock:
    x: jnp.ndarray        # (24,) knot positions (phase units)
    y: jnp.ndarray        # (4, 24) values [l_frc, l_vel, r_frc, r_vel]
    d: jnp.ndarray        # (4, 24) pchip derivatives
    phaselen: jnp.ndarray  # scalar

    def eval(self, phase):
        """(l_frc, l_vel, r_frc, r_vel) at a scalar phase."""
        v = pchip_eval(self.x, self.y, self.d, phase)
        return v[..., 0], v[..., 1], v[..., 2], v[..., 3]


# value tables: rows=[l_frc, l_vel, r_frc, r_vel], cols = 8 knots grouped as
# [right_swing x2, dbl_stance x2, left_swing x2, dbl_stance2 x2]
# (phase_function.py:26-97). The stance columns get filled per stance mode.
def _value_table(stance_mode_onehot, have_incentive: bool) -> jnp.ndarray:
    inc = 1.0 if have_incentive else 0.0
    # swing segments (right swing: penalize l_vel & r_frc; incentivize
    # l_frc & r_vel -- phase_function.py:26-32; left swing mirrored :65-71)
    base = np.zeros((4, 8))
    base[1, 0:2] = -1.0          # l_vel penalized during right swing
    base[2, 0:2] = -1.0          # r_frc penalized
    base[0, 0:2] = inc           # l_frc incentivized
    base[3, 0:2] = inc           # r_vel incentivized
    base[0, 4:6] = -1.0          # l_frc penalized during left swing
    base[3, 4:6] = -1.0          # r_vel penalized
    base[1, 4:6] = inc           # l_vel incentivized
    base[2, 4:6] = inc           # r_frc incentivized
    base = jnp.asarray(base)

    # stance-mode dependent double-stance columns (2,3) and (6,7)
    if have_incentive:
        grounded = jnp.asarray([1.0, -1.0, 1.0, -1.0])   # frc good, vel bad
        aerial = jnp.asarray([-1.0, 1.0, -1.0, 1.0])     # vel good, frc bad
    else:
        # faithful to the reference's assignment sequence for the
        # no-incentive grounded case (phase_function.py:54-55 overwrites
        # l_frc with -1 and leaves l_vel at 0 -- an upstream quirk kept for
        # parity): l_frc=-1, l_vel=0, r_frc=0, r_vel=-1
        grounded = jnp.asarray([-1.0, 0.0, 0.0, -1.0])
        aerial = jnp.asarray([-1.0, 0.0, -1.0, 0.0])
    zero = jnp.zeros(4)

    w = stance_mode_onehot  # [grounded, aerial, zero]
    stance_col = w[0] * grounded + w[1] * aerial + w[2] * zero
    for col in (2, 3, 6, 7):
        base = base.at[:, col].set(stance_col)
    return base


def build_clock(swing_duration, stance_duration, stance_mode_onehot,
                strict_relaxer: float = 0.1, have_incentive: bool = True,
                freq: float = 40.0) -> GaitClock:
    """JAX port of create_phase_reward (phase_function.py:5-136)."""
    sw = swing_duration * freq
    st = stance_duration * freq
    total = 2 * sw + 2 * st          # phaselen
    off_sw = sw * strict_relaxer     # swing relax offset
    off_st = st * strict_relaxer     # double-stance relax offset

    x8 = jnp.stack([
        0.0 + off_sw, sw - off_sw,                 # right swing
        sw + off_st, sw + st - off_st,             # first double stance
        sw + st + off_sw, 2 * sw + st - off_sw,    # left swing
        2 * sw + st + off_st, total - off_st,      # second double stance
    ])
    # 3-cycle tiling for continuity (phase_function.py:99-118):
    # prev = x - (x7 + off_st) = x - total; next = x + total
    x24 = jnp.concatenate([x8 - total, x8, x8 + total])

    y8 = _value_table(stance_mode_onehot, have_incentive)
    y24 = jnp.concatenate([y8, y8, y8], axis=-1)

    d24 = pchip_derivatives(x24, y24)
    return GaitClock(x=x24, y=y24, d=d24, phaselen=total)


def load_reward_clock(name: str, phaselen: float = 32.0,
                      speed_idx: int = None) -> GaitClock:
    """Load one of the reference's precomputed reward clocks
    (cassie/rewards/reward_clock_funcs/<name>.pkl, converted to dense
    tables by tools/gen_data_assets.py) as a GaitClock over the dense grid.

    speed_idx selects a speed for the aslip-style per-speed libraries."""
    import os

    import numpy as np

    path = os.path.join(os.path.dirname(__file__), "..", "data",
                        "reward_clocks.npz")
    f = np.load(path)
    lo, hi = float(f["__grid_lo"]), float(f["__grid_hi"])
    tab = f[name]
    if tab.ndim == 3:
        tab = tab[0 if speed_idx is None else speed_idx]
    x = jnp.asarray(np.linspace(lo, hi, tab.shape[-1]))
    y = jnp.asarray(tab)
    return GaitClock(x=x, y=y, d=pchip_derivatives(x, y),
                     phaselen=jnp.asarray(phaselen))


def speed_to_durations(speed):
    """Swing/stance durations from commanded speed (cassie.py:556-558)."""
    total_duration = (0.9 - 0.25 / 3.0 * jnp.abs(speed)) / 2.0
    swing = (0.30 + (0.40 / 3.0) * jnp.abs(speed)) * total_duration
    stance = (0.70 - (0.40 / 3.0) * jnp.abs(speed)) * total_duration
    return swing, stance


STANCE_GROUNDED = jnp.asarray([1.0, 0.0, 0.0])
STANCE_AERIAL = jnp.asarray([0.0, 1.0, 0.0])
STANCE_ZERO = jnp.asarray([0.0, 0.0, 1.0])


class RewardInputs(NamedTuple):
    """Accumulated per-policy-step quantities the clock rewards consume
    (tracked across the simrate substeps, cassie.py:396-443)."""
    qpos: jnp.ndarray            # (35,) post-step
    qvel: jnp.ndarray            # (32,)
    l_foot_frc: jnp.ndarray      # scalar, substep-mean z force
    r_foot_frc: jnp.ndarray
    l_foot_vel: jnp.ndarray      # (3,) last-substep foot velocity
    r_foot_vel: jnp.ndarray
    l_foot_orient_cost: jnp.ndarray   # substep-mean 1 - <neutral, quat>^2
    r_foot_orient_cost: jnp.ndarray
    pelvis_rot_vel: jnp.ndarray  # (3,)
    pelvis_accel: jnp.ndarray    # (3,)
    motor_torque: jnp.ndarray    # (10,)
    prev_torque: jnp.ndarray     # (10,)
    action: jnp.ndarray          # (10,)
    prev_action: jnp.ndarray     # (10,)
    speed: jnp.ndarray
    phase: jnp.ndarray
    # estimator (pelvis-frame) foot orientations, used by aslip_clock_reward
    # (clock_rewards.py:358-363); identity default for envs that skip them
    est_lfoot_orient: jnp.ndarray = np.array([1.0, 0.0, 0.0, 0.0])
    est_rfoot_orient: jnp.ndarray = np.array([1.0, 0.0, 0.0, 0.0])


def clock_reward(clock: GaitClock, ri: RewardInputs):
    """Reference clock_reward (clock_rewards.py:6-110)."""
    des_frc, des_vel = 250.0, 2.0
    n_l_frc = jnp.minimum(ri.l_foot_frc, des_frc) / des_frc
    n_r_frc = jnp.minimum(ri.r_foot_frc, des_frc) / des_frc
    n_l_vel = jnp.minimum(jnp.linalg.norm(ri.l_foot_vel), des_vel) / des_vel
    n_r_vel = jnp.minimum(jnp.linalg.norm(ri.r_foot_vel), des_vel) / des_vel

    com_orient_error = 10.0 * (1.0 - ri.qpos[3] ** 2)  # <(1,0,0,0), q>^2
    foot_orient_error = 10.0 * (ri.l_foot_orient_cost + ri.r_foot_orient_cost)
    com_vel_error = jnp.abs(ri.qvel[0] - ri.speed)

    straight_diff = jnp.abs(ri.qpos[1])
    straight_diff = jnp.where(straight_diff < 0.05, 0.0, straight_diff)
    height_diff = jnp.abs(ri.qpos[2] - 0.9)
    deadzone = 0.05 + 0.05 * ri.speed
    height_diff = jnp.where(height_diff < deadzone, 0.0, height_diff)
    pelvis_acc = 0.25 * (jnp.abs(ri.pelvis_rot_vel).sum()
                         + jnp.abs(ri.pelvis_accel).sum())
    pelvis_motion = straight_diff + height_diff + pelvis_acc

    l_frc_c, l_vel_c, r_frc_c, r_vel_c = clock.eval(ri.phase)
    quarter_pi = jnp.pi / 4.0
    frc_score = (jnp.tan(quarter_pi * l_frc_c * n_l_frc)
                 + jnp.tan(quarter_pi * r_frc_c * n_r_frc))
    vel_score = (jnp.tan(quarter_pi * l_vel_c * n_l_vel)
                 + jnp.tan(quarter_pi * r_vel_c * n_r_vel))

    # reference indexes qvel[6] and qvel[13] (clock_rewards.py:74) --
    # qvel[13] is the left shin in the true layout; kept for parity
    hip_roll_penalty = jnp.abs(ri.qvel[6]) + jnp.abs(ri.qvel[13])
    torque_penalty = 0.25 * jnp.abs(ri.prev_torque - ri.motor_torque).mean()
    action_penalty = 5.0 * jnp.abs(ri.prev_action - ri.action).mean()

    return (0.200 * frc_score
            + 0.200 * vel_score
            + 0.200 * jnp.exp(-(com_orient_error + foot_orient_error))
            + 0.150 * jnp.exp(-pelvis_motion)
            + 0.150 * jnp.exp(-com_vel_error)
            + 0.050 * jnp.exp(-hip_roll_penalty)
            + 0.025 * jnp.exp(-torque_penalty)
            + 0.025 * jnp.exp(-action_penalty))


def early_clock_reward(clock: GaitClock, ri: RewardInputs):
    """Reference early_clock_reward (clock_rewards.py:119-223): tanh scores,
    wider force/vel normalization, no pelvis-acc term."""
    des_frc, des_vel = 350.0, 3.0
    n_l_frc = jnp.minimum(ri.l_foot_frc, des_frc) / des_frc
    n_r_frc = jnp.minimum(ri.r_foot_frc, des_frc) / des_frc
    n_l_vel = jnp.minimum(jnp.linalg.norm(ri.l_foot_vel), des_vel) / des_vel
    n_r_vel = jnp.minimum(jnp.linalg.norm(ri.r_foot_vel), des_vel) / des_vel

    com_orient_error = 1.0 * (1.0 - ri.qpos[3] ** 2)
    foot_orient_error = 1.0 * (ri.l_foot_orient_cost + ri.r_foot_orient_cost)
    com_vel_error = jnp.abs(ri.speed - ri.qvel[0])

    straight_diff = jnp.abs(ri.qpos[1])
    straight_diff = jnp.where(straight_diff < 0.05, 0.0, straight_diff)
    height_diff = jnp.abs(ri.qpos[2] - 0.9)
    deadzone = 0.05 + 0.05 * ri.speed
    height_diff = jnp.where(height_diff < deadzone, 0.0, height_diff)
    pelvis_motion = straight_diff + height_diff

    l_frc_c, l_vel_c, r_frc_c, r_vel_c = clock.eval(ri.phase)
    frc_score = jnp.tanh(l_frc_c * n_l_frc) + jnp.tanh(r_frc_c * n_r_frc)
    vel_score = jnp.tanh(l_vel_c * n_l_vel) + jnp.tanh(r_vel_c * n_r_vel)

    return (0.250 * frc_score
            + 0.350 * vel_score
            + 0.200 * jnp.exp(-com_vel_error)
            + 0.100 * jnp.exp(-(com_orient_error + foot_orient_error))
            + 0.100 * jnp.exp(-pelvis_motion))


def no_speed_clock_reward(clock: GaitClock, ri: RewardInputs):
    """Reference no_speed_clock_reward (clock_rewards.py:225-333): tan-form
    clock scores, no speed-matching term; weights 0.25/0.25/0.225/0.175 +
    hip-roll/torque/action."""
    des_frc, des_vel = 250.0, 3.0
    n_l_frc = jnp.minimum(ri.l_foot_frc, des_frc) / des_frc
    n_r_frc = jnp.minimum(ri.r_foot_frc, des_frc) / des_frc
    n_l_vel = jnp.minimum(jnp.linalg.norm(ri.l_foot_vel), des_vel) / des_vel
    n_r_vel = jnp.minimum(jnp.linalg.norm(ri.r_foot_vel), des_vel) / des_vel

    com_orient_error = 10.0 * (1.0 - ri.qpos[3] ** 2)
    foot_orient_error = 10.0 * (ri.l_foot_orient_cost + ri.r_foot_orient_cost)

    straight_diff = jnp.abs(ri.qpos[1])
    straight_diff = jnp.where(straight_diff < 0.05, 0.0, straight_diff)
    height_diff = jnp.abs(ri.qpos[2] - 0.9)
    deadzone = 0.05 + 0.05 * ri.speed
    height_diff = jnp.where(height_diff < deadzone, 0.0, height_diff)
    pelvis_acc = 0.25 * (jnp.abs(ri.pelvis_rot_vel).sum()
                         + jnp.abs(ri.pelvis_accel).sum())
    pelvis_motion = straight_diff + height_diff + pelvis_acc

    l_frc_c, l_vel_c, r_frc_c, r_vel_c = clock.eval(ri.phase)
    quarter_pi = jnp.pi / 4.0
    frc_score = (jnp.tan(quarter_pi * l_frc_c * n_l_frc)
                 + jnp.tan(quarter_pi * r_frc_c * n_r_frc))
    vel_score = (jnp.tan(quarter_pi * l_vel_c * n_l_vel)
                 + jnp.tan(quarter_pi * r_vel_c * n_r_vel))

    hip_roll_penalty = jnp.abs(ri.qvel[6]) + jnp.abs(ri.qvel[13])
    torque_penalty = 0.25 * jnp.abs(ri.prev_torque - ri.motor_torque).mean()
    action_penalty = 5.0 * jnp.abs(ri.prev_action - ri.action).mean()

    return (0.250 * frc_score
            + 0.250 * vel_score
            + 0.225 * jnp.exp(-(com_orient_error + foot_orient_error))
            + 0.175 * jnp.exp(-pelvis_motion)
            + 0.050 * jnp.exp(-hip_roll_penalty)
            + 0.025 * jnp.exp(-torque_penalty)
            + 0.025 * jnp.exp(-action_penalty))


def max_vel_clock_reward(clock: GaitClock, ri: RewardInputs):
    """Reference max_vel_clock_reward (clock_rewards.py:418-...): rewards raw
    forward speed (qvel[0]/3) instead of speed matching; tanh clock scores
    with 400 N force normalization; 15x com-orient weight."""
    des_frc, des_vel = 400.0, 3.0
    n_l_frc = jnp.minimum(ri.l_foot_frc, des_frc) / des_frc
    n_r_frc = jnp.minimum(ri.r_foot_frc, des_frc) / des_frc
    n_l_vel = jnp.minimum(jnp.linalg.norm(ri.l_foot_vel), des_vel) / des_vel
    n_r_vel = jnp.minimum(jnp.linalg.norm(ri.r_foot_vel), des_vel) / des_vel

    com_orient_error = 15.0 * (1.0 - ri.qpos[3] ** 2)
    foot_orient_error = 10.0 * (ri.l_foot_orient_cost + ri.r_foot_orient_cost)
    com_vel_bonus = ri.qvel[0] / 3.0

    straight_diff = jnp.abs(ri.qpos[1])
    straight_diff = jnp.where(straight_diff < 0.05, 0.0, straight_diff)
    height_diff = jnp.abs(ri.qpos[2] - 1.0)
    height_diff = jnp.where(height_diff < 0.2, 0.0, height_diff)
    straight_diff = straight_diff + height_diff

    l_frc_c, l_vel_c, r_frc_c, r_vel_c = clock.eval(ri.phase)
    frc_score = jnp.tanh(l_frc_c * n_l_frc) + jnp.tanh(r_frc_c * n_r_frc)
    vel_score = jnp.tanh(l_vel_c * n_l_vel) + jnp.tanh(r_vel_c * n_r_vel)

    return (0.1 * jnp.exp(-com_orient_error)
            + 0.1 * jnp.exp(-foot_orient_error)
            + 0.1 * jnp.exp(-straight_diff)
            + 0.2 * frc_score
            + 0.2 * vel_score
            + 0.3 * com_vel_bonus)


def aslip_clock_reward(clock: GaitClock, ri: RewardInputs):
    """Reference aslip_clock_reward (clock_rewards.py:325-433): tanh scores
    with 400 N force normalization, 10x com-orient, foot-orient error from
    the ESTIMATOR foot quaternions vs identity (not the neutral world
    orient), height target 1.0 m with a 0.2 m deadzone."""
    des_frc, des_vel = 400.0, 3.0
    n_l_frc = jnp.minimum(ri.l_foot_frc, des_frc) / des_frc
    n_r_frc = jnp.minimum(ri.r_foot_frc, des_frc) / des_frc
    n_l_vel = jnp.minimum(jnp.linalg.norm(ri.l_foot_vel), des_vel) / des_vel
    n_r_vel = jnp.minimum(jnp.linalg.norm(ri.r_foot_vel), des_vel) / des_vel

    com_orient_error = 10.0 * (1.0 - ri.qpos[3] ** 2)
    foot_orient_error = 10.0 * ((1.0 - ri.est_lfoot_orient[0] ** 2)
                                + (1.0 - ri.est_rfoot_orient[0] ** 2))
    com_vel_error = jnp.abs(ri.qvel[0] - ri.speed)

    straight_diff = jnp.abs(ri.qpos[1])
    straight_diff = jnp.where(straight_diff < 0.05, 0.0, straight_diff)
    height_diff = jnp.abs(ri.qpos[2] - 1.0)
    height_diff = jnp.where(height_diff < 0.2, 0.0, height_diff)
    straight_diff = straight_diff + height_diff

    l_frc_c, l_vel_c, r_frc_c, r_vel_c = clock.eval(ri.phase)
    frc_score = jnp.tanh(l_frc_c * n_l_frc) + jnp.tanh(r_frc_c * n_r_frc)
    vel_score = jnp.tanh(l_vel_c * n_l_vel) + jnp.tanh(r_vel_c * n_r_vel)

    return (0.1 * jnp.exp(-com_orient_error)
            + 0.1 * jnp.exp(-foot_orient_error)
            + 0.2 * jnp.exp(-com_vel_error)
            + 0.1 * jnp.exp(-straight_diff)
            + 0.25 * frc_score
            + 0.25 * vel_score)


REWARD_FUNCS = {
    "clock": clock_reward,
    "early_clock": early_clock_reward,
    "no_speed_clock": no_speed_clock_reward,
    "max_vel_clock": max_vel_clock_reward,
    "aslip_clock": aslip_clock_reward,
}
