"""Reward-function parity: JAX rewards vs straight numpy oracles of the
reference formulas (test-only ports, reference clock_rewards.py:6-110)."""
import numpy as np
import jax.numpy as jnp
import pytest

from apex_tpu.rewards.clock import (
    GaitClock,
    RewardInputs,
    STANCE_GROUNDED,
    build_clock,
    clock_reward,
)


def _oracle_clock_reward(clock_fns, ri):
    """Numpy port of reference clock_reward (clock_rewards.py:6-110)."""
    l_frc_c, l_vel_c, r_frc_c, r_vel_c = clock_fns(ri["phase"])
    n_l_frc = min(ri["l_foot_frc"], 250) / 250
    n_r_frc = min(ri["r_foot_frc"], 250) / 250
    n_l_vel = min(np.linalg.norm(ri["l_foot_vel"]), 2.0) / 2.0
    n_r_vel = min(np.linalg.norm(ri["r_foot_vel"]), 2.0) / 2.0

    com_orient = 10 * (1 - ri["qpos"][3] ** 2)
    foot_orient = 10 * (ri["l_orient"] + ri["r_orient"])
    com_vel_error = abs(ri["qvel"][0] - ri["speed"])
    straight = abs(ri["qpos"][1])
    if straight < 0.05:
        straight = 0
    height = abs(ri["qpos"][2] - 0.9)
    if height < 0.05 + 0.05 * ri["speed"]:
        height = 0
    pelvis_acc = 0.25 * (np.abs(ri["rot_vel"]).sum()
                         + np.abs(ri["accel"]).sum())
    pelvis_motion = straight + height + pelvis_acc

    q = np.pi / 4
    frc_score = np.tan(q * l_frc_c * n_l_frc) + np.tan(q * r_frc_c * n_r_frc)
    vel_score = np.tan(q * l_vel_c * n_l_vel) + np.tan(q * r_vel_c * n_r_vel)

    hip_roll = abs(ri["qvel"][6]) + abs(ri["qvel"][13])
    torque_pen = 0.25 * np.abs(ri["prev_torque"] - ri["torque"]).mean()
    action_pen = 5 * np.abs(ri["prev_action"] - ri["action"]).mean()

    return (0.2 * frc_score + 0.2 * vel_score
            + 0.2 * np.exp(-(com_orient + foot_orient))
            + 0.15 * np.exp(-pelvis_motion)
            + 0.15 * np.exp(-com_vel_error)
            + 0.05 * np.exp(-hip_roll)
            + 0.025 * np.exp(-torque_pen)
            + 0.025 * np.exp(-action_pen))


def test_clock_reward_matches_oracle():
    rng = np.random.RandomState(0)
    clock = build_clock(jnp.asarray(0.25), jnp.asarray(0.15),
                        STANCE_GROUNDED, 0.1, True, 40.0)

    def clock_fns(phase):
        return [float(x) for x in clock.eval(jnp.asarray(phase))]

    for trial in range(5):
        qpos = rng.randn(35) * 0.2
        qpos[2] = 0.9 + 0.1 * rng.randn()
        qpos[3] = 1.0 - 0.05 * rng.rand()
        d = {
            "qpos": qpos, "qvel": rng.randn(32),
            "l_foot_frc": float(rng.rand() * 400),
            "r_foot_frc": float(rng.rand() * 400),
            "l_foot_vel": rng.randn(3), "r_foot_vel": rng.randn(3),
            "l_orient": float(rng.rand() * 0.01),
            "r_orient": float(rng.rand() * 0.01),
            "rot_vel": rng.randn(3) * 0.3, "accel": rng.randn(3) * 0.5,
            "torque": rng.randn(10) * 5, "prev_torque": rng.randn(10) * 5,
            "action": rng.randn(10) * 0.1, "prev_action": rng.randn(10) * 0.1,
            "speed": float(rng.rand() * 2),
            "phase": float(rng.rand() * float(clock.phaselen)),
        }
        ri = RewardInputs(
            qpos=jnp.asarray(d["qpos"]), qvel=jnp.asarray(d["qvel"]),
            l_foot_frc=jnp.asarray(d["l_foot_frc"]),
            r_foot_frc=jnp.asarray(d["r_foot_frc"]),
            l_foot_vel=jnp.asarray(d["l_foot_vel"]),
            r_foot_vel=jnp.asarray(d["r_foot_vel"]),
            l_foot_orient_cost=jnp.asarray(d["l_orient"]),
            r_foot_orient_cost=jnp.asarray(d["r_orient"]),
            pelvis_rot_vel=jnp.asarray(d["rot_vel"]),
            pelvis_accel=jnp.asarray(d["accel"]),
            motor_torque=jnp.asarray(d["torque"]),
            prev_torque=jnp.asarray(d["prev_torque"]),
            action=jnp.asarray(d["action"]),
            prev_action=jnp.asarray(d["prev_action"]),
            speed=jnp.asarray(d["speed"]), phase=jnp.asarray(d["phase"]))
        got = float(clock_reward(clock, ri))
        want = _oracle_clock_reward(clock_fns, d)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
