"""Parity tests for the extended speedmatch/side_speedmatch/standing reward
families: JAX implementations vs straight numpy oracles of the reference
formulas (test-only ports of cassie/rewards/speedmatch_rewards.py,
side_speedmatch_rewards.py, standing_rewards.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from apex_tpu.rewards.speedmatch import (
    SPEEDMATCH_FUNCS,
    SpeedmatchInputs,
    old_speed_footorient_reward,
    side_speedmatch_heuristic_reward,
    side_speedmatch_torquesmooth_reward,
    speedmatch_footheightvelflag_even_capzvel_reward,
    speedmatch_footheightvelflag_even_footorient_footdist_torquecost_smooth_reward,
    speedmatch_footorient_hiprollvelact_reward,
    step_even_pelheight_reward,
)


def _inputs(rng):
    qpos = rng.randn(35) * 0.1
    qpos[2] = 0.95
    qpos[3:7] = [0.99, 0.05, 0.05, 0.05]
    qpos[3:7] /= np.linalg.norm(qpos[3:7])
    return dict(
        qpos=qpos, qvel=rng.randn(32) * 0.5, speed=1.2, side_speed=0.1,
        l_foot_orient=0.21, r_foot_orient=0.13,
        l_foot_orient_cost=0.0105, r_foot_orient_cost=0.0065,
        hiproll_cost=0.3, hiproll_act=0.2, hipyaw_vel=0.4, hipyaw_act=0.1,
        l_foot_cost_even=0.5, r_foot_cost_even=0.7,
        l_foot_cost_smooth=0.35, r_foot_cost_smooth=0.45,
        torque_cost=0.6, smooth_cost=0.25,
        foot_pos=np.array([[0.1, 0.12, 0.05], [0.12, -0.02, 0.0]]),
        lfoot_vel=np.array([0.1, 0.0, 0.8]), rfoot_vel=np.array([0.0, 0.1, 0.2]),
        l_high=1.0, r_high=0.0, l_foot_frc=120.0, r_foot_frc=800.0,
        pelvis_accel=np.array([0.5, 0.2, 7.5]),
    )


def _si(d):
    return SpeedmatchInputs(
        qpos=jnp.asarray(d["qpos"]), qvel=jnp.asarray(d["qvel"]),
        speed=jnp.asarray(d["speed"]), orient_add=jnp.zeros(()),
        pelvis_orientation=jnp.asarray(d["qpos"][3:7]),
        l_foot_orient_cost=jnp.asarray(d["l_foot_orient_cost"]),
        r_foot_orient_cost=jnp.asarray(d["r_foot_orient_cost"]),
        hiproll_cost=jnp.asarray(d["hiproll_cost"]),
        hiproll_act=jnp.asarray(d["hiproll_act"]),
        hipyaw_vel=jnp.asarray(d["hipyaw_vel"]),
        hipyaw_act=jnp.asarray(d["hipyaw_act"]),
        l_foot_cost_smooth=jnp.asarray(d["l_foot_cost_smooth"]),
        r_foot_cost_smooth=jnp.asarray(d["r_foot_cost_smooth"]),
        side_speed=jnp.asarray(d["side_speed"]),
        l_foot_orient=jnp.asarray(d["l_foot_orient"]),
        r_foot_orient=jnp.asarray(d["r_foot_orient"]),
        l_foot_cost_even=jnp.asarray(d["l_foot_cost_even"]),
        r_foot_cost_even=jnp.asarray(d["r_foot_cost_even"]),
        torque_cost=jnp.asarray(d["torque_cost"]),
        smooth_cost=jnp.asarray(d["smooth_cost"]),
        foot_pos=jnp.asarray(d["foot_pos"]),
        lfoot_vel=jnp.asarray(d["lfoot_vel"]),
        rfoot_vel=jnp.asarray(d["rfoot_vel"]),
        l_high=jnp.asarray(d["l_high"]), r_high=jnp.asarray(d["r_high"]),
        l_foot_frc=jnp.asarray(d["l_foot_frc"]),
        r_foot_frc=jnp.asarray(d["r_foot_frc"]),
        pelvis_accel=jnp.asarray(d["pelvis_accel"]))


def _base_terms_oracle(d):
    """speedmatch_rewards.py:107-125 preamble."""
    forward_diff = abs(d["qvel"][0] - d["speed"])
    if forward_diff < 0.05:
        forward_diff = 0
    orient_diff = 1 - d["qpos"][3] ** 2
    if orient_diff < 5e-3:
        orient_diff = 0
    else:
        orient_diff *= 30
    y_vel = abs(d["qvel"][1])
    if y_vel < 0.05:
        y_vel = 0
    straight_diff = abs(d["qpos"][1])
    if straight_diff < 0.05:
        straight_diff = 0
    return forward_diff, orient_diff, straight_diff, y_vel


def test_footorient_hiprollvelact_oracle():
    d = _inputs(np.random.RandomState(0))
    f, o, s, y = _base_terms_oracle(d)
    want = (0.3 * np.exp(-f) + 0.2 * np.exp(-o) + 0.1 * np.exp(-s)
            + 0.1 * np.exp(-y)
            + 0.075 * np.exp(-d["l_foot_orient"])
            + 0.075 * np.exp(-d["r_foot_orient"])
            + 0.1 * np.exp(-d["hiproll_cost"])
            + 0.05 * np.exp(-d["hiproll_act"]))
    got = float(speedmatch_footorient_hiprollvelact_reward(_si(d)))
    assert np.isclose(got, want, atol=1e-5)


def test_old_speed_footorient_oracle():
    d = _inputs(np.random.RandomState(1))
    diff = abs(d["qvel"][0] - d["speed"])
    if diff < 0.05:
        diff = 0
    orient_diff = np.linalg.norm(d["qpos"][3:7] - np.array([1, 0, 0, 0]))
    y_vel = abs(d["qvel"][1])
    if y_vel < 0.03:
        y_vel = 0
    straight = abs(d["qpos"][1])
    if straight < 0.05:
        straight = 0
    want = (0.4 * np.exp(-diff) + 0.1 * np.exp(-orient_diff)
            + 0.1 * np.exp(-y_vel) + 0.2 * np.exp(-straight)
            + 0.1 * np.exp(-d["l_foot_orient"])
            + 0.1 * np.exp(-d["r_foot_orient"]))
    got = float(old_speed_footorient_reward(_si(d)))
    assert np.isclose(got, want, atol=1e-5)


def test_even_footdist_torquecost_smooth_oracle():
    d = _inputs(np.random.RandomState(2))
    f, o, s, y = _base_terms_oracle(d)
    foot_dist = np.linalg.norm(d["foot_pos"][0, 0:2] - d["foot_pos"][1, 0:2])
    foot_penalty = -0.2 if foot_dist < 0.15 else 0
    want = (0.2 * np.exp(-f) + 0.05 * np.exp(-o) + 0.05 * np.exp(-s)
            + 0.05 * np.exp(-y)
            + 0.15 * np.exp(-d["l_foot_cost_even"])
            + 0.15 * np.exp(-d["r_foot_cost_even"])
            + 0.075 * np.exp(-d["l_foot_orient"])
            + 0.075 * np.exp(-d["r_foot_orient"])
            + 0.1 * np.exp(-d["torque_cost"])
            + 0.1 * np.exp(-d["smooth_cost"]) + foot_penalty)
    got = float(
        speedmatch_footheightvelflag_even_footorient_footdist_torquecost_smooth_reward(
            _si(d)))
    assert np.isclose(got, want, atol=1e-5)


def test_capzvel_penalty_oracle():
    d = _inputs(np.random.RandomState(3))
    f, o, s, y = _base_terms_oracle(d)
    l_pen = -0.4 if (d["l_high"] and abs(d["lfoot_vel"][2]) > 0.6) else 0
    r_pen = -0.4 if (d["r_high"] and abs(d["rfoot_vel"][2]) > 0.6) else 0
    want = (0.3 * np.exp(-f) + 0.2 * np.exp(-o) + 0.1 * np.exp(-s)
            + 0.1 * np.exp(-y)
            + 0.15 * np.exp(-d["l_foot_cost_even"])
            + 0.15 * np.exp(-d["r_foot_cost_even"]) + l_pen + r_pen)
    got = float(speedmatch_footheightvelflag_even_capzvel_reward(_si(d)))
    assert l_pen == -0.4  # the fixture exercises the penalty branch
    assert np.isclose(got, want, atol=1e-5)


def test_side_speedmatch_torquesmooth_oracle():
    d = _inputs(np.random.RandomState(4))
    f = abs(d["qvel"][0] - d["speed"])
    if f < 0.05:
        f = 0
    o = np.linalg.norm(d["qpos"][3:7] - np.array([1, 0, 0, 0]))
    s = abs(d["qvel"][1] - d["side_speed"])
    if s < 0.05:
        s = 0
    want = (0.25 * np.exp(-f) + 0.25 * np.exp(-s) + 0.2 * np.exp(-o)
            + 0.1 * np.exp(-d["torque_cost"])
            + 0.2 * np.exp(-d["smooth_cost"]))
    got = float(side_speedmatch_torquesmooth_reward(_si(d)))
    assert np.isclose(got, want, atol=1e-5)


def test_side_speedmatch_heuristic_oracle():
    d = _inputs(np.random.RandomState(5))
    f = abs(d["qvel"][0] - d["speed"])
    if f < 0.05:
        f = 0
    o = np.linalg.norm(d["qpos"][3:7] - np.array([1, 0, 0, 0]))
    s = abs(d["qvel"][1] - d["side_speed"])
    if s < 0.05:
        s = 0
    foot_dist = np.linalg.norm(d["foot_pos"][0, 0:2] - d["foot_pos"][1, 0:2])
    foot_penalty = 0.2 if foot_dist < 0.22 else 0
    lforce = max((d["l_foot_frc"] - 700) / 1000, 0)
    rforce = max((d["r_foot_frc"] - 700) / 1000, 0)
    pelaccel = abs(d["pelvis_accel"][2])
    pelaccel_penalty = (pelaccel - 6) / 30 if pelaccel > 6 else 0
    l_slow = (np.linalg.norm(d["lfoot_vel"]) < 0.05
              and d["foot_pos"][0, 2] < 0.2 and d["l_foot_frc"] == 0)
    r_slow = (np.linalg.norm(d["rfoot_vel"]) < 0.05
              and d["foot_pos"][1, 2] < 0.2 and d["r_foot_frc"] == 0)
    footheight_penalty = 0.2 if (l_slow or r_slow) else 0
    want = (0.25 * np.exp(-f) + 0.25 * np.exp(-s) + 0.1 * np.exp(-o)
            + 0.1 * np.exp(-d["torque_cost"]) + 0.1 * np.exp(-d["smooth_cost"])
            + 0.1 * np.exp(-d["l_foot_orient_cost"])
            + 0.1 * np.exp(-d["r_foot_orient_cost"])
            - pelaccel_penalty - foot_penalty - lforce - rforce
            - footheight_penalty)
    got = float(side_speedmatch_heuristic_reward(_si(d)))
    assert rforce > 0 and pelaccel_penalty > 0  # fixture hits penalties
    assert np.isclose(got, want, atol=1e-5)


def test_step_even_pelheight_oracle():
    d = _inputs(np.random.RandomState(6))
    com_height = 0 if d["qpos"][2] > 0.8 else (0.9 - d["qpos"][2]) ** 2
    want = (0.2 * np.exp(-com_height)
            + 0.4 * np.exp(-d["l_foot_cost_even"])
            + 0.4 * np.exp(-d["r_foot_cost_even"]))
    got = float(step_even_pelheight_reward(_si(d)))
    assert np.isclose(got, want, atol=1e-5)


def test_registry_covers_reference_surface():
    """Every live reference speedmatch/side/standing function is
    registered under its exact reference name."""
    names = [
        "speedmatch_reward", "speedmatch_footorient_hiprollvelact_reward",
        "old_speed_reward", "old_speed_footorient_reward",
        "speedmatch_footheightvelflag_reward",
        "speedmatch_footheightvelflag_even_reward",
        "speedmatch_footheightsmooth_footorient_reward",
        "speedmatch_footheightsmooth_footorient_hiproll_torquecost_reward",
        "speedmatch_footheightsmooth_footorient_hiproll_reward",
        "speedmatch_footheightsmooth_footorient_hiprollvelact_reward",
        "speedmatch_footheightsmooth_footorient_hiprollyawvelact_reward",
        "speedmatch_footheightsmooth_footorient_hiprollyawphasetorque_reward",
        "speedmatch_footvarclock_footorient_hiprollyawvelact_reward",
        "speedmatch_footheightsmooth_footorient_stablepel_reward",
        "speedmatch_footheightsmooth_footorient_hiprollvelact_orientchange_reward",
        "speedmatch_footclock_footorient_reward",
        "speedmatch_footheightvelflag_even_footorient_reward",
        "speedmatch_footheightvelflag_even_footorient_footdist_reward",
        "speedmatch_footheightvelflag_even_footorient_footdist_torquecost_reward",
        "speedmatch_footheightvelflag_even_footorient_footdist_torquecost_smooth_reward",
        "speedmatch_footheightvelflag_even_footorient_smooth_reward",
        "speedmatch_footheightvelflag_even_capzvel_reward",
        "speedmatch_footorient_reward",
        "speedmatch_footorient_joint_smooth_reward",
        "speedmatch_footorient_footheightvel_smooth_reward",
        "speedmatch_heuristic_reward",
        "side_speedmatch_reward", "side_speedmatch_torquesmooth_reward",
        "side_speedmatch_foottraj_reward", "side_speedmatch_heightvel_reward",
        "side_speedmatch_heuristic_reward",
        "stand_reward", "step_even_reward", "step_even_pelheight_reward",
        "step_smooth_pelheight_reward",
    ]
    for n in names:
        assert n in SPEEDMATCH_FUNCS, n


def test_all_registered_funcs_jit_clean():
    """Every registered function compiles and returns a finite scalar."""
    d = _inputs(np.random.RandomState(7))
    si = _si(d)
    seen = set()
    for name, fn in SPEEDMATCH_FUNCS.items():
        if id(fn) in seen:
            continue
        seen.add(id(fn))
        val = jax.jit(fn)(si)
        assert np.isfinite(float(val)), name


def test_env_tracks_extended_costs():
    """CassieEnv populates the gated/even/var/torque costs: run a few steps
    and check the reward differs across reward functions that share the
    preamble (i.e. the extra terms are nonzero)."""
    from apex_tpu.envs.cassie import CassieEnv

    rng = jax.random.PRNGKey(0)
    rewards = {}
    for rew in ("speedmatch_footheightvelflag_even_reward",
                "speedmatch_footheightvelflag_reward",
                "speedmatch_footvarclock_footorient_hiprollyawvelact_reward"):
        env = CassieEnv(reward=rew, dynamics_randomization=False)
        st, _ = jax.jit(env.reset)(rng)
        step = jax.jit(env.step)
        for i in range(3):
            st, _, r, d, _ = step(st, jnp.zeros(env.action_size),
                                  jax.random.fold_in(rng, i))
        rewards[rew] = float(r)
        assert np.isfinite(rewards[rew])
    vals = list(rewards.values())
    assert len(set(np.round(vals, 6))) > 1
