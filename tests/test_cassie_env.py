"""CassieEnv behavior tests (CPU; heavier compiles cached in /tmp/jax_cache)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apex_tpu.envs.cassie import (
    CassieEnv,
    MIRROR_ACTS,
    MIRROR_OBS_FULL,
    MIRROR_OBS_MIN,
)
from apex_tpu.envs.base import mirror_matrix


@pytest.fixture(scope="module")
def env():
    return CassieEnv(dynamics_randomization=True, reward="early_clock")


@pytest.fixture(scope="module")
def reset_state(env):
    return jax.jit(env.reset)(jax.random.PRNGKey(0))


def test_obs_sizes_match_reference():
    """set_up_state_space (cassie.py:234-278): full+clock=50, min+clock=25,
    full+phase=55."""
    assert CassieEnv(input_profile="full",
                     command_profile="clock").observation_size == 50
    assert CassieEnv(input_profile="min",
                     command_profile="clock").observation_size == 25
    assert CassieEnv(input_profile="full",
                     command_profile="phase").observation_size == 55
    assert CassieEnv(learn_gains=True).action_size == 30


def test_mirror_tables_are_involutions():
    for lst in (MIRROR_OBS_FULL, MIRROR_OBS_MIN, MIRROR_ACTS):
        M = mirror_matrix(lst)
        np.testing.assert_allclose(M @ M, np.eye(len(lst)), atol=1e-6)


def test_reset_shapes_and_standing_pose(env, reset_state):
    state, obs = reset_state
    assert obs.shape == (env.observation_size,)
    assert np.isfinite(np.asarray(obs)).all()
    # standing pose: pelvis at ~1.01 m (cassie_sim set_const)
    np.testing.assert_allclose(float(state.phys.qpos[2]), 1.01, atol=1e-6)
    # speed within command range
    assert -0.3 - 1e-6 <= float(state.speed) <= 4.0 + 1e-6
    # clock built: phaselen ~ total_duration * 40 in [20, 40]
    assert 10 < float(state.clock.phaselen) < 60


def test_reset_deterministic_same_key(env):
    s1, o1 = jax.jit(env.reset)(jax.random.PRNGKey(3))
    s2, o2 = jax.jit(env.reset)(jax.random.PRNGKey(3))
    np.testing.assert_allclose(o1, o2)
    np.testing.assert_allclose(s1.speed, s2.speed)


def test_step_advances_and_rewards_finite(env, reset_state):
    state, obs = reset_state
    step = jax.jit(env.step)
    action = jnp.zeros(10)
    total_r = 0.0
    for i in range(3):
        state, obs, reward, terminated, info = step(
            state, action, jax.random.PRNGKey(i))
        assert obs.shape == (env.observation_size,)
        assert np.isfinite(float(reward)), f"reward not finite at step {i}"
        assert np.isfinite(np.asarray(obs)).all()
        total_r += float(reward)
    # time advanced, phase advanced
    assert int(state.time) == 3
    # robot should not have fallen through the floor or exploded
    assert 0.3 < float(state.phys.qpos[2]) < 1.5
    # holding neutral targets from standing: reward should be decent
    assert total_r > -3.0


def test_dyn_randomization_changes_params(env):
    s1, _ = jax.jit(env.reset)(jax.random.PRNGKey(1))
    s2, _ = jax.jit(env.reset)(jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(s1.params.body_mass),
                           np.asarray(s2.params.body_mass))
    assert not np.allclose(np.asarray(s1.params.dof_damping),
                           np.asarray(s2.params.dof_damping))
    # pelvis dofs keep default damping (cassie.py:571-577)
    np.testing.assert_allclose(np.asarray(s1.params.dof_damping[:6]),
                               np.asarray(s2.params.dof_damping[:6]))


def test_no_dyn_randomization_keeps_defaults():
    env = CassieEnv(dynamics_randomization=False, reward="early_clock")
    s, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    from apex_tpu.physics.engine import PhysParams

    default = PhysParams.from_model(env.model)
    np.testing.assert_allclose(np.asarray(s.params.body_mass),
                               np.asarray(default.body_mass))
    np.testing.assert_allclose(np.asarray(s.motor_enc_noise), np.zeros(10))


def test_history_stacking():
    """history=N stacks N+1 frames (reference cassie.py:51-55, 856-859)."""
    env = CassieEnv(dynamics_randomization=False, reward="early_clock",
                    history=2)
    assert env.observation_size == 50 * 3
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (150,)
    s1, o1, _, _, _ = jax.jit(env.step)(state, jnp.zeros(10),
                                        jax.random.PRNGKey(1))
    # newest frame first: after one step, frame[1] == previous frame[0]
    np.testing.assert_allclose(np.asarray(o1[50:100]),
                               np.asarray(obs[0:50]), rtol=1e-6)


def test_omniscient_appends_params():
    env = CassieEnv(omniscient=True, dynamics_randomization=True,
                    reward="early_clock")
    assert env.observation_size == 50 + 58
    s, o = jax.jit(env.reset)(jax.random.PRNGKey(0))
    # the appended block contains the randomized dynamics parameters
    np.testing.assert_allclose(np.asarray(o[50:82]),
                               np.asarray(s.params.dof_damping), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(o[82:107]),
                               np.asarray(s.params.body_mass), rtol=1e-6)


def test_firmware_estimator_lags_velocities():
    """estimator="firmware" (VERDICT round-2 #6): the velocity observation
    channels must report an EMA-lagged stream (smaller magnitude during a
    transient than the exact state), physics itself unchanged."""
    kw = dict(dynamics_randomization=False, reward="early_clock")
    e_exact = CassieEnv(estimator="exact", **kw)
    e_fw = CassieEnv(estimator="firmware", **kw)
    s0, _ = jax.jit(e_exact.reset)(jax.random.PRNGKey(0))
    a = jnp.zeros(10)
    k = jax.random.PRNGKey(1)
    s1, o1, r1, _, _ = jax.jit(e_exact.step)(s0, a, k)
    s2, o2, r2, _, _ = jax.jit(e_fw.step)(s0, a, k)
    # identical physics: same qpos trajectory and same reward
    np.testing.assert_allclose(np.asarray(s1.phys.qpos),
                               np.asarray(s2.phys.qpos), rtol=1e-6)
    np.testing.assert_allclose(float(r1), float(r2), rtol=1e-5)
    # lagged velocity: pelvis z-velocity obs (index 17 of the full profile:
    # 1 height + 4 orient + 10 motor_pos + tvel[2]) shrinks toward zero
    # during the initial settling transient
    assert abs(float(o2[17])) < abs(float(o1[17]))


def test_firmware_estimator_noise_is_stochastic():
    e = CassieEnv(dynamics_randomization=False, reward="early_clock",
                  estimator="firmware", estimator_noise=0.05)
    s0, _ = jax.jit(e.reset)(jax.random.PRNGKey(0))
    a = jnp.zeros(10)
    _, o1, _, _, _ = jax.jit(e.step)(s0, a, jax.random.PRNGKey(1))
    _, o2, _, _, _ = jax.jit(e.step)(s0, a, jax.random.PRNGKey(2))
    # same dynamics, different measurement noise on the velocity channels
    assert float(jnp.abs(o1[15:18] - o2[15:18]).max()) > 1e-4


def test_reset_for_test_is_deterministic_default_dynamics():
    """reference reset_for_test (cassie.py:682-733): even with dyn-rand
    ON, the eval reset restores DEFAULT dynamics, zero encoder noise,
    speed 0, phase 0, grounded swing-.15/stance-.25 clock."""
    from apex_tpu.physics.engine import PhysParams

    e = CassieEnv(dynamics_randomization=True, reward="early_clock")
    s, obs = jax.jit(e.reset_for_test)(jax.random.PRNGKey(0))
    default = PhysParams.from_model(e.model)
    np.testing.assert_allclose(np.asarray(s.params.dof_damping),
                               np.asarray(default.dof_damping))
    np.testing.assert_allclose(np.asarray(s.params.friction),
                               np.asarray(default.friction))
    assert float(s.speed) == 0.0 and float(s.phase) == 0.0
    np.testing.assert_allclose(float(s.swing_duration), 0.15, rtol=1e-6)
    np.testing.assert_allclose(float(s.stance_duration), 0.25, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.motor_enc_noise), 0.0)
    # deterministic: two resets agree bitwise
    s2, obs2 = jax.jit(e.reset_for_test)(jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(obs), np.asarray(obs2))


def test_step_basic_matches_step_physics():
    """step_basic (reference cassie.py:499-521) must advance the same
    physics as step -- same qpos after one control step from the same
    state -- while skipping reward and random command changes."""
    e = CassieEnv(dynamics_randomization=False, reward="early_clock")
    s0, _ = jax.jit(e.reset_for_test)(jax.random.PRNGKey(0))
    a = jnp.asarray(np.random.default_rng(0).normal(0, 0.1, 10),
                    jnp.float32)
    s1, o1 = jax.jit(e.step_basic)(s0, a)
    s2, o2, _r, _t, _ = jax.jit(e.step)(s0, a, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(s1.phys.qpos),
                               np.asarray(s2.phys.qpos), rtol=1e-6,
                               atol=1e-7)
    # basic path must NOT touch commands
    assert float(s1.speed) == float(s0.speed)
    assert float(s1.orient_add) == float(s0.orient_add)
    assert int(s1.time) == 1 and float(s1.phase) == float(s0.phase) + 1.0


def test_update_speed_state_rebuilds_clock():
    """update_speed (reference cassie.py:751-768): clamps speed,
    recomputes speed-dependent swing/stance durations + clock, rescales
    phase into the new phaselen."""
    from apex_tpu.rewards.clock import speed_to_durations

    e = CassieEnv(dynamics_randomization=False, reward="early_clock")
    s, _ = jax.jit(e.reset_for_test)(jax.random.PRNGKey(0))
    s = s.replace(phase=jnp.asarray(4.0))
    s2 = jax.jit(e.update_speed_state)(s, jnp.asarray(2.0))
    sw, st = speed_to_durations(2.0)
    np.testing.assert_allclose(float(s2.swing_duration), float(sw),
                               rtol=1e-6)
    np.testing.assert_allclose(float(s2.stance_duration), float(st),
                               rtol=1e-6)
    # phase rescaled by the phaselen ratio, floored (reference int())
    expect = np.floor(float(s2.clock.phaselen) * 4.0 /
                      float(s.clock.phaselen))
    assert float(s2.phase) == expect
    # clamp to max_speed
    s3 = jax.jit(e.update_speed_state)(s, jnp.asarray(99.0))
    assert float(s3.speed) == e.max_speed
