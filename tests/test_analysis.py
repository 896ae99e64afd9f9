"""Smoke tests for the offline analysis tools (reference
tools/aslip_tests/* + vis_perturb/vis_input_and_state equivalents)."""
import jax
import numpy as np
import pytest

from apex_tpu.envs.cassie import CassieEnv
from apex_tpu.envs.cassie_traj import CassieTrajEnv
from apex_tpu.models import GaussianFFActor, NormState
from apex_tpu.runtime.analysis import (
    foot_placement_error,
    grf_profile,
    input_and_state_record,
    perturb_response,
    taskspace_tracking,
)


def _policy(env, seed=0):
    actor = GaussianFFActor.init(jax.random.PRNGKey(seed),
                                 env.observation_size, env.action_size,
                                 fixed_std=0.1)
    norm = NormState.create(env.observation_size)

    def policy_fn(obs):
        return actor.act(norm, obs, deterministic=True)

    return policy_fn


@pytest.fixture(scope="module")
def aslip_env():
    return CassieTrajEnv(traj="aslip", command_profile="traj",
                         reward="aslip_old", dynamics_randomization=False)


@pytest.fixture(scope="module")
def cassie_env():
    return CassieEnv(dynamics_randomization=False, reward="early_clock")


def test_grf_profile_shapes(aslip_env):
    prof = grf_profile(aslip_env, _policy(aslip_env), traj_idx=10,
                       n_cycles=1, wait_cycles=0, seeds=(0,))
    cycle = prof["cycle_steps"]
    assert prof["mean"].shape == (cycle * aslip_env.simrate, 2)
    assert prof["std"].shape == prof["mean"].shape
    assert np.all(np.isfinite(prof["mean"]))


def test_foot_placement_runs(aslip_env):
    r = foot_placement_error(aslip_env, _policy(aslip_env), traj_idx=10,
                             num_steps=2, n_trials=2)
    assert r["stride_right_to_left"].shape == (2,)
    assert r["n_footsteps"] >= 0


def test_taskspace_tracking_rows(aslip_env):
    rows = taskspace_tracking(aslip_env, _policy(aslip_env),
                              traj_indices=[10], n_cycles=1, ramp_cycles=0)
    assert len(rows) == 1
    assert rows[0]["speed"] == 1.0
    assert "lfoot_rms" in rows[0]


def test_input_and_state_record(cassie_env):
    rec = input_and_state_record(cassie_env, _policy(cassie_env),
                                 n_steps=4, speed=1.0)
    assert rec["qpos"].shape == (4, 35)
    # estimate_state is exact kinematics: est foot pos must match the
    # true (world foot - pelvis) to float tolerance
    assert rec["est_lfoot_err"] < 1e-4
    assert rec["est_rfoot_err"] < 1e-4


def test_perturb_response_grid(cassie_env):
    res = perturb_response(cassie_env, _policy(cassie_env), force=50.0,
                           angles=np.array([0.0, np.pi]), phases=[0, 8],
                           wait_steps=2, perturb_steps=2, recover_steps=2)
    assert res["survived"].shape == (2, 2)
    assert res["pelvis"].shape == (2, 2, 6, 7)
    assert res["push_window"] == (2, 4)


def test_plot_policy_channel_figure(tmp_path):
    """plot_policy channel parity (reference plot_policy.py:1-326): the
    record_policy npz schema renders the PD-target-vs-measured / torque /
    GRF figure without error."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "plot_policy",
        pathlib.Path(__file__).resolve().parent.parent
        / "tools" / "plot_policy.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    T = 30
    rng = np.random.default_rng(0)
    rec = dict(
        pd_target=rng.normal(0, 0.1, (T, 10)),
        motor_pos=rng.normal(0, 0.1, (T, 10)),
        motor_vel=np.zeros((T, 10)),
        torque=rng.normal(0, 10, (T, 10)),
        grf=np.abs(rng.normal(0, 100, (T, 2))),
        foot_pos=rng.normal(0, 0.2, (T, 2, 3)),
        qpos=rng.normal(0, 0.2, (T, 35)),
        reward=rng.random(T),
        speed=np.asarray(1.0),
    )
    out = tmp_path / "channels.png"
    mod.plot_channels(rec, str(out))
    assert out.exists() and out.stat().st_size > 10_000


def test_cassie_info_carries_plot_channels(cassie_env):
    """The env info dict exposes the recorded channel set."""
    env = cassie_env
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    action = np.zeros(env.action_size)
    _, _, _, _, info = jax.jit(env.step)(state, action,
                                         jax.random.PRNGKey(1))
    for k, shape in (("pd_target", (10,)), ("motor_pos", (10,)),
                     ("motor_vel", (10,)), ("motor_torque", (10,))):
        assert np.asarray(info[k]).shape == shape, k
