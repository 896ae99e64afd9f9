"""Eval harness smoke tests (tiny grids; Cassie compiles are cached)."""
import jax
import numpy as np
import pytest

from apex_tpu.envs.cassie import CassieEnv
from apex_tpu.models import GaussianFFActor, NormState
from apex_tpu.runtime.eval_suites import (
    eval_5k_matrix,
    eval_commands,
    eval_perturbation,
)


@pytest.fixture(scope="module")
def env_and_policy():
    env = CassieEnv(dynamics_randomization=False, reward="early_clock")
    actor = GaussianFFActor.init(jax.random.PRNGKey(0),
                                 env.observation_size, env.action_size,
                                 fixed_std=0.1)
    norm = NormState.create(env.observation_size)

    def policy_fn(obs):
        return actor.act(norm, obs, deterministic=True)

    return env, policy_fn


def test_perturbation_matrix_shapes(env_and_policy):
    env, policy_fn = env_and_policy
    out = eval_perturbation(env, policy_fn, num_angles=2, max_force=50.0,
                            force_step=50.0, num_phases=1, wait_steps=2,
                            perturb_steps=2, recover_steps=2)
    assert out["survival"].shape == (2, 1, 1)
    assert out["max_force_per_angle"].shape == (2,)


def test_command_following_runs(env_and_policy):
    env, policy_fn = env_and_policy
    out = eval_commands(env, policy_fn, n_trials=4, n_commands=2,
                        steps_per_command=3)
    assert 0.0 <= out["pass_rate"] <= 1.0
    assert out["passed"].shape == (4,)


def test_5k_matrix_runs(env_and_policy):
    """Reference-semantics 5k grid (5k_test.py:19-74, 296-311): the trial
    drives the policy's TRAINING env via update_speed + orient_add +
    step_basic, failure = qpos[2] < 0.4 only; missions x speeds x
    terrains (incl. a heightfield and a tilt) x frictions x foot
    masses, with per-axis breakdowns."""
    env, policy_fn = env_and_policy

    out = eval_5k_matrix(policy_fn, env, missions=("straight",),
                         mission_speeds=(0.9,),
                         terrains=("flat", "noise1", "up_3"),
                         frictions=(1.0,), foot_mass_scales=(1.0, 1.2),
                         max_steps=3)
    assert out["passed"].shape == (1, 1, 3, 1, 2)
    assert set(out["by_terrain"]) == {"flat", "noise1", "up_3"}
    assert 0.0 <= out["pass_rate"] <= 1.0
    # flat is in the grid -> the reference-artifact subset is reported
    assert 0.0 <= out["pass_rate_ref_subset"] <= 1.0


def test_pdf_reports(tmp_path):
    """report.py renders the 5k / perturbation / compare PDFs
    (reference 5k_test.py:230-285, eval_perturb.py:214-255,
    compare_pols.py:93-182 artifacts)."""
    import numpy as np

    from apex_tpu.runtime.report import (
        report_5k,
        report_compare,
        report_perturbation,
    )

    rng = np.random.RandomState(0)
    passed = rng.rand(2, 2, 3, 2, 2) > 0.3
    r5 = {"grid": dict(missions=("straight", "curvy"),
                       mission_speeds=(0.5, 1.4),
                       terrains=("flat", "noise1", "up_3"),
                       frictions=(0.8, 1.2), foot_mass_scales=(1.0, 1.2)),
          "passed": passed, "pass_rate": float(passed.mean()),
          "by_mission": {"straight": 0.7, "curvy": 0.8},
          "by_speed": {0.5: 0.7, 1.4: 0.8},
          "by_terrain": {"flat": 0.9, "noise1": 0.6, "up_3": 0.7},
          "by_friction": {0.8: 0.7, 1.2: 0.8},
          "by_foot_mass": {1.0: 0.7, 1.2: 0.8}}
    p1 = report_5k(r5, str(tmp_path / "r5.pdf"))
    rp = {"angles": np.linspace(0, 2 * np.pi, 4, endpoint=False),
          "forces": np.arange(25, 101, 25),
          "survival": rng.rand(4, 4, 2) > 0.4}
    p2 = report_perturbation(rp, str(tmp_path / "rp.pdf"))
    p3 = report_compare({"a": (120.0, 290.0), "b": (95.0, 250.0)},
                        str(tmp_path / "rc.pdf"))
    import os
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000


def test_scripted_drive(tmp_path):
    """Scripted command-driving eval (runtime/drive.py): the reference's
    interactive keyboard protocol (util/eval.py:110-166) applied from a
    timed script -- commands must land at their steps and telemetry must
    record them."""
    import json

    from apex_tpu.runtime.drive import drive_policy

    env = CassieEnv(dynamics_randomization=False, reward="early_clock")
    actor = GaussianFFActor.init(jax.random.PRNGKey(2),
                                 env.observation_size, env.action_size,
                                 fixed_std=0.1)
    norm = NormState.create(env.observation_size)

    script = [[2, "w"], [2, "w"], [4, "k"], [5, "j"], [6, "p"], [8, "r"]]
    path = tmp_path / "drive.json"
    path.write_text(json.dumps(script))
    res = drive_policy(actor, norm, env, str(path), n_steps=10, seed=0,
                       start_speed=0.0)
    assert res["qpos"].shape == (10, 35)
    # two 'w' presses at step 2: speed 0.0 -> 0.2 from step 2 on
    np.testing.assert_allclose(res["speed"][0], 0.0, atol=1e-6)
    np.testing.assert_allclose(res["speed"][2:7], 0.2, atol=1e-6)
    # 'k' at 4 bumps orient_add by +0.1 (random in-episode drift is rare:
    # p=1/300 per step, seeds here do not hit it)
    assert res["orient_add"][4] > 0.09
    # 'j' at 5 raises phase_add to 1.1
    np.testing.assert_allclose(res["phase_add"][5:7], 1.1, atol=1e-6)
    # 'r' at 8 resets: phase_add back to 1.0, speed re-randomized
    np.testing.assert_allclose(res["phase_add"][8:], 1.0, atol=1e-6)


def test_eval_commands_on_committed_flagship():
    """Mid-scale suite-semantics fixture (VERDICT r4 weak #5): the
    committed mk4-hardened flagship is a known-good walker, so a short
    command trial must PASS -- a harness regression (wrong failure
    criterion, broken reset_for_test state, command plumbing) shows up
    as an immediate fail here without re-running the full battery."""
    from apex_tpu.runtime.evaluate import load_experiment

    ppo, state, _ = load_experiment("curves/cassie_mk4_hardened_ckpt")
    env = ppo.env

    def policy_fn(obs):
        return state.actor.act(state.norm, obs, deterministic=True)

    from apex_tpu.runtime.eval_suites import eval_commands as ec

    out = ec(env, policy_fn, n_trials=2, n_commands=1,
             steps_per_command=30, seed=0)
    # 30 steps at speed 0.5 from standing: the flagship does not fall
    assert out["pass_rate"] == 1.0, out
