"""Runtime layer: logger dirs, checkpoint round-trip, experiment reload."""
import os
import pickle

import jax
import numpy as np
import pytest

from apex_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
from apex_tpu.runtime.log import args_hash, create_logger, parse_previous


def test_create_logger_writes_experiment_files(tmp_path):
    args = {"env_name": "PointMass-v0", "seed": 3, "logdir": str(tmp_path),
            "lr": 1e-4}
    writer = create_logger(args)
    assert os.path.exists(os.path.join(writer.dir, "experiment.info"))
    with open(os.path.join(writer.dir, "experiment.pkl"), "rb") as f:
        saved = pickle.load(f)
    assert saved["lr"] == 1e-4
    # hash excludes seed: same args different seed -> same hash prefix
    h1 = args_hash({"env_name": "x", "seed": 1, "lr": 1e-4})
    h2 = args_hash({"env_name": "x", "seed": 2, "lr": 1e-4})
    assert h1 == h2
    assert f"-seed{3}" in writer.dir


def test_parse_previous_inherits_env_shape(tmp_path):
    from types import SimpleNamespace

    prev_dir = tmp_path / "prev"
    prev_dir.mkdir()
    with open(prev_dir / "experiment.pkl", "wb") as f:
        pickle.dump({"env_name": "Cassie-v0", "simrate": 60,
                     "command_profile": "phase", "run_name": "r0"}, f)
    args = SimpleNamespace(previous=str(prev_dir), env_name="Other-v0",
                           simrate=50, command_profile="clock",
                           exchange_reward="5k_speed_reward", reward="clock",
                           run_name=None)
    args = parse_previous(args)
    assert args.env_name == "Cassie-v0"
    assert args.simrate == 60
    assert args.command_profile == "phase"
    assert args.reward == "5k_speed_reward"
    assert "NEW-5k_speed_reward" in args.run_name


def test_ppo_experiment_reload_roundtrip(tmp_path):
    """load_experiment rebuilds the agent from experiment.pkl and restores
    the checkpoint (the apex.py eval path)."""
    from apex_tpu.agents.ppo import PPO, PPOConfig
    from apex_tpu.envs.base import PointMassEnv
    from apex_tpu.runtime.evaluate import load_experiment

    run_dir = tmp_path / "run"
    run_dir.mkdir()
    with open(run_dir / "experiment.pkl", "wb") as f:
        pickle.dump({"env_name": "PointMass-v0", "num_procs": 8,
                     "num_steps": 64, "max_traj_len": 30}, f)

    ppo = PPO(PointMassEnv(), PPOConfig(num_envs=8, num_steps=64,
                                        max_traj_len=30))
    state = ppo.init(seed=0)
    save_checkpoint(str(run_dir), state)

    ppo2, state2, _ = load_experiment(str(run_dir))
    a1 = jax.tree_util.tree_leaves(state.actor.params)[0]
    a2 = jax.tree_util.tree_leaves(state2.actor.params)[0]
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
