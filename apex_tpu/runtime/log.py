"""Experiment directories, TensorBoard logging, and curriculum resume.

Parity with reference util/log.py:11-91:
  * run dir = logdir/env_name/<md5(args minus seed/logdir)>-seed<seed>/
  * `experiment.info` human-readable arg dump, `experiment.pkl` pickled args
  * returns a SummaryWriter with a `.dir` attribute
  * parse_previous re-inherits env-shape args from a previous run for
    curriculum continuation, with optional reward exchange.
"""
from __future__ import annotations

import hashlib
import os
import pickle
from collections import OrderedDict


class _NullWriter:
    """Fallback writer when tensorboard is unavailable; keeps the same API."""

    def __init__(self, logdir):
        self.dir = logdir

    def add_scalar(self, *a, **k):
        pass

    def add_histogram(self, *a, **k):
        pass

    def flush(self):
        pass

    def close(self):
        pass


def args_hash(arg_dict: dict) -> str:
    """md5 over sorted args minus seed/logdir/previous (util/log.py:23-49)."""
    arg_dict = OrderedDict(sorted(arg_dict.items(), key=lambda t: t[0]))
    for key in ("seed", "logdir", "previous"):
        arg_dict.pop(key, None)
    return hashlib.md5(str(arg_dict).encode("utf-8")).hexdigest()[:10]


def create_logger(args):
    """Create run dir + writer. `args` is an argparse.Namespace or dict."""
    arg_dict = dict(vars(args)) if not isinstance(args, dict) else dict(args)
    seed = arg_dict.get("seed", 0)
    logdir = str(arg_dict.get("logdir", "./trained_models"))
    env_name = str(arg_dict.get("env_name", "env"))

    run_name = f"{args_hash(arg_dict)}-seed{seed}"
    output_dir = os.path.join(logdir, env_name, run_name)
    os.makedirs(output_dir, exist_ok=True)

    # experiment.info: human-readable (util/log.py:57-60)
    with open(os.path.join(output_dir, "experiment.info"), "w") as f:
        for key, val in sorted(arg_dict.items()):
            f.write(f"{key}: {val}\n")

    # experiment.pkl: machine-readable (util/log.py:61-63)
    with open(os.path.join(output_dir, "experiment.pkl"), "wb") as f:
        pickle.dump(arg_dict, f)

    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(log_dir=output_dir, flush_secs=60)
    except Exception:
        writer = _NullWriter(output_dir)
    writer.dir = output_dir
    return writer


def parse_previous(args):
    """Inherit env-shape args from a previous run (util/log.py:74-91).

    If args.previous is set, loads that run's experiment.pkl and copies the
    env-defining fields so a curriculum continuation sees identical obs/act
    spaces. `exchange_reward` renames the run and swaps the reward function.
    """
    if getattr(args, "previous", None) is None:
        return args
    prev_pkl = os.path.join(args.previous, "experiment.pkl")
    with open(prev_pkl, "rb") as f:
        prev = pickle.load(f)
    for key in ("env_name", "traj", "simrate", "command_profile",
                "input_profile", "learn_gains", "history", "no_delta",
                "ik_baseline", "mirror"):
        if key in prev:
            setattr(args, key, prev[key])
    if getattr(args, "exchange_reward", None):
        args.reward = args.exchange_reward
        args.run_name = prev.get("run_name", "run") + "_NEW-" + str(args.reward)
    return args
