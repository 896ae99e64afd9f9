"""Reference-trajectory data loaders + IK network.

Rebuilds reference cassie/trajectory/ (trajectory.py:7-39 binary reader,
aslip_trajectory.py:42-98 gait library + IKNet precompute, missions/
command_mission.py:5-23) on top of the .npz assets produced by
tools/gen_data_assets.py. Arrays are float32 numpy on host; envs slice them
into device constants at construction.
"""
from __future__ import annotations

import os
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")

ASLIP_SPEEDS = [round(0.1 * i, 1) for i in range(21)]  # 0.0 .. 2.0


class CassieTrajectory:
    """Agility 2 kHz trajectory (reference trajectory/trajectory.py:7-39)."""

    def __init__(self, name: str = "walking"):
        f = np.load(os.path.join(DATA_DIR, f"traj_{name}.npz"))
        self.time = f["time"]
        self.qpos = f["qpos"]     # (N, 35)
        self.qvel = f["qvel"]     # (N, 32)
        self.torque = f["torque"]
        self.mpos = f["mpos"]
        self.mvel = f["mvel"]

    def __len__(self):
        return len(self.time)


class CassieAslipTrajectory:
    """One speed-indexed task-space gait cycle
    (reference aslip_trajectory.py:80-98)."""

    def __init__(self, data: Dict[str, np.ndarray]):
        self.qpos = data["qpos"]       # (T, 35)
        self.qvel = data["qvel"]       # (T, 10) motor velocities
        self.rpos, self.rvel = data["rpos"], data["rvel"]
        self.lpos, self.lvel = data["lpos"], data["lvel"]
        self.cpos, self.cvel = data["cpos"], data["cvel"]
        self.time = data["time"]
        self.length = self.qpos.shape[0]


def get_all_aslip_trajectories() -> List[CassieAslipTrajectory]:
    """All 21 speed cycles (reference getAllTrajectories,
    aslip_trajectory.py:42-56), with IK-refined qpos precomputed by IKNet."""
    f = np.load(os.path.join(DATA_DIR, "aslip_trajs.npz"))
    iknet = IKNet()
    trajs = []
    for s in ASLIP_SPEEDS:
        data = {k: f[f"s{s}_{k}"] for k in
                ("qpos", "qvel", "rpos", "rvel", "lpos", "lvel", "cpos",
                 "cvel", "time")}
        # reference replaces trajectory qpos with ikNet output over the
        # task-space targets (aslip_trajectory.py:57-66)
        task = np.concatenate([data["rpos"], data["lpos"], data["cpos"]],
                              axis=1)  # (T, 9)
        data = dict(data)
        data["ik_pos"] = iknet(task)
        traj = CassieAslipTrajectory(data)
        traj.ik_pos = data["ik_pos"]
        trajs.append(traj)
    return trajs


class IKNet:
    """9 -> 35 MLP mapping task-space (rfoot, lfoot, com) to qpos
    (reference trajectory/ikNet trained offline; state dict converted to
    iknet.npz). Two hidden layers + linear out, relu."""

    def __init__(self):
        f = np.load(os.path.join(DATA_DIR, "iknet.npz"))
        self.w0, self.b0 = f["layers.0.weight"].T, f["layers.0.bias"]
        self.w1, self.b1 = f["layers.1.weight"].T, f["layers.1.bias"]
        self.w2, self.b2 = f["out.weight"].T, f["out.bias"]

    def __call__(self, x: np.ndarray) -> np.ndarray:
        h = np.maximum(x @ self.w0 + self.b0, 0.0)
        h = np.maximum(h @ self.w1 + self.b1, 0.0)
        return h @ self.w2 + self.b2


class CommandTrajectory:
    """Mission command schedule (reference missions/command_mission.py:5-23)."""

    def __init__(self, mission: str = "default"):
        path = os.path.join(DATA_DIR, f"mission_{mission}.npz")
        f = np.load(path)
        self.global_pos = f["compos"]
        self.speed_cmd = f["speed"]
        self.orient = f["orient"]
        self.trajlen = len(self.speed_cmd)
