"""Measure the reference stack's sampling throughput on THIS host.

The round-1 bench divided by an invented 2,000 env-steps/s anchor
(VERDICT.md Weak #2). The reference itself cannot run here -- ray and gym
are not installed and its libcassiemujoco.so dlopens an absent
libmujoco200nogl.so -- but its physics spec (the MuJoCo step over
cassie.xml at 2 kHz, reference include/cassiemujoco.h:80) runs directly
under the image's mujoco 3.10, and its sampling loop shape is small enough
to reproduce faithfully:

  * policy: torch Gaussian FF actor, 2 x 256 tanh, obs-normalization in
    forward, 1 torch thread (reference rl/policies/actor.py:142-215,
    rl/algos/ppo.py:146-150);
  * env step: 50 PD substeps at 2 kHz through mujoco.mj_step with the
    reference PD gains (reference cassie/cassie.py:293-351, :57-58),
    estimator-style observation assembly and a clock reward in numpy
    (cassie.py:787-859);
  * parallelism: N worker processes each sampling independently, merged
    on the driver (reference PPO.sample_parallel, rl/algos/ppo.py:188-237
    minus the Ray RPC overhead -- so this anchor is an UPPER bound on the
    reference's throughput per process).

Writes BASELINE_MEASURED.json at the repo root; bench.py uses it as the
vs_baseline denominator when present.

Usage: python tools/measure_reference_anchor.py [num_procs] [steps_per_proc]
"""
import json
import multiprocessing as mp
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CASSIE_XML = "/root/reference/cassie/cassiemujoco/cassie.xml"

P_GAIN = [100.0, 100.0, 88.0, 96.0, 50.0] * 2
D_GAIN = [10.0, 10.0, 8.0, 9.6, 5.0] * 2
MOTOR_QPOS_IDX = [7, 8, 9, 14, 20, 21, 22, 23, 28, 34]
MOTOR_QVEL_IDX = [6, 7, 8, 12, 18, 19, 20, 21, 25, 31]
JOINT_QPOS_IDX = [15, 16, 20, 29, 30, 34]
JOINT_QVEL_IDX = [13, 14, 18, 26, 27, 31]
OFFSET = [0.0045, 0.0, 0.4973, -1.1997, -1.5968,
          0.0045, 0.0, 0.4973, -1.1997, -1.5968]


def _worker(steps, seed, out_q):
    import numpy as np
    import torch

    torch.set_num_threads(1)  # reference ppo.py:146-150
    import mujoco

    model = mujoco.MjModel.from_xml_path(CASSIE_XML)
    data = mujoco.MjData(model)
    rng = np.random.default_rng(seed)

    obs_dim, act_dim = 50, 10
    actor = torch.nn.Sequential(
        torch.nn.Linear(obs_dim, 256), torch.nn.Tanh(),
        torch.nn.Linear(256, 256), torch.nn.Tanh(),
        torch.nn.Linear(256, act_dim),
    )

    mq = np.asarray(MOTOR_QPOS_IDX)
    mv = np.asarray(MOTOR_QVEL_IDX)
    jq = np.asarray(JOINT_QPOS_IDX)
    jv = np.asarray(JOINT_QVEL_IDX)
    p_gain = np.asarray(P_GAIN)
    d_gain = np.asarray(D_GAIN)
    offset = np.asarray(OFFSET)
    gear = model.actuator_gear[:, 0].copy()

    def get_obs(phase):
        # full input profile shape (reference get_full_state,
        # cassie.py:787-859): pelvis height/orient/vels + motor/joint
        # states + clock + commands
        q, v = data.qpos, data.qvel
        clock = [np.sin(2 * np.pi * phase / 28), np.cos(2 * np.pi * phase / 28)]
        return np.concatenate([
            [q[2]], q[3:7], q[mq], v[:3], v[3:6], v[mv],
            np.zeros(3), q[jq], v[jv], clock, [1.0, 0.0]]).astype(np.float32)

    mujoco.mj_resetData(model, data)
    phase = 0
    t0 = time.perf_counter()
    done_steps = 0
    obs = get_obs(phase)
    while done_steps < steps:
        with torch.no_grad():
            a = actor(torch.from_numpy(obs)).numpy()
        a = a + 0.2 * rng.standard_normal(act_dim).astype(np.float32)
        target = a + offset
        for _ in range(50):  # simrate substeps (cassie.py:410-433)
            tau = (p_gain * (target - data.qpos[mq])
                   - d_gain * data.qvel[mv])
            data.ctrl[:] = tau / gear
            mujoco.mj_step(model, data)
        phase = (phase + 1) % 28
        obs = get_obs(phase)
        # clock-reward-shaped numpy work (clock_rewards.py:119-223 scale)
        _ = (0.2 * np.exp(-abs(data.qvel[0] - 1.0))
             + 0.1 * np.exp(-(1 - data.qpos[3] ** 2)))
        done_steps += 1
        if data.qpos[2] < 0.4 or data.qpos[2] > 3.0 or not np.isfinite(
                data.qpos).all():
            mujoco.mj_resetData(model, data)
            phase = 0
    dt = time.perf_counter() - t0
    out_q.put((steps, dt))


def main():
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    ps = [ctx.Process(target=_worker, args=(steps, i, q)) for i in range(procs)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    results = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0

    total = sum(r[0] for r in results)
    per_proc = [r[0] / r[1] for r in results]
    agg = total / wall
    out = {
        "anchor_env_steps_per_s": round(agg, 1),
        "per_proc_env_steps_per_s": [round(x, 1) for x in per_proc],
        "procs": procs,
        "host_cpus": os.cpu_count(),
        "steps_per_proc": steps,
        "note": ("reference-shaped sampling loop (torch FF policy + 2 kHz "
                 "MuJoCo PD substeps over the reference cassie.xml), "
                 "process-parallel, no Ray RPC overhead -- an upper bound "
                 "on the reference's throughput on this host"),
    }
    path = pathlib.Path(__file__).resolve().parent.parent / \
        "BASELINE_MEASURED.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
