"""Benchmark entry point for the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: aggregate environment steps/second of the fused PPO training loop
(vmapped rollout + returns + 3-epoch update) on Cassie-v0 -- each env step
is 50 physics substeps at 2 kHz, so substeps/s = 50x this number. The
reference's equivalent path is 30 Ray CPU workers sampling ~1-2k steps/s
aggregate (BASELINE.md records no published numbers; the anchor below is a
generous estimate of the reference's all-core throughput).

Falls back to the PointMass toy-env PPO bench if the Cassie path fails
(e.g. device fault), bounded by alarms so the driver always gets a line.
"""
import json
import signal
import sys
import time


class Timeout(Exception):
    pass


def _alarm(sec):
    def handler(signum, frame):
        raise Timeout()

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(sec)


def bench_cassie_ppo(num_envs=1024, iters=3):
    import jax

    from apex_tpu.agents.ppo import PPO, PPOConfig
    from apex_tpu.envs.cassie import CassieEnv

    env = CassieEnv(dynamics_randomization=False, reward="early_clock")
    cfg = PPOConfig(num_envs=num_envs, num_steps=num_envs * 32,
                    max_traj_len=300, minibatch_size=2048, epochs=3)
    ppo = PPO(env, cfg)
    state = ppo.init(seed=0)
    anneal = jax.numpy.asarray(1.0)
    state, metrics = ppo._train_iter(state, anneal)   # compile
    jax.block_until_ready(metrics["kl"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = ppo._train_iter(state, anneal)
    jax.block_until_ready(metrics["kl"])
    dt = time.perf_counter() - t0
    return iters * cfg.rollout_len * cfg.num_envs / dt


def bench_toy_ppo(num_envs=2048, iters=8):
    import jax

    from apex_tpu.agents.ppo import PPO, PPOConfig
    from apex_tpu.envs.base import PointMassEnv

    cfg = PPOConfig(num_envs=num_envs, num_steps=num_envs * 32,
                    max_traj_len=300, minibatch_size=4096, epochs=3)
    ppo = PPO(PointMassEnv(), cfg)
    state = ppo.init(seed=0)
    anneal = jax.numpy.asarray(1.0)
    state, metrics = ppo._train_iter(state, anneal)
    jax.block_until_ready(metrics["kl"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = ppo._train_iter(state, anneal)
    jax.block_until_ready(metrics["kl"])
    dt = time.perf_counter() - t0
    return iters * cfg.rollout_len * cfg.num_envs / dt


def main():
    # anchor: MEASURED reference-shaped sampling throughput (torch FF
    # policy + 2 kHz MuJoCo PD substeps over the reference cassie.xml,
    # process-parallel) -- produced by tools/measure_reference_anchor.py,
    # stored in BASELINE_MEASURED.json. Falls back to a 30-proc
    # extrapolation of the measured ~155 steps/s/proc if the file is
    # missing (the reference default is 30 procs, apex.py:244).
    import os
    baseline = 155.0 * 30
    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    if os.path.exists(measured):
        try:
            with open(measured) as f:
                info = json.load(f)
            # scale the measured per-proc rate to the reference's default
            # 30-proc deployment for a like-for-like aggregate anchor
            per_proc = info.get("per_proc_env_steps_per_s")
            if per_proc:
                baseline = 30.0 * (sum(per_proc) / len(per_proc))
            else:
                baseline = float(info["anchor_env_steps_per_s"])
        except Exception:
            pass
    try:
        _alarm(1500)
        sps = bench_cassie_ppo()
        signal.alarm(0)
        print(json.dumps({
            "metric": "cassie_ppo_env_steps_per_s",
            "value": round(sps, 1),
            "unit": "env-steps/s (x50 substeps)",
            "vs_baseline": round(sps / baseline, 2),
        }))
        return
    except BaseException as e:
        signal.alarm(0)
        print(f"cassie bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    try:
        _alarm(900)
        sps = bench_toy_ppo()
        signal.alarm(0)
        print(json.dumps({
            "metric": "toy_ppo_env_steps_per_s",
            "value": round(sps, 1),
            "unit": "steps/s",
            "vs_baseline": round(sps / 10_000.0, 2),
        }))
    except BaseException as e:
        signal.alarm(0)
        print(json.dumps({
            "metric": "cassie_ppo_env_steps_per_s",
            "value": 0.0,
            "unit": "env-steps/s",
            "vs_baseline": 0.0,
        }))
        print(f"all benches failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
