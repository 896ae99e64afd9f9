"""Train PPO and record the learning curve (VERDICT.md round-1 item #3:
no training-to-reward artifact existed).

Runs the fused PPO loop on Cassie-v0 or Walker2d, logging per-iteration
wall-clock / env-steps / train return / deterministic eval return, and
saves an npz curve artifact under curves/ for the README table.

Usage: python tools/train_curve.py {cassie,walker} [n_itr] [num_envs] [seed]
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cassie"
    n_itr = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    num_envs = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from apex_tpu.agents.ppo import PPO, PPOConfig

    if which == "cassie":
        from apex_tpu.envs.cassie import CassieEnv

        env = CassieEnv(dynamics_randomization=False, reward="early_clock")
        cfg = PPOConfig(num_envs=num_envs, num_steps=num_envs * 32,
                        max_traj_len=300, minibatch_size=2048, epochs=3)
    else:
        from apex_tpu.envs.walker2d import Walker2dEnv

        env = Walker2dEnv()
        cfg = PPOConfig(num_envs=num_envs, num_steps=num_envs * 32,
                        max_traj_len=400, minibatch_size=2048, epochs=3)

    ppo = PPO(env, cfg)
    state = ppo.init(seed=seed)
    t_setup = time.time()
    state = ppo.prenormalize(state, steps=10000)

    iters, walls, train_ret, eval_ret, eplen, steps = [], [], [], [], [], []
    total_steps = 0
    anneal = jax.numpy.asarray(1.0)
    t0 = time.time()
    for itr in range(n_itr):
        state, metrics = ppo._train_iter(state, anneal)
        ev = ppo._eval_iter(state, jax.random.fold_in(jax.random.PRNGKey(1),
                                                      itr))
        er = float(ev["ep_return"])
        total_steps += cfg.rollout_len * cfg.num_envs
        iters.append(itr)
        walls.append(time.time() - t0)
        train_ret.append(float(metrics["train_ep_return"]))
        eval_ret.append(er)
        eplen.append(float(metrics["train_ep_len"]))
        steps.append(total_steps)
        if itr % 10 == 0 or itr == n_itr - 1:
            print(f"itr {itr:4d} | wall {walls[-1]:7.1f}s | "
                  f"steps {total_steps / 1e6:6.1f}M | eval {er:8.2f} | "
                  f"train {train_ret[-1]:8.2f} | eplen {eplen[-1]:6.1f}",
                  flush=True)

    out = pathlib.Path(__file__).resolve().parent.parent / "curves"
    out.mkdir(exist_ok=True)
    path = out / f"{which}_ppo_seed{seed}.npz"
    np.savez(path, iters=np.asarray(iters), wall_s=np.asarray(walls),
             env_steps=np.asarray(steps), train_return=np.asarray(train_ret),
             eval_return=np.asarray(eval_ret), ep_len=np.asarray(eplen),
             num_envs=num_envs, steps_per_iter=cfg.rollout_len * num_envs)
    summary = {
        "env": which, "n_itr": n_itr, "num_envs": num_envs, "seed": seed,
        "total_env_steps": total_steps,
        "wall_s": round(walls[-1], 1),
        "env_steps_per_s": round(total_steps / walls[-1], 1),
        "eval_return_first10_mean": round(float(np.mean(eval_ret[:10])), 2),
        "eval_return_last10_mean": round(float(np.mean(eval_ret[-10:])), 2),
        "eval_return_max": round(float(np.max(eval_ret)), 2),
        "curve": str(path),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
