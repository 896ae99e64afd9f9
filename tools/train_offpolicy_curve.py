"""Train the replay/derivative-free agents to competence and record the
learning curve (VERDICT round-3 #6: committed td3/ars curves beyond
smoke-test scale; async TD3 is half the reference's identity,
rl/algos/async_td3.py:316-527).

Usage: python tools/train_offpolicy_curve.py {td3_async,td3_sync,ars}
           [--env walker] [--timesteps N | --n-itr N] [--name S] ...
Writes curves/<name>.npz (+ checkpoint dir for td3).
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def make_env(which: str):
    if which == "walker":
        from apex_tpu.envs.walker2d import Walker2dEnv

        return Walker2dEnv(), "Walker2d"
    if which == "cassie_standing":
        from apex_tpu.envs.cassie_standing import CassieStandingEnv

        return CassieStandingEnv(), "CassieStanding-v0"
    raise ValueError(which)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("algo", choices=["td3_async", "td3_sync", "ars",
                                     "ddpg", "rdpg"])
    ap.add_argument("--env", default="walker",
                    choices=["walker", "cassie_standing"])
    ap.add_argument("--timesteps", type=float, default=3e6)
    ap.add_argument("--n-itr", type=int, default=300, help="ars iterations")
    ap.add_argument("--num-envs", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--name", default=None)
    args = ap.parse_args()

    env, env_name = make_env(args.env)
    name = args.name or f"{args.algo}_{args.env}_seed{args.seed}"
    out = pathlib.Path(__file__).resolve().parent.parent / "curves"
    out.mkdir(exist_ok=True)

    iters, walls, rets, steps_l = [], [], [], []
    t0 = time.time()

    if args.algo == "ars":
        from apex_tpu.agents.ars import ARS, ARSConfig

        ars = ARS(env, ARSConfig(algo="v2"))
        state = ars.init(seed=args.seed)
        for it in range(args.n_itr):
            state, metrics = ars._step(state)
            if it % args.eval_every == 0 or it == args.n_itr - 1:
                r = float(metrics["mean_return"])
                iters.append(it)
                walls.append(time.time() - t0)
                rets.append(r)
                steps_l.append(int(state.total_steps))
                print(f"itr {it:5d} | wall {walls[-1]:7.1f}s | "
                      f"steps {steps_l[-1] / 1e6:6.2f}M | mean {r:8.2f} | "
                      f"max {float(metrics['max_return']):8.2f}",
                      flush=True)
    elif args.algo in ("ddpg", "rdpg"):
        from apex_tpu.agents.dpg import DPG, DPGConfig

        cfg = DPGConfig(num_envs=args.num_envs,
                        recurrent=args.algo == "rdpg")
        dpg = DPG(env, cfg)
        state = dpg.init(seed=args.seed)
        steps_per_iter = (cfg.max_traj_len if cfg.recurrent
                          else cfg.collect_steps) * cfg.num_envs
        n_iters = max(1, int(args.timesteps) // steps_per_iter)
        warmup = max(1, cfg.start_timesteps // steps_per_iter)
        total = 0
        for it in range(n_iters):
            state, metrics = dpg._train_iter(state, it < warmup)
            total += steps_per_iter
            if it % args.eval_every == 0 or it == n_iters - 1:
                ev = dpg._eval_iter(
                    state, jax.random.fold_in(jax.random.PRNGKey(5), it))
                r = float(ev["ep_return"])
                iters.append(it)
                walls.append(time.time() - t0)
                rets.append(r)
                steps_l.append(total)
                print(f"it {it:5d} | wall {walls[-1]:7.1f}s | "
                      f"steps {total / 1e6:6.2f}M | eval {r:8.2f} | "
                      f"closs {float(metrics['critic_loss']):8.4f}",
                      flush=True)
    else:
        from apex_tpu.agents.td3 import TD3, TD3Config
        from apex_tpu.runtime.checkpoint import save_checkpoint

        cfg = TD3Config(num_envs=args.num_envs,
                        async_mode=args.algo == "td3_async")
        td3 = TD3(env, cfg)
        state = td3.init(seed=args.seed)
        ckpt_dir = out / f"{name}_ckpt"
        ckpt_dir.mkdir(exist_ok=True)
        steps_per_iter = cfg.collect_steps * cfg.num_envs
        n_iters = max(1, int(args.timesteps) // steps_per_iter)
        warmup = max(1, cfg.start_timesteps // steps_per_iter)
        from apex_tpu.agents.td3 import _tree_copy

        total, best = 0, -np.inf
        for it in range(n_iters):
            if not cfg.async_mode or it % cfg.load_freq == 0:
                state = state.replace(behavior=_tree_copy(state.actor))
            state, metrics = td3._train_iter(state, it < warmup)
            total += steps_per_iter
            if it % args.eval_every == 0 or it == n_iters - 1:
                ev = td3._eval_iter(
                    state, jax.random.fold_in(jax.random.PRNGKey(7), it))
                r = float(ev["ep_return"])
                iters.append(it)
                walls.append(time.time() - t0)
                rets.append(r)
                steps_l.append(total)
                print(f"it {it:5d} | wall {walls[-1]:7.1f}s | "
                      f"steps {total / 1e6:6.2f}M | eval {r:8.2f} | "
                      f"closs {float(metrics['critic_loss']):8.4f}",
                      flush=True)
                if r > best:
                    best = r
                    save_checkpoint(str(ckpt_dir), state)

    path = out / f"{name}.npz"
    np.savez(path, iters=np.asarray(iters), wall_s=np.asarray(walls),
             env_steps=np.asarray(steps_l), eval_return=np.asarray(rets),
             algo=args.algo, env=env_name, seed=args.seed)
    print(json.dumps({
        "algo": args.algo, "env": env_name, "seed": args.seed,
        "wall_s": round(walls[-1], 1), "total_env_steps": steps_l[-1],
        "eval_return_first": round(rets[0], 2),
        "eval_return_last": round(rets[-1], 2),
        "eval_return_max": round(float(np.max(rets)), 2),
        "curve": str(path),
    }))


if __name__ == "__main__":
    main()
