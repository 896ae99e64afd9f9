"""Train RECURRENT PPO (LSTM actor/critic, BPTT) and record the learning
curve + checkpoint (VERDICT round-4 item #5: LSTM policies are part of the
reference's identity -- rl/policies/actor.py:218-311 -- but recurrent PPO
had only smoke tests and no committed curve).

Same artifact format as tools/train_curve.py:
  curves/<name>.npz + curves/<name>_ckpt/.

Usage: python tools/train_recurrent_curve.py {walker,cassie} [options]
"""
import argparse
import json
import pathlib
import pickle
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["walker", "cassie"])
    ap.add_argument("--n-itr", type=int, default=300)
    ap.add_argument("--num-envs", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--chunk-len", type=int, default=64)
    ap.add_argument("--minibatch-envs", type=int, default=32)
    ap.add_argument("--reward", default="early_clock")
    ap.add_argument("--std", type=float, default=-1.5)
    ap.add_argument("--max-traj-len", type=int, default=300)
    ap.add_argument("--name", default=None)
    args = ap.parse_args()

    from apex_tpu.agents.ppo import PPOConfig
    from apex_tpu.agents.ppo_recurrent import RecurrentPPO
    from apex_tpu.runtime.checkpoint import save_checkpoint

    if args.which == "cassie":
        from apex_tpu.envs.cassie import CassieEnv

        env = CassieEnv(dynamics_randomization=False, reward=args.reward)
        env_name = "Cassie-v0"
    else:
        from apex_tpu.envs.walker2d import Walker2dEnv

        env = Walker2dEnv()
        env_name = "Walker2d"

    cfg = PPOConfig(num_envs=args.num_envs,
                    num_steps=args.num_envs * args.chunk_len,
                    max_traj_len=args.max_traj_len,
                    minibatch_size=args.minibatch_envs,
                    epochs=args.epochs, lr=args.lr, std_dev=args.std)

    name = args.name or f"recurrent_ppo_{args.which}_seed{args.seed}"
    out = pathlib.Path(__file__).resolve().parent.parent / "curves"
    ckpt_dir = out / f"{name}_ckpt"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    with open(ckpt_dir / "experiment.pkl", "wb") as f:
        pickle.dump({"env_name": env_name, "reward": args.reward,
                     "recurrent": True, "num_procs": cfg.num_envs,
                     "seed": args.seed, "std_dev": args.std}, f)

    ppo = RecurrentPPO(env, cfg)
    state = ppo.init(seed=args.seed)
    state = ppo.prenormalize(state, steps=10000)

    iters, walls, train_ret, eval_ret, steps = [], [], [], [], []
    total = 0
    best = -np.inf
    anneal = jax.numpy.asarray(1.0)
    t0 = time.time()
    for itr in range(args.n_itr):
        state, metrics = ppo._train_iter(state, anneal)
        total += cfg.num_envs * args.chunk_len
        if itr % args.eval_every == 0 or itr == args.n_itr - 1:
            ev = ppo._eval_iter(
                state, jax.random.fold_in(jax.random.PRNGKey(1), itr))
            er = float(ev["ep_return"])
            wall = time.time() - t0
            iters.append(itr)
            walls.append(wall)
            train_ret.append(float(metrics["train_ep_return"]))
            eval_ret.append(er)
            steps.append(total)
            print(f"itr {itr:5d} | wall {wall:7.1f}s | "
                  f"steps {total / 1e6:6.1f}M | eval {er:8.2f} | "
                  f"train {train_ret[-1]:8.2f}", flush=True)
            if er > best:
                best = er
                save_checkpoint(str(ckpt_dir), state)

    path = out / f"{name}.npz"
    np.savez(path, iters=np.asarray(iters), wall_s=np.asarray(walls),
             env_steps=np.asarray(steps),
             train_return=np.asarray(train_ret),
             eval_return=np.asarray(eval_ret), algo="recurrent_ppo",
             env=env_name, seed=args.seed)
    print(json.dumps({
        "algo": "recurrent_ppo", "env": env_name,
        "total_env_steps": total, "wall_s": round(walls[-1], 1),
        "eval_return_first": round(eval_ret[0], 2),
        "eval_return_last": round(eval_ret[-1], 2),
        "eval_return_max": round(float(np.max(eval_ret)), 2),
        "curve": str(path), "ckpt": str(ckpt_dir)}))


if __name__ == "__main__":
    main()
