"""Train PPO and record the learning curve + checkpoint (VERDICT round-1
item #3 / round-2 item #1: the north-star wall-clock-to-reward artifact).

Runs the fused PPO loop on Cassie-v0 or Walker2d, logging wall-clock /
env-steps / train return / deterministic eval return, and saves:
  * curves/<name>.npz      -- the curve arrays for the README table;
  * curves/<name>_ckpt/    -- best-eval checkpoint (loadable by
                              runtime.evaluate.load_experiment).

Usage: python tools/train_curve.py {cassie,walker} [options]
  --n-itr N        iterations (default 300)
  --num-envs N     fleet size (default 1024)
  --seed N         (default 0)
  --eval-every N   deterministic eval cadence (default 10)
  --lr F           (default 1e-4)
  --epochs N       (default 3)
  --reward NAME    cassie reward (default early_clock)
  --std F          log-std exponent (default -1.5)
  --name S         artifact name (default {which}_ppo_seed{seed})
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
    ap.add_argument("which", choices=["cassie", "walker", "traj"])
    ap.add_argument("--n-itr", type=int, default=300)
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--steps-per-env", type=int, default=32)
    ap.add_argument("--minibatch", type=int, default=2048)
    ap.add_argument("--reward", default="early_clock")
    ap.add_argument("--std", type=float, default=-1.5)
    ap.add_argument("--max-traj-len", type=int, default=300)
    ap.add_argument("--anneal", type=float, default=1.0)
    ap.add_argument("--dyn-random", action="store_true",
                    help="dynamics randomization ON (the reference's "
                    "flagship training config, cassie.py:567-657)")
    ap.add_argument("--estimator", default="firmware",
                    choices=["exact", "firmware"],
                    help="state-estimator model (firmware = lag+noise "
                    "proxy of CassieCoreSim transients; the default, as "
                    "the reference's obs are always estimator outputs)")
    ap.add_argument("--terrain", default="flat",
                    choices=["flat", "noise", "hill", "steps"])
    ap.add_argument("--terrain-amplitude", type=float, default=0.05)
    ap.add_argument("--simrate", type=int, default=50,
                    help="2 kHz substeps per policy step (reference "
                    "flagship policies shipped at 60)")
    ap.add_argument("--min-speed", type=float, default=-0.3)
    ap.add_argument("--max-speed", type=float, default=4.0)
    ap.add_argument("--orient-jump-prob", type=float, default=0.0,
                    help="heading curriculum: per-step probability of an "
                    "eval-statistics +-U(30,60)deg instant heading jump")
    ap.add_argument("--speed-phase-add", action="store_true",
                    help="couple gait frequency to speed as the command "
                    "eval does (phase_add 1.5 above 1.4 m/s)")
    ap.add_argument("--max-incline", type=float, default=None,
                    help="dyn-rand floor slope range in rad (reference "
                    "default 0.03; the 5k tilt terrains are 3deg=0.052)")
    ap.add_argument("--name", default=None)
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir to continue from (fresh runner; "
                    "parse_previous-style curriculum resume)")
    args = ap.parse_args()

    from apex_tpu.agents.ppo import PPO, PPOConfig
    from apex_tpu.runtime.checkpoint import save_checkpoint

    if args.which == "cassie":
        from apex_tpu.envs.cassie import CassieEnv

        env = CassieEnv(dynamics_randomization=args.dyn_random,
                        reward=args.reward, estimator=args.estimator,
                        terrain=args.terrain,
                        terrain_amplitude=args.terrain_amplitude,
                        simrate=args.simrate,
                        min_speed=args.min_speed, max_speed=args.max_speed,
                        orient_jump_prob=args.orient_jump_prob,
                        speed_phase_add=args.speed_phase_add,
                        **({"max_pitch_incline": args.max_incline,
                            "max_roll_incline": args.max_incline}
                           if args.max_incline is not None else {}))
        env_name = "Cassie-v0"
    elif args.which == "traj":
        # north-star config #5 (BASELINE.json): CassieTraj-v0
        # reference-trajectory PPO on the agility walking trajectory
        from apex_tpu.envs.cassie_traj import CassieTrajEnv

        if args.reward == "early_clock":
            args.reward = "iros_paper"   # traj default; recorded as such
        env = CassieTrajEnv(
            dynamics_randomization=args.dyn_random,
            reward=args.reward, simrate=args.simrate)
        env_name = "CassieTraj-v0"
    else:
        from apex_tpu.envs.walker2d import Walker2dEnv

        env = Walker2dEnv()
        env_name = "Walker2d"
    cfg = PPOConfig(num_envs=args.num_envs,
                    num_steps=args.num_envs * args.steps_per_env,
                    max_traj_len=args.max_traj_len,
                    minibatch_size=args.minibatch,
                    epochs=args.epochs, lr=args.lr, std_dev=args.std)

    name = args.name or f"{args.which}_ppo_seed{args.seed}"
    out = pathlib.Path(__file__).resolve().parent.parent / "curves"
    ckpt_dir = out / f"{name}_ckpt"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    # experiment.pkl so runtime.evaluate.load_experiment can rebuild
    with open(ckpt_dir / "experiment.pkl", "wb") as f:
        pickle.dump({
            "env_name": env_name, "reward": args.reward,
            "num_procs": cfg.num_envs, "num_steps": cfg.num_steps,
            "max_traj_len": cfg.max_traj_len, "std_dev": args.std,
            "mirror": True, "dyn_random": getattr(args, "dyn_random", False),
            "simrate": getattr(args, "simrate", 50),
            "command_profile": "clock", "input_profile": "full",
            "learn_gains": False, "history": 0, "seed": args.seed,
            "estimator": getattr(args, "estimator", "exact"),
            "terrain": getattr(args, "terrain", "flat"),
            "min_speed": getattr(args, "min_speed", -0.3),
            "max_speed": getattr(args, "max_speed", 4.0),
            "orient_jump_prob": getattr(args, "orient_jump_prob", 0.0),
            "speed_phase_add": getattr(args, "speed_phase_add", False),
        }, f)

    ppo = PPO(env, cfg)
    state = ppo.init(seed=args.seed)
    if args.resume:
        from apex_tpu.runtime.checkpoint import load_checkpoint
        from apex_tpu.agents.ppo import set_lr

        state = load_checkpoint(args.resume, state)
        state = state.replace(actor_opt=set_lr(state.actor_opt, args.lr),
                              critic_opt=set_lr(state.critic_opt, args.lr))
        print(f"resumed from {args.resume}", flush=True)
    else:
        state = ppo.prenormalize(state, steps=10000)

    iters, walls, train_ret, eval_ret, eval_len, eplen, steps = \
        [], [], [], [], [], [], []
    total_steps = 0
    anneal = jax.numpy.asarray(1.0)
    best = -np.inf
    t0 = time.time()
    for itr in range(args.n_itr):
        state, metrics = ppo._train_iter(state, anneal)
        anneal = anneal * args.anneal
        if itr % args.eval_every == 0 or itr == args.n_itr - 1:
            ev = ppo._eval_iter(
                state, jax.random.fold_in(jax.random.PRNGKey(1), itr))
            er, el = float(ev["ep_return"]), float(ev["ep_len"])
            total_steps += cfg.rollout_len * cfg.num_envs
            wall = time.time() - t0
            iters.append(itr)
            walls.append(wall)
            train_ret.append(float(metrics["train_ep_return"]))
            eval_ret.append(er)
            eval_len.append(el)
            eplen.append(float(metrics["train_ep_len"]))
            steps.append(total_steps)
            print(f"itr {itr:5d} | wall {wall:8.1f}s | "
                  f"steps {total_steps / 1e6:7.1f}M | eval {er:8.2f} "
                  f"(len {el:5.1f}) | train {train_ret[-1]:8.2f} "
                  f"(len {eplen[-1]:5.1f})", flush=True)
            if er > best:
                best = er
                save_checkpoint(str(ckpt_dir), state)
        else:
            total_steps += cfg.rollout_len * cfg.num_envs

    path = out / f"{name}.npz"
    np.savez(path, iters=np.asarray(iters), wall_s=np.asarray(walls),
             env_steps=np.asarray(steps), train_return=np.asarray(train_ret),
             eval_return=np.asarray(eval_ret), eval_len=np.asarray(eval_len),
             ep_len=np.asarray(eplen), num_envs=args.num_envs,
             steps_per_iter=cfg.rollout_len * args.num_envs)
    summary = {
        "env": args.which, "n_itr": args.n_itr, "num_envs": args.num_envs,
        "seed": args.seed, "reward": args.reward, "lr": args.lr,
        "total_env_steps": total_steps,
        "wall_s": round(walls[-1], 1),
        "env_steps_per_s": round(total_steps / walls[-1], 1),
        "eval_return_first": round(eval_ret[0], 2),
        "eval_return_last": round(eval_ret[-1], 2),
        "eval_return_max": round(float(np.max(eval_ret)), 2),
        "eval_len_max": round(float(np.max(eval_len)), 1),
        "curve": str(path), "ckpt": str(ckpt_dir),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
