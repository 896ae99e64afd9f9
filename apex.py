"""apex_tpu experiment launcher.

CLI-compatible rebuild of the reference launcher (reference apex.py:16-255):
same subcommands (ppo, td3_async, td3_sync, ddpg, rdpg, ars, eval) and flag
names, dispatching to jitted on-device training loops instead of Ray worker
pools. `--num_procs` is kept as an alias for the env-fleet size.
"""
import argparse
import os
import sys

# APEX_PLATFORM=cpu forces the host backend (this image pins the TPU
# platform at interpreter start, so a plain JAX_PLATFORMS env var is too
# late -- the config must be updated post-import)
if os.environ.get("APEX_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["APEX_PLATFORM"])


def _common_env_args(parser):
    parser.add_argument("--env_name", default="Cassie-v0")
    parser.add_argument("--simrate", default=50, type=int)
    parser.add_argument("--command_profile", default="clock", type=str)
    parser.add_argument("--input_profile", default="full", type=str)
    parser.add_argument("--dyn_random", default=False, action="store_true")
    parser.add_argument("--learn_gains", default=False, action="store_true")
    parser.add_argument("--reward", default="early_clock", type=str)
    parser.add_argument("--history", default=0, type=int)
    parser.add_argument("--mirror", default=False, action="store_true")
    parser.add_argument("--no_delta", default=True, action="store_true")
    parser.add_argument("--ik_baseline", default=False, action="store_true")
    parser.add_argument("--traj", default="walking", type=str)
    # firmware estimator is the DEFAULT (reference obs are always
    # CassieCoreSim estimator outputs, cassie.py:818-850); opt out with
    # --estimator exact
    parser.add_argument("--estimator", default="firmware", type=str,
                        choices=["exact", "firmware"])
    # round-5 heading curriculum (default OFF = reference parity)
    parser.add_argument("--min_speed", default=-0.3, type=float)
    parser.add_argument("--max_speed", default=4.0, type=float)
    parser.add_argument("--orient_jump_prob", default=0.0, type=float)
    parser.add_argument("--speed_phase_add", default=False,
                        action="store_true")


def _env_kwargs(args):
    return dict(
        simrate=args.simrate, command_profile=args.command_profile,
        input_profile=args.input_profile,
        dynamics_randomization=args.dyn_random,
        learn_gains=args.learn_gains, reward=args.reward,
        history=args.history, traj=getattr(args, "traj", "walking"),
        no_delta=getattr(args, "no_delta", True),
        ik_baseline=getattr(args, "ik_baseline", False),
    )


def main():
    if len(sys.argv) < 2:
        print("usage: apex.py {ppo,td3_sync,td3_async,ddpg,rdpg,ars,eval} ...")
        sys.exit(1)
    from apex_tpu.utils.logo import print_logo

    print_logo()
    cmd = sys.argv[1]
    sys.argv = [sys.argv[0]] + sys.argv[2:]
    parser = argparse.ArgumentParser()

    if cmd == "ppo":
        # flags mirror reference apex.py:214-250
        parser.add_argument("--logdir", type=str, default="./trained_models/ppo/")
        parser.add_argument("--seed", default=0, type=int)
        parser.add_argument("--previous", type=str, default=None)
        parser.add_argument("--exchange_reward", default=None)
        parser.add_argument("--run_name", default=None)
        parser.add_argument("--input_norm_steps", type=int, default=10000)
        parser.add_argument("--n_itr", type=int, default=10000)
        parser.add_argument("--lr", type=float, default=1e-4)
        parser.add_argument("--eps", type=float, default=1e-5)
        parser.add_argument("--lam", type=float, default=0.95)
        parser.add_argument("--gamma", type=float, default=0.99)
        parser.add_argument("--anneal", default=1.0, type=float)
        parser.add_argument("--learn_stddev", default=False, action="store_true")
        parser.add_argument("--std_dev", type=float, default=-1.5)
        parser.add_argument("--entropy_coeff", type=float, default=0.0)
        parser.add_argument("--clip", type=float, default=0.2)
        parser.add_argument("--minibatch_size", type=int, default=64)
        parser.add_argument("--epochs", type=int, default=3)
        parser.add_argument("--num_steps", type=int, default=5096)
        parser.add_argument("--use_gae", default=False, action="store_true")
        parser.add_argument("--num_procs", type=int, default=64,
                            help="env fleet size (vmapped on device)")
        parser.add_argument("--max_grad_norm", type=float, default=0.05)
        parser.add_argument("--max_traj_len", type=int, default=400)
        parser.add_argument("--recurrent", action="store_true")
        parser.add_argument("--bounded", type=bool, default=False)
        _common_env_args(parser)
        args = parser.parse_args()

        from apex_tpu.runtime.log import parse_previous
        args = parse_previous(args)
        from apex_tpu.agents.ppo import run_experiment

        run_experiment(args)

    elif cmd in ("td3_sync", "td3_async"):
        parser.add_argument("--logdir", type=str, default=f"./trained_models/{cmd}/")
        parser.add_argument("--seed", default=0, type=int)
        parser.add_argument("--start_timesteps", default=10000, type=int)
        parser.add_argument("--eval_freq", default=5000, type=int)
        parser.add_argument("--max_timesteps", default=1e7, type=float)
        parser.add_argument("--expl_noise", default=0.1, type=float)
        parser.add_argument("--batch_size", default=64, type=int)
        parser.add_argument("--discount", default=0.99, type=float)
        parser.add_argument("--tau", default=0.005, type=float)
        parser.add_argument("--policy_noise", default=0.2, type=float)
        parser.add_argument("--noise_clip", default=0.5, type=float)
        parser.add_argument("--policy_freq", default=2, type=int)
        parser.add_argument("--a_lr", default=1e-4, type=float)
        parser.add_argument("--c_lr", default=1e-4, type=float)
        parser.add_argument("--num_procs", type=int, default=64)
        parser.add_argument("--max_traj_len", type=int, default=400)
        parser.add_argument("--param_noise", default=False, action="store_true")
        _common_env_args(parser)
        args = parser.parse_args()
        from apex_tpu.agents.td3 import run_experiment

        run_experiment(args, async_mode=(cmd == "td3_async"))

    elif cmd in ("ddpg", "rdpg"):
        parser.add_argument("--logdir", type=str, default=f"./trained_models/{cmd}/")
        parser.add_argument("--seed", default=0, type=int)
        parser.add_argument("--batch_size", default=64, type=int)
        parser.add_argument("--discount", default=0.99, type=float)
        parser.add_argument("--tau", default=0.001, type=float)
        parser.add_argument("--a_lr", default=1e-4, type=float)
        parser.add_argument("--c_lr", default=1e-3, type=float)
        parser.add_argument("--expl_noise", default=0.2, type=float)
        parser.add_argument("--max_timesteps", default=1e7, type=float)
        parser.add_argument("--num_procs", type=int, default=64)
        parser.add_argument("--max_traj_len", type=int, default=400)
        _common_env_args(parser)
        args = parser.parse_args()
        from apex_tpu.agents.dpg import run_experiment

        run_experiment(args, recurrent=(cmd == "rdpg"))

    elif cmd == "ars":
        parser.add_argument("--logdir", type=str, default="./trained_models/ars/")
        parser.add_argument("--seed", default=0, type=int)
        parser.add_argument("--n_itr", type=int, default=1000)
        parser.add_argument("--hidden_size", default=32, type=int)
        parser.add_argument("--deltas", default=64, type=int)
        parser.add_argument("--lr", default=0.01, type=float)
        parser.add_argument("--std", default=0.0075, type=float)
        parser.add_argument("--deltas_used", default=32, type=int)
        parser.add_argument("--num_procs", type=int, default=4)
        parser.add_argument("--max_traj_len", type=int, default=400)
        parser.add_argument("--algo", default="v1", type=str)
        parser.add_argument("--recurrent", action="store_true")
        _common_env_args(parser)
        args = parser.parse_args()
        from apex_tpu.agents.ars import run_experiment

        run_experiment(args)

    elif cmd == "eval":
        parser.add_argument("--path", type=str, required=True,
                            help="run directory with checkpoint.pkl")
        parser.add_argument("--n_episodes", type=int, default=16)
        parser.add_argument("--traj_len", type=int, default=400)
        parser.add_argument("--out", type=str, default=None,
                            help="npz path for trajectory dump")
        parser.add_argument("--gait", type=str, default=None,
                            help="npz path for a qpos gait recording "
                                 "(render with tools/render_gait.py)")
        parser.add_argument("--speed", type=float, default=1.0)
        # behavioral eval suites (reference test_policy.py:49-121 dispatch)
        parser.add_argument("--suite", type=str, default=None,
                            choices=["commands", "perturb", "mission",
                                     "sensitivity", "5k", "compare"])
        parser.add_argument("--pdf", type=str, default=None,
                            help="write the suite report to this PDF")
        parser.add_argument("--compare_to", type=str, default=None,
                            help="second run dir for --suite compare")
        parser.add_argument("--mission", type=str, default="default")
        parser.add_argument("--drive", type=str, default=None,
                            help="timed key-command script (JSON list of "
                                 "[step, key]); the scripted equivalent of "
                                 "the reference's interactive keyboard eval")
        parser.add_argument("--drive_steps", type=int, default=300)
        args = parser.parse_args()
        from apex_tpu.runtime.evaluate import dump_gait, eval_checkpoint

        if args.drive:
            import numpy as np

            from apex_tpu.runtime.drive import drive_policy
            from apex_tpu.runtime.evaluate import load_experiment

            ppo, state, _ = load_experiment(args.path)
            res = drive_policy(state.actor, state.norm, ppo.env, args.drive,
                               n_steps=args.drive_steps)
            print(f"eval reward: {float(res['eval_reward']):.2f}  "
                  f"(steps {args.drive_steps}, falls "
                  f"{int(res['done'].sum())})")
            if args.out:
                np.savez(args.out, **res)
                print("telemetry:", args.out)
            return

        if args.suite:
            from apex_tpu.runtime import eval_suites, report
            from apex_tpu.runtime.evaluate import load_experiment

            if args.suite == "compare":
                res = eval_suites.compare_policies(
                    args.path, args.compare_to,
                    n_episodes=args.n_episodes, traj_len=args.traj_len)
                if args.pdf:
                    print("report:", report.report_compare(res, args.pdf))
                return
            ppo, state, _ = load_experiment(args.path)
            env = ppo.env

            def policy_fn(obs):
                return state.actor.act(state.norm, obs, deterministic=True)

            if args.suite == "perturb":
                res = eval_suites.eval_perturbation(env, policy_fn)
                print("max force per angle:", res["max_force_per_angle"])
                if args.pdf:
                    print("report:",
                          report.report_perturbation(res, args.pdf))
            elif args.suite == "commands":
                res = eval_suites.eval_commands(env, policy_fn)
                print(res)
            elif args.suite == "mission":
                def playground_policy_fn(obs):
                    # playground's command appendix is [sin, cos, speed];
                    # a Cassie-v0 clock policy expects an extra
                    # side_speed (missions command none -> append 0)
                    import jax.numpy as jnp

                    if obs.shape[-1] == env.observation_size - 1:
                        obs = jnp.concatenate(
                            [obs, jnp.zeros(obs.shape[:-1] + (1,))],
                            axis=-1)
                    return state.actor.act(state.norm, obs,
                                           deterministic=True)

                res = eval_suites.eval_mission(playground_policy_fn,
                                               mission=args.mission,
                                               simrate=env.simrate)
                res = {k: v for k, v in res.items()
                       if not hasattr(v, "shape") or v.ndim == 0}
                print(res)
            elif args.suite == "sensitivity":
                res = eval_suites.eval_sensitivity(env, policy_fn)
                print(res)
            elif args.suite == "5k":
                res = eval_suites.eval_5k_matrix(policy_fn, env)
                print("5k pass rate:", res["pass_rate"])
                for ax in ("by_mission", "by_speed", "by_terrain",
                           "by_friction", "by_foot_mass"):
                    print(f"  {ax}:", {k: round(float(v), 3)
                                       for k, v in res[ax].items()})
                if args.pdf:
                    print("report:", report.report_5k(res, args.pdf))
            return

        eval_checkpoint(args.path, n_episodes=args.n_episodes,
                        traj_len=args.traj_len, out=args.out)
        if args.gait:
            dump_gait(args.path, out=args.gait, speed=args.speed)

    else:
        print(f"unknown subcommand {cmd}")
        sys.exit(1)


if __name__ == "__main__":
    main()
