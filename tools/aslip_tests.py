"""ASLIP policy analysis suite: GRF profiles, footstep placement, and
task-space tracking (reference tools/aslip_tests/{GRF_compare.py,
parallelized.py,foot_placement.py,taskspace_tracking.py}, ~1083 LoC of
Ray workers + GLFW, rebuilt as vmapped batch jobs over CassieTraj-v0).

Usage:
  python tools/aslip_tests.py grf        <run_dir> [--speed 1.0] [--out grf.png]
  python tools/aslip_tests.py footplace  <run_dir> [--traj-idx 10]
  python tools/aslip_tests.py taskspace  <run_dir> [--speeds 0,5,10,15,20]

<run_dir> must contain experiment.pkl + checkpoint.pkl (any CassieTraj-v0
aslip run); results are printed and saved as npz/png next to --out.
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def _load(run_dir):
    from apex_tpu.runtime.evaluate import load_experiment

    ppo, state, args = load_experiment(run_dir)
    env = ppo.env

    def policy_fn(obs):
        return state.actor.act(state.norm, obs, deterministic=True)

    return env, policy_fn


def cmd_grf(args):
    from apex_tpu.runtime.analysis import grf_profile

    env, policy_fn = _load(args.run_dir)
    traj_idx = (int(round(args.speed * 10))
                if getattr(env, "aslip", False) else None)
    prof = grf_profile(env, policy_fn, speed=args.speed, traj_idx=traj_idx,
                       n_cycles=args.cycles)
    print(f"cycles used: {prof['cycles_used']}")
    print(f"peak GRF  left {prof['mean'][:, 0].max():7.1f} N   "
          f"right {prof['mean'][:, 1].max():7.1f} N")
    out = args.out or "grf_profile.png"
    np.savez(out.replace(".png", ".npz"), **prof)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t = np.arange(prof["mean"].shape[0]) * 5e-4
        fig, ax = plt.subplots(figsize=(10, 4))
        for i, side in enumerate(("left", "right")):
            m, s = prof["mean"][:, i], prof["std"][:, i]
            ax.plot(t, m, label=side)
            ax.fill_between(t, m - s, m + s, alpha=0.25)
        ax.set_xlabel("gait-cycle time [s]")
        ax.set_ylabel("vertical GRF [N]")
        ax.legend()
        ax.set_title(f"phase-averaged GRF, speed {args.speed} m/s "
                     f"({prof['cycles_used']} cycles)")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        print(f"wrote {out}")
    except Exception as e:  # matplotlib optional
        print(f"(plot skipped: {e})")


def cmd_footplace(args):
    from apex_tpu.runtime.analysis import foot_placement_error

    env, policy_fn = _load(args.run_dir)
    assert getattr(env, "aslip", False), "footplace requires an aslip run"
    idxs = ([args.traj_idx] if args.traj_idx is not None
            else range(int(env.num_speeds)))
    print(f"{'speed':>6} {'footsteps':>10} {'mean err [m]':>13} "
          f"{'std [m]':>9}")
    for t in idxs:
        r = foot_placement_error(env, policy_fn, t,
                                 num_steps=args.steps,
                                 n_trials=args.trials)
        print(f"{0.1 * t:6.1f} {r['n_footsteps']:10d} "
              f"{r['mean_error']:13.4f} {r['std_error']:9.4f}")


def cmd_taskspace(args):
    from apex_tpu.runtime.analysis import taskspace_tracking

    env, policy_fn = _load(args.run_dir)
    assert getattr(env, "aslip", False), "taskspace requires an aslip run"
    idxs = ([int(s) for s in args.speeds.split(",")]
            if args.speeds else None)
    rows = taskspace_tracking(env, policy_fn, traj_indices=idxs)
    print(f"{'speed':>6} {'survived':>9} {'lfoot RMS [m]':>14} "
          f"{'rfoot RMS [m]':>14}")
    for r in rows:
        print(f"{r['speed']:6.1f} {str(r['survived']):>9} "
              f"{r['lfoot_rms']:14.4f} {r['rfoot_rms']:14.4f}")
    if args.out:
        np.savez(args.out, rows=np.asarray(
            [(r["speed"], r["survived"], r["lfoot_rms"], r["rfoot_rms"])
             for r in rows]))
        print(f"wrote {args.out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("grf")
    g.add_argument("run_dir")
    g.add_argument("--speed", type=float, default=1.0)
    g.add_argument("--cycles", type=int, default=10)
    g.add_argument("--out", default=None)
    g.set_defaults(fn=cmd_grf)

    f = sub.add_parser("footplace")
    f.add_argument("run_dir")
    f.add_argument("--traj-idx", type=int, default=None)
    f.add_argument("--steps", type=int, default=12)
    f.add_argument("--trials", type=int, default=8)
    f.set_defaults(fn=cmd_footplace)

    t = sub.add_parser("taskspace")
    t.add_argument("run_dir")
    t.add_argument("--speeds", default=None,
                   help="comma-separated traj indices (default: all 21)")
    t.add_argument("--out", default=None)
    t.set_defaults(fn=cmd_taskspace)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
