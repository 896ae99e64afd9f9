"""Offline policy trajectory plots.

Replaces reference plot_policy.py (326 LoC of live-sim matplotlib capture)
with offline plotting from the .npz trajectory dumps produced by
`apex.py eval --out traj.npz`: actions (PD targets), rewards, termination
raster, and per-dimension observation traces.

Usage: python tools/plot_policy.py traj.npz [--out plots.png] [--env 0]
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("traj", help="npz from apex.py eval --out")
    ap.add_argument("--out", default="policy_plots.png")
    ap.add_argument("--env", type=int, default=0,
                    help="which env of the eval fleet to plot")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f = np.load(args.traj)
    obs, action, reward = f["obs"], f["action"], f["reward"]
    term = f["terminated"]
    e = args.env
    T = obs.shape[0]
    t = np.arange(T)

    fig, axs = plt.subplots(4, 1, figsize=(12, 12), sharex=True)
    axs[0].plot(t, action[:, e])
    axs[0].set_ylabel("actions (PD target deltas)")
    axs[1].plot(t, reward[:, e])
    axs[1].set_ylabel("reward")
    # first termination
    dead = np.where(term[:, e])[0]
    for ax in axs:
        if len(dead):
            ax.axvline(dead[0], color="r", ls="--", alpha=0.5)
    # a few interesting obs dims: pelvis height (0), orientation (1:5)
    axs[2].plot(t, obs[:, e, 0], label="pelvis z")
    axs[2].plot(t, obs[:, e, 1:5])
    axs[2].set_ylabel("pelvis height / orient")
    axs[2].legend(loc="upper right", fontsize=7)
    axs[3].plot(t, obs[:, e, 5:15])
    axs[3].set_ylabel("motor positions")
    axs[3].set_xlabel("policy step")
    fig.suptitle(f"{args.traj} (env {e})")
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
