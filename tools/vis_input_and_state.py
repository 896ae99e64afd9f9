"""Estimator-input vs true-state recorder (reference
tools/vis_input_and_state.py, 179 LoC of live viewing, rebuilt as an
offline batch job + plots).

Runs the policy deterministically at --speed, records what the state
estimator feeds the policy (pelvis-relative foot positions, the same
stream the observation is built from) against the true mujoco state, and
plots both with their divergence.

Usage: python tools/vis_input_and_state.py <run_dir> [--speed 2.0]
       [--steps 300] [--out vis_state.png]
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--speed", type=float, default=2.0)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="vis_state.png")
    args = ap.parse_args()

    from apex_tpu.runtime.analysis import input_and_state_record
    from apex_tpu.runtime.evaluate import load_experiment

    ppo, state, _ = load_experiment(args.run_dir)

    def policy_fn(obs):
        return state.actor.act(state.norm, obs, deterministic=True)

    rec = input_and_state_record(ppo.env, policy_fn, n_steps=args.steps,
                                 speed=args.speed)
    print(f"estimator-vs-truth max |foot position| error: "
          f"left {rec['est_lfoot_err']:.2e} m, "
          f"right {rec['est_rfoot_err']:.2e} m")
    fell = np.where(rec["fallen"])[0]
    print("fell at step", fell[0] if len(fell) else "never")

    np.savez(args.out.replace(".png", ".npz"), **rec)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        T = rec["qpos"].shape[0]
        t = np.arange(T)
        fig, axs = plt.subplots(4, 1, figsize=(12, 12), sharex=True)
        axs[0].plot(t, rec["qpos"][:, 2], label="pelvis z (true)")
        axs[0].plot(t, rec["qpos"][:, 0], label="pelvis x (true)")
        axs[0].legend(fontsize=8)
        axs[0].set_ylabel("pelvis [m]")
        for i, lab in enumerate("xyz"):
            axs[1].plot(t, rec["est_lfoot"][:, i], f"C{i}-",
                        label=f"est l {lab}")
            axs[1].plot(t, rec["true_lfoot"][:, i], f"C{i}--",
                        label=f"true l {lab}")
        axs[1].legend(fontsize=7, ncol=3)
        axs[1].set_ylabel("left foot rel pelvis [m]")
        err_l = np.abs(rec["est_lfoot"] - rec["true_lfoot"]).max(axis=1)
        err_r = np.abs(rec["est_rfoot"] - rec["true_rfoot"]).max(axis=1)
        axs[2].semilogy(t, np.maximum(err_l, 1e-12), label="left")
        axs[2].semilogy(t, np.maximum(err_r, 1e-12), label="right")
        axs[2].legend(fontsize=8)
        axs[2].set_ylabel("est-vs-true |err| [m]")
        axs[3].plot(t, rec["reward"])
        axs[3].set_ylabel("reward")
        axs[3].set_xlabel("policy step")
        if len(fell):
            for ax in axs:
                ax.axvline(fell[0], color="r", ls="--", alpha=0.5)
        fig.savefig(args.out, dpi=120, bbox_inches="tight")
        print(f"wrote {args.out}")
    except Exception as e:
        print(f"(plot skipped: {e})")


if __name__ == "__main__":
    main()
