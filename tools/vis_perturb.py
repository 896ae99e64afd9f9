"""Offline push-response visualizer (reference tools/vis_perturb.py, 181
LoC of interactive GLFW viewing, rebuilt as a vmapped batch job + plots).

Applies a pelvis push of --force N from each of --angles directions at each
--phases gait phase, records the pelvis trajectory through recovery, and
writes a figure: per-angle pelvis x/y paths with the push window marked,
plus the survival grid.

Usage: python tools/vis_perturb.py <run_dir> [--force 170] [--angles 4]
       [--phases 0,8,16,24] [--out vis_perturb.png]
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--force", type=float, default=170.0)
    ap.add_argument("--angles", type=int, default=4)
    ap.add_argument("--phases", default="0")
    ap.add_argument("--speed", type=float, default=0.5)
    ap.add_argument("--out", default="vis_perturb.png")
    args = ap.parse_args()

    from apex_tpu.runtime.analysis import perturb_response
    from apex_tpu.runtime.evaluate import load_experiment

    ppo, state, _ = load_experiment(args.run_dir)

    def policy_fn(obs):
        return state.actor.act(state.norm, obs, deterministic=True)

    phases = [int(p) for p in args.phases.split(",")]
    angles = np.linspace(0, 2 * np.pi, args.angles, endpoint=False)
    res = perturb_response(ppo.env, policy_fn, force=args.force,
                           angles=angles, phases=phases, speed=args.speed)

    print(f"force {args.force:.0f} N, speed {args.speed} m/s")
    print("survival grid (rows=angle, cols=phase):")
    for i, a in enumerate(res["angles"]):
        row = " ".join("pass" if s else "FALL"
                       for s in res["survived"][i])
        print(f"  {np.degrees(a):6.1f} deg : {row}")

    np.savez(args.out.replace(".png", ".npz"), **res)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        nA, nP = res["survived"].shape
        fig, axs = plt.subplots(1, 2, figsize=(12, 5))
        w0, w1 = res["push_window"]
        for i in range(nA):
            for j in range(nP):
                xy = res["pelvis"][i, j, :, :2]
                ok = ~res["fallen_seq"][i, j]
                axs[0].plot(xy[ok, 0], xy[ok, 1],
                            alpha=0.7,
                            label=(f"{np.degrees(res['angles'][i]):.0f} deg"
                                   if j == 0 else None))
        axs[0].set_xlabel("pelvis x [m]")
        axs[0].set_ylabel("pelvis y [m]")
        axs[0].legend(fontsize=7)
        axs[0].set_title(f"pelvis paths, {args.force:.0f} N push")
        im = axs[1].imshow(res["survived"].astype(float), cmap="RdYlGn",
                           vmin=0, vmax=1, aspect="auto")
        axs[1].set_xticks(range(nP), [str(p) for p in phases])
        axs[1].set_yticks(range(nA),
                          [f"{np.degrees(a):.0f}" for a in res["angles"]])
        axs[1].set_xlabel("push phase")
        axs[1].set_ylabel("push angle [deg]")
        axs[1].set_title("survival")
        fig.colorbar(im, ax=axs[1])
        fig.savefig(args.out, dpi=120, bbox_inches="tight")
        print(f"wrote {args.out}")
    except Exception as e:
        print(f"(plot skipped: {e})")


if __name__ == "__main__":
    main()
