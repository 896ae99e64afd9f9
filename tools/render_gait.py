"""Offline stick-figure rendering of recorded Cassie gaits.

Replaces the reference's live GLFW viewer (cassie_vis_*, host-side C) with
matplotlib frames generated from qpos dumps (runtime/evaluate.dump_gait):
the kinematic tree is drawn as line segments between body origins in the
sagittal (x-z) plane plus a top view.

Usage: python tools/render_gait.py gait.npz [--out gait.png] [--frames 8]
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("gait", help="npz with qpos (T, 35)")
    ap.add_argument("--out", default="gait.png")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from apex_tpu.physics.cassie_sim import cassie_model
    from apex_tpu.physics.engine import PhysParams, forward_kinematics

    qpos = np.load(args.gait)["qpos"]
    m = cassie_model()
    params = PhysParams.from_model(m)
    fk = jax.jit(jax.vmap(lambda q: forward_kinematics(m, params, q)))

    idx = np.linspace(0, len(qpos) - 1, args.frames).astype(int)
    kin = fk(jnp.asarray(qpos[idx]))
    xpos = np.asarray(kin.xpos) + np.asarray(kin.origin)[:, None, :]

    edges = [(i, int(p)) for i, p in enumerate(m.body_parent) if p >= 0]

    fig, axs = plt.subplots(2, args.frames, figsize=(2.2 * args.frames, 6),
                            sharey="row")
    for f in range(args.frames):
        for view, (a, b_) in enumerate([(0, 2), (0, 1)]):
            ax = axs[view, f]
            for i, p in edges:
                ax.plot([xpos[f, p, a], xpos[f, i, a]],
                        [xpos[f, p, b_], xpos[f, i, b_]],
                        "-o", ms=2, lw=1.2, color="C0")
            if view == 0:
                ax.axhline(-0.01, color="gray", lw=0.5)
                ax.set_ylim(-0.1, 1.3)
                ax.set_title(f"t={idx[f]}")
            ax.set_aspect("equal")
    axs[0, 0].set_ylabel("x-z (side)")
    axs[1, 0].set_ylabel("x-y (top)")
    fig.savefig(args.out, dpi=110, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
