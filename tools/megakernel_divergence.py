"""Policy-level megakernel divergence bound (VERDICT round-3 #5).

Per-substep parity (tools/check_megakernel.py: qvel 2e-3) is not the bound
that matters for RL -- this measures what does: deterministic eval return /
episode length of the SAME checkpoint under the same seeds, across the
three physics dispatch tiers:

  megakernel  whole-substep Pallas kernel (TPU fast path, the headline)
  fleet       batch-last XLA pipeline (multi-kernel)
  per-env     vmapped per-env engine scan (the reference-shaped tier)

Usage: python tools/megakernel_divergence.py <ckpt_dir> [--envs 64]
           [--steps 300] [--skip-per-env]
Prints one JSON line with returns + relative deltas.
"""
import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def run_mode(path, mode, n_envs, steps):
    """Fresh jit per mode: the dispatch reads env vars at trace time."""
    os.environ["APEX_TPU_NO_MEGAKERNEL"] = "1" if mode != "megakernel" else "0"
    os.environ["APEX_TPU_NO_FLEET"] = "1" if mode == "per-env" else "0"
    os.environ["APEX_TPU_FORCE_MEGAKERNEL"] = (
        "1" if mode == "megakernel" else "0")

    import jax
    import jax.numpy as jnp

    from apex_tpu.agents.rollout import init_runner, rollout_scan
    from apex_tpu.runtime.evaluate import load_experiment

    ppo, state, _ = load_experiment(path)
    env = ppo.env

    def policy_fn(_, obs):
        return state.actor.act(state.norm, obs, deterministic=True)

    runner = init_runner(env, jax.random.PRNGKey(42), n_envs)
    _, traj = jax.jit(
        lambda r: rollout_scan(env, policy_fn, r, steps, steps))(runner)
    n_done = int(jnp.sum(traj.done_ep_len > 0))
    ep_ret = float(jnp.sum(traj.done_ep_return) / max(n_done, 1))
    ep_len = float(jnp.sum(traj.done_ep_len) / max(n_done, 1))
    return {"episodes": n_done, "return": round(ep_ret, 3),
            "ep_len": round(ep_len, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--skip-per-env", action="store_true",
                    help="per-env tier compiles slowly; skip for quick runs")
    args = ap.parse_args()

    modes = ["megakernel", "fleet"]
    if not args.skip_per_env:
        modes.append("per-env")
    out = {}
    for mode in modes:
        out[mode] = run_mode(args.ckpt, mode, args.envs, args.steps)
        print(f"{mode:11s}: {out[mode]}", flush=True)

    base = out["megakernel"]["return"]
    deltas = {
        m: round(abs(out[m]["return"] - base) / max(abs(base), 1e-9), 4)
        for m in modes if m != "megakernel"}
    result = {"ckpt": args.ckpt, "envs": args.envs, "steps": args.steps,
              "results": out, "return_rel_delta_vs_megakernel": deltas}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
