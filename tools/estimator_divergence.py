"""Quantify the state-estimator divergence (VERDICT round-2 item #6).

The JAX envs' "exact" estimator returns true sim state; the reference's
CassieCoreSim estimator (include/state_out_t.h:24-78) has transient lag
and measurement noise. This tool measures how sensitive a trained policy
is to that divergence: it evaluates a checkpoint under

  * estimator="exact"                      (the training condition)
  * estimator="firmware" (tau = 12 ms lag)
  * estimator="firmware" + velocity noise sweep

and reports the eval-return/episode-length deltas. Small deltas = the
exact-state substitute is not load-bearing; numbers go into PARITY.md.

Usage: python tools/estimator_divergence.py <run_dir> [--episodes 32]
       [--steps 300] [--cpu]
"""
import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--episodes", type=int, default=32)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from apex_tpu.envs.cassie import CassieEnv
    from apex_tpu.runtime.evaluate import load_experiment

    ppo, state, exp = load_experiment(args.run_dir)

    def policy_fn(obs):
        return state.actor.act(state.norm, obs, deterministic=True)

    def evaluate(env):
        def single(key):
            k_reset, k_run = jax.random.split(key)
            st, ob = env.reset(k_reset)
            # deterministic eval command: walk forward at 1.0 m/s
            st = st.replace(speed=jnp.asarray(1.0),
                            side_speed=jnp.zeros(()))

            def body(carry, key):
                s, o, done, ret, length = carry
                a = policy_fn(o)
                s2, o2, r, term, _ = env.step(s, a, key)
                ret = ret + jnp.where(done, 0.0, r)
                length = length + jnp.where(done, 0, 1)
                return (s2, o2, done | term, ret, length), None

            keys = jax.random.split(k_run, args.steps)
            (_, _, _, ret, length), _ = jax.lax.scan(
                body, (st, ob, jnp.zeros((), bool), jnp.zeros(()),
                       jnp.zeros((), jnp.int32)), keys)
            return ret, length

        keys = jax.random.split(jax.random.PRNGKey(17), args.episodes)
        ret, length = jax.jit(jax.vmap(single))(keys)
        return float(jnp.mean(ret)), float(jnp.mean(length))

    base = dict(dynamics_randomization=False,
                reward=exp.reward if hasattr(exp, "reward") else "early_clock")
    rows = []
    for label, kw in [
        ("exact", {}),
        ("firmware tau=12ms", {"estimator": "firmware"}),
        ("firmware tau=25ms", {"estimator": "firmware",
                               "estimator_tau": 0.025}),
        ("firmware + noise 0.02", {"estimator": "firmware",
                                   "estimator_noise": 0.02}),
        ("firmware + noise 0.05", {"estimator": "firmware",
                                   "estimator_noise": 0.05}),
    ]:
        env = CassieEnv(**base, **kw)
        ret, length = evaluate(env)
        rows.append({"estimator": label, "eval_return": round(ret, 2),
                     "eval_len": round(length, 1)})
        print(f"{label:24s} return {ret:8.2f}  len {length:6.1f}",
              flush=True)

    ref = rows[0]["eval_return"]
    for r in rows[1:]:
        r["return_delta_pct"] = round(
            100.0 * (r["eval_return"] - ref) / max(abs(ref), 1e-9), 1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
