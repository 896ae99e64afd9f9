"""Mirror-symmetry consistency check for a trained policy.

Rebuild of reference mirror_policy_check.py:112-127 (interactive print of
||M_act(pi(M_obs(s))) - pi(s)||) as a batch job over eval rollouts.

Usage: python tools/mirror_policy_check.py <run_dir> [--steps 200]
"""
import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from apex_tpu.envs.base import mirror_matrix, mirror_clock
    from apex_tpu.runtime.evaluate import load_experiment
    from apex_tpu.agents.rollout import init_runner, rollout_scan

    ppo, state, _ = load_experiment(args.path)
    env = ppo.env
    if env.mirrored_obs is None:
        print("env has no mirror tables")
        sys.exit(1)
    M_obs = jnp.asarray(mirror_matrix(env.mirrored_obs))
    M_act = jnp.asarray(mirror_matrix(env.mirrored_acts))

    def policy_fn(_, obs):
        return state.actor.act(state.norm, obs, deterministic=True)

    runner = init_runner(env, jax.random.PRNGKey(0), 16)
    _, traj = jax.jit(lambda r: rollout_scan(env, policy_fn, r, args.steps,
                                             args.steps))(runner)
    obs = traj.obs.reshape(-1, env.observation_size)

    @jax.jit
    def mirror_err(obs):
        a = state.actor.act(state.norm, obs, deterministic=True)
        mo = obs @ M_obs
        if env.clock_inds:
            mo = mirror_clock(mo, env.clock_inds)
        am = state.actor.act(state.norm, mo, deterministic=True) @ M_act
        return jnp.linalg.norm(a - am, axis=-1)

    err = np.asarray(mirror_err(obs))
    print(f"mirror consistency over {len(err)} states: "
          f"mean {err.mean():.4f}  p95 {np.percentile(err, 95):.4f}  "
          f"max {err.max():.4f}")


if __name__ == "__main__":
    main()
