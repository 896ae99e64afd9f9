"""Component-level timing of the CassieEnv rollout step at fleet scale:
vmapped env.step vs env.reset vs policy forward vs the composed
rollout_scan step. Pinpoints which part bounds the PPO rollout phase.

Usage: python tools/profile_env.py [batch] [iters]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt * 1e6:12.1f} us", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from apex_tpu.agents.ppo import PPO, PPOConfig
    from apex_tpu.agents.rollout import rollout_scan
    from apex_tpu.envs.cassie import CassieEnv

    env = CassieEnv(dynamics_randomization=False, reward="early_clock")
    cfg = PPOConfig(num_envs=B, num_steps=B * 4, max_traj_len=300,
                    minibatch_size=2048, epochs=3)
    ppo = PPO(env, cfg)
    state = ppo.init(seed=0)
    anneal = jnp.asarray(1.0)

    rng = jax.random.PRNGKey(1)
    keys = jax.random.split(rng, B)

    reset_j = jax.jit(lambda k: jax.vmap(env.reset)(k))
    env_state, obs = reset_j(keys)
    act_j = jax.jit(lambda k, o: state.actor.act(
        state.norm, o, rng=k, deterministic=False, anneal=anneal))
    action = act_j(rng, obs)
    step_j = jax.jit(lambda s, a, k: jax.vmap(env.step)(s, a, k))

    def roll1(runner):
        def policy_fn(r, o):
            return state.actor.act(state.norm, o, rng=r,
                                   deterministic=False, anneal=anneal)
        runner, traj = rollout_scan(env, policy_fn, runner, 1, 300)
        return traj.reward

    roll1_j = jax.jit(roll1)

    t_reset = timeit("vmapped env.reset", reset_j, keys, iters=iters)
    t_act = timeit("policy forward (act)", act_j, rng, obs, iters=iters)
    t_step = timeit("vmapped env.step", step_j, env_state, action, keys,
                    iters=iters)
    t_roll1 = timeit("rollout_scan 1 step", roll1_j, state.runner,
                     iters=iters)
    print("-" * 52)
    print(f"step+reset+act                     "
          f"{(t_step + t_reset + t_act) * 1e6:12.1f} us")
    print(f"implied rollout env-steps/s @B={B}: {B / t_roll1:,.0f}")


if __name__ == "__main__":
    main()
