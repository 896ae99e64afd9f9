"""Phase-level timing of the fused Cassie PPO iteration on the current
device: rollout (env fleet scan) vs returns/advantages vs the epoch x
minibatch SGD scan. Identifies which phase bounds bench.py's headline.

Usage: python tools/profile_ppo.py [num_envs] [rollout_len]
"""
import sys
import time

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} compile+1st {time.perf_counter() - t0:7.1f} s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3:10.2f} ms", flush=True)
    return dt, out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from apex_tpu.agents.ppo import PPO, PPOConfig
    from apex_tpu.agents.rollout import rollout_scan
    from apex_tpu.envs.cassie import CassieEnv

    env = CassieEnv(dynamics_randomization=False, reward="early_clock")
    cfg = PPOConfig(num_envs=B, num_steps=B * T, max_traj_len=300,
                    minibatch_size=2048, epochs=3)
    ppo = PPO(env, cfg)
    state = ppo.init(seed=0)
    anneal = jnp.asarray(1.0)

    def roll(state):
        def policy_fn(rng, obs):
            return state.actor.act(state.norm, obs, rng=rng,
                                   deterministic=False, anneal=anneal)
        runner, traj = rollout_scan(env, policy_fn, state.runner,
                                    cfg.rollout_len, cfg.max_traj_len)
        return runner, traj.reward.sum()

    t_roll, _ = timeit("rollout only", jax.jit(roll), state)

    # _train_iter donates its state argument -> chain it like bench.py does
    t0 = time.perf_counter()
    state, metrics = ppo._train_iter(state, anneal)
    jax.block_until_ready(metrics["kl"])
    print(f"{'full train iteration':28s} compile+1st "
          f"{time.perf_counter() - t0:7.1f} s", flush=True)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = ppo._train_iter(state, anneal)
    jax.block_until_ready(metrics["kl"])
    t_full = (time.perf_counter() - t0) / iters
    print(f"{'full train iteration':28s} {t_full * 1e3:10.2f} ms", flush=True)
    steps = B * T
    print("-" * 48)
    print(f"rollout: {t_roll * 1e3:8.1f} ms  ({steps / t_roll:,.0f} env-steps/s)")
    print(f"update+returns:  {(t_full - t_roll) * 1e3:8.1f} ms")
    print(f"full:    {t_full * 1e3:8.1f} ms  ({steps / t_full:,.0f} env-steps/s)")


if __name__ == "__main__":
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    main()
