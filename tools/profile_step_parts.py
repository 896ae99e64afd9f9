"""Ablation timing of the vmapped CassieEnv.step on the current device:
pd_scan alone, physics-state-only step (tracking/obs DCE'd), reward-only,
and the full step. Pinpoints post-fusion bottlenecks.

Usage: python tools/profile_step_parts.py [batch] [iters]
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
    print(f"{name:40s} {dt * 1e6:12.1f} us", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from apex_tpu.envs.cassie import CassieEnv
    from apex_tpu.physics.cassie_sim import PDCommand, pd_scan

    env = CassieEnv(dynamics_randomization=False, reward="early_clock")
    m = env.model
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    state, obs = jax.jit(jax.vmap(env.reset))(keys)
    action = jnp.zeros((B, 10))
    sk = jax.random.split(jax.random.PRNGKey(2), B)

    # 1. pd_scan alone (fused batch-last loop), final qpos only
    def scan_only(s):
        cmd = jax.vmap(PDCommand.from_targets)(jnp.zeros((B, 10)))
        phys, diag_seq, qvel_seq, qacc_seq = jax.vmap(
            lambda params, phys, c: pd_scan(m, params, phys, c, env.simrate)
        )(s.params, s.phys, cmd)
        return phys.qpos

    t1 = timeit("pd_scan only -> qpos", jax.jit(scan_only), state,
                iters=iters)

    # 2. pd_scan with every seq output materialized
    def scan_all(s):
        cmd = jax.vmap(PDCommand.from_targets)(jnp.zeros((B, 10)))
        out = jax.vmap(
            lambda params, phys, c: pd_scan(m, params, phys, c, env.simrate)
        )(s.params, s.phys, cmd)
        return jax.tree_util.tree_map(lambda x: x.sum(), out)

    t2 = timeit("pd_scan all outputs (summed)", jax.jit(scan_all), state,
                iters=iters)

    # 3. step -> new phys qpos only (reward/obs/tracking DCE-able)
    step_v = jax.vmap(env.step)
    t3 = timeit("step -> qpos only",
                jax.jit(lambda s, a, k: step_v(s, a, k)[0].phys.qpos),
                state, action, sk, iters=iters)

    # 4. step -> reward only
    t4 = timeit("step -> reward only",
                jax.jit(lambda s, a, k: step_v(s, a, k)[2]),
                state, action, sk, iters=iters)

    # 5. step -> obs only
    t5 = timeit("step -> obs only",
                jax.jit(lambda s, a, k: step_v(s, a, k)[1]),
                state, action, sk, iters=iters)

    # 6. full step (all outputs)
    t6 = timeit("full step", jax.jit(step_v), state, action, sk,
                iters=iters)
    print("-" * 56)
    print(f"implied env-steps/s @B={B} (full): {B / t6:,.0f}")


if __name__ == "__main__":
    main()
