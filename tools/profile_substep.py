"""Component-level timing of the Cassie physics substep on the current
device: isolates forward kinematics, dynamics (CRBA/RNEA + SPD inverse),
constraint forces, and the full step to show where the 2 kHz budget goes.

Usage: python tools/profile_substep.py [batch]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from apex_tpu.physics import engine
from apex_tpu.physics.cassie_sim import cassie_model
from apex_tpu.ops.linalg import batched_spd_inverse


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt * 1e6:10.1f} us")
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    model = cassie_model()
    params = engine.PhysParams.from_model(model)
    rng = jax.random.PRNGKey(0)
    qpos = jnp.tile(jnp.asarray(model.qpos0), (B, 1))
    qpos = qpos + 0.001 * jax.random.normal(rng, qpos.shape)
    qvel = 0.01 * jax.random.normal(rng, (B, model.nv))
    ctrl = 0.1 * jax.random.normal(rng, (B, model.nu))
    bparams = jax.tree_util.tree_map(
        lambda x: jnp.tile(x, (B,) + (1,) * x.ndim), params)

    fk = jax.jit(jax.vmap(lambda p, q: engine.forward_kinematics(model, p, q)))
    dyn = jax.jit(jax.vmap(
        lambda p, q, v: engine.compute_dynamics(model, p, q, v)))
    full = jax.jit(jax.vmap(
        lambda p, q, v, u: engine.step(model, p, q, v, u)))

    def scan50(p, q, v, u):
        def body(carry, _):
            qp, qv = carry
            out = jax.vmap(lambda pp, a, b, c: engine.step(model, pp, a, b, c)
                           )(p, qp, qv, u)
            return (out.qpos, out.qvel), None
        (qp, qv), _ = jax.lax.scan(body, (q, v), None, length=50)
        return qp, qv

    scan50_j = jax.jit(scan50)

    d = dyn(bparams, qpos, qvel)
    M = d.M + model.timestep * jax.vmap(jnp.diag)(bparams.dof_damping)
    inv = jax.jit(jax.vmap(batched_spd_inverse))  # vmap -> Pallas path

    t_fk = timeit("forward_kinematics", fk, bparams, qpos)
    t_dyn = timeit("compute_dynamics (incl FK+inv)", dyn, bparams, qpos, qvel)
    t_inv = timeit("batched_spd_inverse", inv, M)
    t_step = timeit("full substep", full, bparams, qpos, qvel, ctrl)
    t_scan = timeit("50-substep scan", scan50_j, bparams, qpos, qvel, ctrl,
                    iters=5)
    print(f"{'-' * 48}")
    print(f"constraint+integrate (step-dyn)  {(t_step - t_dyn) * 1e6:10.1f} us")
    print(f"per-substep in scan              {t_scan / 50 * 1e6:10.1f} us")
    print(f"implied env-steps/s @B={B}: {B / t_scan:,.0f}")


if __name__ == "__main__":
    main()
