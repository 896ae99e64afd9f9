"""Device-mesh utilities: env-axis data parallelism for RL training.

TPU-native replacement for the reference's Ray cluster scale-out
(`ray.init(redis_address=...)`, reference apex.py:130,207,227 + SURVEY.md
section 2.3): environments are sharded along an `env` mesh axis, parameters
replicated, and XLA inserts the psum reductions that replace Ray's
pickled-buffer merges (reference ppo.py:216-235). Multi-host runs use the
same code path via jax.distributed.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "env") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def env_sharding(mesh: Mesh, axis: str = "env") -> NamedSharding:
    """Leading-axis (env-fleet) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_runner(mesh: Mesh, runner, axis: str = "env"):
    """Place a RunnerState: per-env leaves (leading dim == fleet size)
    sharded over the env axis, everything else (rng key, scalars)
    replicated.

    The `rng` leaf is ALWAYS replicated by name: a (2,)-shaped PRNG key
    matches the shape heuristic when the fleet happens to be 2 envs wide,
    which would silently split the key across devices (the bug fixed in
    commit 27b1560)."""
    env_sh = env_sharding(mesh, axis)
    rep = replicated(mesh)
    num_envs = runner.obs.shape[0]
    rng_leaf = getattr(runner, "rng", None)

    def place(x):
        if x is rng_leaf:
            return jax.device_put(x, rep)
        if (getattr(x, "ndim", 0) >= 1 and x.shape[0] == num_envs
                and x.dtype != jax.numpy.uint32):
            return jax.device_put(x, env_sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, runner)


_POGO_XML = """
<mujoco model='pogo'>
  <compiler angle='radian'/>
  <option timestep='0.0005' gravity='0 0 -9.81'/>
  <worldbody>
    <geom name='floor' pos='0 0 0' type='plane' condim='3' conaffinity='15'
          contype='0'/>
    <body name='hopper' pos='0 0 0.3'>
      <inertial pos='0 0 0' mass='2' diaginertia='0.02 0.02 0.02'/>
      <joint name='lift' type='slide' axis='0 0 1' damping='0.5'/>
      <geom type='sphere' size='0.1' contype='1'/>
    </body>
  </worldbody>
  <actuator>
    <motor name='lift' joint='lift' gear='10' ctrlrange='-1 1'/>
  </actuator>
</mujoco>
"""


def mesh_context(mesh: Mesh):
    """Context manager that makes `mesh` visible to
    jax.sharding.get_abstract_mesh() inside jit (jax>=0.8: set_mesh); the
    megakernel dispatch keys its shard_map wrapping off that."""
    if hasattr(jax.sharding, "set_mesh"):
        return jax.sharding.set_mesh(mesh)
    if hasattr(jax.sharding, "use_mesh"):
        return jax.sharding.use_mesh(mesh)
    return mesh


def megakernel_mesh_check(mesh: Mesh, batch: int = 16, length: int = 5):
    """Validate that the whole-substep kernel path partitions along the env
    axis of `mesh` (round-3 Weak #1: the Pallas fast path was never
    exercised under GSPMD).

    Runs the megakernel PD scan (pallas_call on TPU; the emulated generator
    body on CPU -- the full Cassie kernel is impractical to compile on
    2-vCPU CI hosts, so a small hfield-enabled contact model stands in)
    twice: unsharded, and under the mesh context where the dispatch wraps
    the scan in shard_map. Returns (per_device_batch, max_abs_delta);
    callers assert per_device_batch == batch // mesh.size and delta small.
    All substep math is lane-wise, so the sharded run must reproduce the
    unsharded one almost exactly.
    """
    import dataclasses

    import jax.numpy as jnp

    from apex_tpu.physics import fleet_kernel
    from apex_tpu.physics.cassie_sim import PDCommand, _megakernel_pd_scan
    from apex_tpu.physics.engine import HFIELD_RES, PhysParams
    from apex_tpu.physics.mjcf import parse_mjcf_string
    from apex_tpu.utils.terrain import noise_hfield

    model = dataclasses.replace(parse_mjcf_string(_POGO_XML),
                                enable_hfield=True)
    B, nu = batch, model.nu
    params = PhysParams.from_model(model)
    bt = lambda x: jnp.moveaxis(
        jnp.broadcast_to(jnp.asarray(x, jnp.float32),
                         (B,) + jnp.shape(jnp.asarray(x))), 0, -1)
    params_bt = jax.tree_util.tree_map(bt, params)
    rng = jax.random.PRNGKey(0)
    hfs = jax.vmap(lambda k: noise_hfield(k, amplitude=0.05))(
        jax.random.split(rng, B))
    params_bt = params_bt.replace(
        hfield=jnp.moveaxis(hfs, 0, -1),
        hfield_active=(jnp.arange(B) % 2).astype(jnp.float32))
    cmd = PDCommand(p_target=jnp.full((nu, B), 0.05),
                    d_target=jnp.zeros((nu, B)),
                    p_gain=jnp.full((nu, B), 30.0),
                    d_gain=jnp.full((nu, B), 1.0),
                    ff_torque=jnp.zeros((nu, B)))
    qpos0 = jnp.zeros((model.nq, B)) + 0.01 * jax.random.normal(
        jax.random.fold_in(rng, 1), (model.nq, B))
    qvel0 = jnp.zeros((model.nv, B))

    run = jax.jit(lambda p, c, q, v: _megakernel_pd_scan(
        model, p, c, q, v, length))
    ref = run(params_bt, cmd, qpos0, qvel0)
    jax.block_until_ready(ref[0].qpos)

    fleet_kernel.LAST_KERNEL_BATCH = None
    run_mesh = jax.jit(lambda p, c, q, v: _megakernel_pd_scan(
        model, p, c, q, v, length))
    with mesh_context(mesh):
        out = run_mesh(params_bt, cmd, qpos0, qvel0)
        jax.block_until_ready(out[0].qpos)
    per_dev = fleet_kernel.LAST_KERNEL_BATCH
    delta = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(out)))
    return per_dev, delta


def ppo_partition_specs(state, axis: str = "env"):
    """PartitionSpec pytree matching shard_ppo_state's placement: RUNNER
    leaves with leading dim == fleet size sharded on `axis`, everything
    else (params, opt state, normalizer, rng keys -- uint32 guard, see
    shard_runner) replicated. The shape heuristic is restricted to the
    runner subtree: with e.g. 256 envs and (256, 256) MLP hidden layers,
    applying it to the whole state would spuriously shard replicated
    weight matrices and their Adam moments. Works on concrete arrays and
    ShapeDtypeStructs."""
    import jax.numpy as jnp

    num_envs = state.runner.obs.shape[0]
    rng_leaf = getattr(state.runner, "rng", None)

    def spec(x):
        shape = tuple(x.shape)
        if x is rng_leaf:
            return P()
        if (len(shape) >= 1 and shape[0] == num_envs
                and x.dtype != jnp.uint32):
            return P(axis, *([None] * (len(shape) - 1)))
        return P()

    runner_specs = jax.tree_util.tree_map(spec, state.runner)
    rest = jax.tree_util.tree_map(lambda _: P(), state)
    return rest.replace(runner=runner_specs)


def shard_ppo_state(mesh: Mesh, state, axis: str = "env"):
    """Place a PPOTrainState: runner leaves sharded over the env axis,
    everything else (params, opt state, normalizer, rng) replicated."""
    rep = replicated(mesh)
    runner = shard_runner(mesh, state.runner, axis)
    rest = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep),
                                  state.replace(runner=state.runner))
    return rest.replace(runner=runner)
