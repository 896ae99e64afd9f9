"""apex_tpu: a TPU-native deep-RL framework for continuous control of bipedal robots.

A ground-up JAX/XLA re-design of the capabilities of osudrl/apex (reference:
/root/reference). Where the reference pairs PyTorch learners with Ray-distributed
CPU rollout workers stepping a C MuJoCo binding (reference apex.py, rl/algos/*,
cassie/cassiemujoco/*), apex_tpu keeps the entire loop -- physics, environment
logic, reward computation, GAE, and the SGD update -- inside a single jitted XLA
program, vectorized over thousands of environments with `vmap` and sharded over
device meshes with `shard_map`/`pjit`.

Layout (mirrors SURVEY.md section 7):
  core/      pytree dataclasses, config, rng plumbing
  physics/   generalized-coordinate rigid-body engine (Featherstone, pure JAX)
  envs/      Cassie env family + classic control envs, all pure functions
  rewards/   clock/phase spline reward library (precomputed lookup tables)
  models/    actor/critic networks as explicit parameter pytrees
  agents/    PPO, TD3 (sync+interleaved-async), DDPG/RDPG, ARS
  ops/       GAE scans, segment ops, pallas kernels
  parallel/  mesh setup, env-axis sharding, collectives
  runtime/   logging, checkpointing, experiment dirs, eval harnesses
  utils/     quaternions, splines, misc
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bf16 passthrough, which is catastrophically
# imprecise for the physics engine (kinematic matrix chains, Delassus
# solves): full f32 everywhere. The policy/critic nets are tiny, so the
# MXU-throughput cost is negligible at current scales; hot large matmuls
# can opt back down with local jax.default_matmul_precision contexts.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the physics programs are large and compile
# slowly; cache across processes/runs.
import os as _os

_cache_dir = _os.environ.get("APEX_TPU_COMPILE_CACHE", "/tmp/jax_cache")
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
