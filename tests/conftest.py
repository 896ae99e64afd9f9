"""Test configuration: force CPU with a virtual 8-device mesh.

This image boots every python process through a sitecustomize that imports
jax and registers the single-client axon TPU plugin with JAX_PLATFORMS=axon
already captured by jax.config -- so neither an env var at launch nor
os.environ mutation can switch platforms. The working override is the
post-import config update below. Tests must never touch the TPU tunnel:
two axon clients deadlock each other.

The 8-device host platform validates multi-chip sharding logic
(SURVEY.md section 4: multi-host tests on CPU fake meshes).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the engine's jitted programs are large and
# XLA-CPU compiles them slowly on this 2-vCPU host; cache across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
