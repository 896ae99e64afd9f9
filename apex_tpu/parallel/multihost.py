"""Multi-host (pod-slice) initialization and sharded training helpers.

TPU-native replacement for the reference's Ray cluster path
(`ray.init(redis_address=...)`, apex.py:130/207/227): every host runs the
SAME jitted program; `jax.distributed` forms the global device mesh, the env
fleet shards along the `env` axis (each host steps its local shard over
ICI-connected chips), and XLA's psum reductions replace the driver-side
buffer merges.

Usage (one command per host):
    python -c "from apex_tpu.parallel.multihost import initialize;
               initialize()" ... or call initialize() before building agents,
    then construct PPO with num_envs divisible by jax.device_count() and
    place the train state with parallel.mesh helpers.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var defaults.

    On TPU pods the arguments are auto-detected from the metadata server;
    elsewhere set APEX_COORD_ADDR / APEX_NUM_PROCS / APEX_PROC_ID (the
    moral equivalents of the reference's --redis_address flag).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "APEX_COORD_ADDR")
    if num_processes is None and "APEX_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["APEX_NUM_PROCS"])
    if process_id is None and "APEX_PROC_ID" in os.environ:
        process_id = int(os.environ["APEX_PROC_ID"])
    if coordinator_address is None and num_processes is None:
        # single-process (auto-detected TPU pod or local run)
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single host, nothing to do
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def global_env_count(per_host_envs: int) -> int:
    """Total fleet size across the job."""
    return per_host_envs * jax.process_count()
