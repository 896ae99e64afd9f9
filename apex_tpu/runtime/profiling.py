"""Profiling hooks (SURVEY.md §5 tracing row).

The reference instruments wall-clock phases only (ppo.py:382-391 sample/
optimize/eval timers -> TB `Misc/*Times`, kept in our train loops). This
module adds device-level tracing via jax.profiler for kernel-level analysis
in TensorBoard or Perfetto.
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed block:

        with trace("/tmp/apex_trace"):
            state, metrics = ppo._train_iter(state, anneal)
            jax.block_until_ready(metrics["kl"])
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside traced code (shows up in the trace viewer)."""
    return jax.profiler.TraceAnnotation(name)
