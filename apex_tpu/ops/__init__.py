"""Compute primitives: advantage scans, segment ops, pallas kernels."""
from apex_tpu.ops.gae import discounted_returns, gae_advantages

__all__ = ["discounted_returns", "gae_advantages"]
