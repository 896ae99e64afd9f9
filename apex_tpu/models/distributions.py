"""Action distributions as stateless function bundles.

Parity targets: torch.distributions.Normal usage inside reference actors
(rl/policies/actor.py:204,215,300,308) and rl/distributions/{gaussian,beta}.py.
Implemented as plain functions over (mean, std) arrays so they can live inside
jitted train steps without object overhead.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


class DiagGaussian:
    """Namespace of diagonal-Gaussian ops over broadcastable (mean, std)."""

    @staticmethod
    def sample(rng, mean, std):
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    @staticmethod
    def log_prob(mean, std, x):
        """Per-dimension log density, same shape as x (sum over last axis is
        done by callers, mirroring `log_prob(a).sum(-1)` in reference
        ppo.py:287-289)."""
        z = (x - mean) / std
        return -0.5 * z * z - jnp.log(std) - _LOG_SQRT_2PI

    @staticmethod
    def entropy(std):
        """Per-dimension entropy (reference uses pdf.entropy() elementwise)."""
        return 0.5 + _LOG_SQRT_2PI + jnp.log(std)

    @staticmethod
    def kl(mean_p, std_p, mean_q, std_q):
        """KL(p||q) per dimension, matching torch.distributions.kl_divergence
        for Normal (reference ppo.py:339)."""
        var_ratio = (std_p / std_q) ** 2
        t1 = ((mean_p - mean_q) / std_q) ** 2
        return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))
