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


class BoundedBeta:
    """Beta distribution scaled to (-1, 1) (reference
    rl/distributions/beta.py:10-36: x = 2z - 1 with z ~ Beta(a, b))."""

    @staticmethod
    def sample(rng, alpha, beta):
        z = jax.random.beta(rng, alpha, beta)
        return 2.0 * z - 1.0

    @staticmethod
    def log_prob(alpha, beta, x):
        z = jnp.clip((x + 1.0) / 2.0, 1e-6, 1.0 - 1e-6)
        log_b = (jax.scipy.special.gammaln(alpha)
                 + jax.scipy.special.gammaln(beta)
                 - jax.scipy.special.gammaln(alpha + beta))
        # includes the |dz/dx| = 1/2 change of variables
        return ((alpha - 1.0) * jnp.log(z) + (beta - 1.0) * jnp.log1p(-z)
                - log_b - jnp.log(2.0))

    @staticmethod
    def entropy(alpha, beta):
        dg = jax.scipy.special.digamma
        log_b = (jax.scipy.special.gammaln(alpha)
                 + jax.scipy.special.gammaln(beta)
                 - jax.scipy.special.gammaln(alpha + beta))
        return (log_b - (alpha - 1.0) * dg(alpha) - (beta - 1.0) * dg(beta)
                + (alpha + beta - 2.0) * dg(alpha + beta))

    @staticmethod
    def from_mean_var(mean, var):
        """Beta2 parameterization (reference beta.py:40-104): mean in (0,1),
        variance -> (alpha, beta)."""
        nu = mean * (1.0 - mean) / jnp.maximum(var, 1e-8) - 1.0
        nu = jnp.maximum(nu, 1e-4)
        return mean * nu, (1.0 - mean) * nu
