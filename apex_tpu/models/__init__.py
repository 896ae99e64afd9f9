"""Policy/critic networks as explicit JAX parameter pytrees.

Re-designs reference rl/policies/{actor,critic,base}.py (torch nn.Module) as
flax.struct dataclasses over parameter pytrees, so that policies can be
vmapped over env batches, scanned over time, donated, and sharded with zero
framework overhead.
"""
from apex_tpu.models.nets import (
    NormState,
    GaussianFFActor,
    FFActor,
    LinearActor,
    GaussianLSTMActor,
    LSTMActor,
    FFV,
    FFQ,
    DualQCritic,
    LSTMV,
    LSTMQ,
    lstm_init,
    lstm_step,
    lstm_zero_carry,
    normalize_obs,
    normc_init,
    param_count,
    LOG_STD_HI,
    LOG_STD_LO,
)
from apex_tpu.models.distributions import DiagGaussian

__all__ = [
    "NormState", "DiagGaussian", "normalize_obs", "normc_init", "param_count",
    "GaussianFFActor", "FFActor", "LinearActor", "GaussianLSTMActor",
    "LSTMActor",
    "FFV", "FFQ", "DualQCritic", "LSTMV", "LSTMQ",
    "lstm_init", "lstm_step", "lstm_zero_carry",
    "LOG_STD_HI", "LOG_STD_LO",
]
