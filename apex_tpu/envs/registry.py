"""Environment factory (reference util/env.py:8-72).

The reference returns uninstantiated partials because ctypes handles don't
pickle across Ray workers (util/env.py:11-19); here envs are static objects
whose state lives in pytrees, so the factory just constructs them.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

from apex_tpu.envs.base import Env, PointMassEnv


def env_factory(env_name: str, **kwargs) -> Env:
    """Build an environment by registered name.

    Registered names mirror the reference registry (util/env.py:26-61):
    Cassie-v0, CassieTraj-v0, CassiePlayground-v0, CassieStanding-v0, plus
    the framework-native PointMass-v0 test env.
    """
    name = env_name.lower()
    if name in ("cassie-v0", "cassie"):
        from apex_tpu.envs.cassie import CassieEnv

        keys = ("simrate", "command_profile", "input_profile",
                "dynamics_randomization", "learn_gains", "reward", "history",
                "estimator", "estimator_tau", "estimator_noise",
                "terrain", "terrain_amplitude",
                "min_speed", "max_speed", "orient_jump_prob",
                "speed_phase_add")
        return CassieEnv(**{k: v for k, v in kwargs.items() if k in keys})
    if name in ("cassiestanding-v0", "cassiestanding"):
        from apex_tpu.envs.cassie_standing import CassieStandingEnv

        keys = ("simrate",)
        return CassieStandingEnv(**{k: v for k, v in kwargs.items() if k in keys})
    if name in ("cassietraj-v0", "cassietraj"):
        from apex_tpu.envs.cassie_traj import CassieTrajEnv

        keys = ("simrate", "command_profile", "input_profile",
                "dynamics_randomization", "learn_gains", "reward", "history",
                "traj", "no_delta", "ik_baseline")
        return CassieTrajEnv(**{k: v for k, v in kwargs.items() if k in keys})
    if name in ("cassieplayground-v0", "cassieplayground"):
        from apex_tpu.envs.cassie_playground import CassiePlayground

        keys = ("simrate", "mission")
        return CassiePlayground(**{k: v for k, v in kwargs.items() if k in keys})
    if name in ("walker2d-v0", "walker2d-v2", "walker2d"):
        from apex_tpu.envs.walker2d import Walker2dEnv

        return Walker2dEnv()
    if name in ("pointmass-v0", "pointmass"):
        return PointMassEnv()
    # Deliberate divergence from the reference (util/env.py:56-65): there,
    # unknown names fall back to the gym registry and return arbitrary
    # gym envs. Gym envs are host-side stateful objects that cannot run
    # inside the jitted on-device fleet (no pure (state, action, rng) ->
    # (state, obs, ...) step), so this factory is a closed registry; new
    # envs join by implementing envs.base.Env (see walker2d.py for the
    # pattern -- the reference's only documented gym use case).
    raise ValueError(
        f"unknown environment: {env_name} (no gym fallback -- see "
        "env_factory docstring; implement envs.base.Env instead)")
