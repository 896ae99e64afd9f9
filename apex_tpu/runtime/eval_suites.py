"""Behavioral evaluation harnesses as vmapped batch jobs.

Rebuilds the reference's Ray-parallel eval tools (SURVEY.md section 4) as
single jitted programs over env fleets:
  * perturbation robustness (tools/eval_perturb.py:104-200): force sweep
    over directions x gait phases, survival matrix -> max force per angle;
  * command following (tools/test_commands.py:57-173): random speed/orient
    schedules, pass = not falling.

Both operate on a policy function (norm, obs) -> action and a CassieEnv.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from apex_tpu.envs.cassie import CassieEnv, CassieEnvState


def _run_steps(env, policy_fn, state, obs, rng, n_steps):
    """Scan the policy through n_steps; returns (state, obs, fallen)."""

    def body(carry, key):
        st, ob, fallen = carry
        action = policy_fn(ob)
        st2, ob2, _r, term, _ = env.step(st, action, key)
        return (st2, ob2, fallen | term), None

    keys = jax.random.split(rng, n_steps)
    (state, obs, fallen), _ = jax.lax.scan(
        body, (state, obs, jnp.zeros((), bool)), keys)
    return state, obs, fallen


def eval_perturbation(
    env: CassieEnv,
    policy_fn: Callable,
    num_angles: int = 8,
    max_force: float = 200.0,
    force_step: float = 25.0,
    num_phases: int = 4,
    wait_steps: int = 40,           # settle before push (~1 s)
    perturb_steps: int = 8,         # 0.2 s push (eval_perturb.py)
    recover_steps: int = 40,        # must survive this long after
    seed: int = 0,
):
    """Survival matrix over (angle, force, phase); returns dict with the
    matrix and max survivable force per angle (reference compute_perturbs,
    eval_perturb.py:104-200)."""
    angles = np.linspace(0, 2 * np.pi, num_angles, endpoint=False)
    forces = np.arange(force_step, max_force + 1e-6, force_step)
    n_f = len(forces)

    def single(angle, force, phase_idx, key):
        k_reset, k_run1, k_run2, k_run3 = jax.random.split(key, 4)
        state, obs = env.reset(k_reset)
        # deterministic eval command state: walk in place at speed 0.5
        state = state.replace(
            speed=jnp.asarray(0.5), side_speed=jnp.asarray(0.0),
            phase=state.clock.phaselen * phase_idx / num_phases)
        state, obs, fallen0 = _run_steps(env, policy_fn, state, obs,
                                         k_run1, wait_steps)
        # apply the push: world-frame force on the pelvis
        fvec = jnp.concatenate([
            jnp.zeros(3),
            jnp.stack([force * jnp.cos(angle), force * jnp.sin(angle), 0.0])])
        state = state.replace(params=state.params.replace(ext_force=fvec))
        state, obs, fallen1 = _run_steps(env, policy_fn, state, obs,
                                         k_run2, perturb_steps)
        state = state.replace(
            params=state.params.replace(ext_force=jnp.zeros(6)))
        _, _, fallen2 = _run_steps(env, policy_fn, state, obs, k_run3,
                                   recover_steps)
        return jnp.logical_not(fallen0 | fallen1 | fallen2)

    A, F, P = np.meshgrid(angles, forces, np.arange(num_phases),
                          indexing="ij")
    flat_a = jnp.asarray(A.ravel())
    flat_f = jnp.asarray(F.ravel())
    flat_p = jnp.asarray(P.ravel().astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(seed), flat_a.shape[0])

    survived = jax.jit(jax.vmap(single))(flat_a, flat_f, flat_p, keys)
    survived = np.asarray(survived).reshape(num_angles, n_f, num_phases)

    # max force survived at ALL phases, per angle
    all_phases = survived.all(axis=2)
    max_per_angle = np.zeros(num_angles)
    for i in range(num_angles):
        ok = np.where(all_phases[i])[0]
        max_per_angle[i] = forces[ok.max()] if len(ok) else 0.0
    return {
        "angles": angles,
        "forces": forces,
        "survival": survived,
        "max_force_per_angle": max_per_angle,
    }


def eval_commands(
    env: CassieEnv,
    policy_fn: Callable,
    n_trials: int = 64,
    n_commands: int = 6,
    steps_per_command: int = 100,
    max_speed: float = 3.0,
    seed: int = 0,
):
    """Random speed/orient schedules; pass = survived the whole schedule
    (reference test_commands.py:57-123)."""

    def single(key):
        k_reset, k_sched, k_run = jax.random.split(key, 3)
        state, obs = env.reset(k_reset)
        speeds = jax.random.uniform(k_sched, (n_commands,), minval=0.0,
                                    maxval=max_speed)
        orients = jax.random.uniform(
            jax.random.fold_in(k_sched, 1), (n_commands,),
            minval=-jnp.pi / 4, maxval=jnp.pi / 4)

        def command_block(carry, idx):
            st, ob, fallen = carry
            st = st.replace(speed=speeds[idx], orient_add=orients[idx])
            st, ob, f = _run_steps(env, policy_fn, st, ob,
                                   jax.random.fold_in(k_run, idx),
                                   steps_per_command)
            return (st, ob, fallen | f), None

        (_, _, fallen), _ = jax.lax.scan(
            command_block, (state, obs, jnp.zeros((), bool)),
            jnp.arange(n_commands))
        return jnp.logical_not(fallen)

    keys = jax.random.split(jax.random.PRNGKey(seed), n_trials)
    passed = np.asarray(jax.jit(jax.vmap(single))(keys))
    return {"pass_rate": passed.mean(), "passed": passed}
