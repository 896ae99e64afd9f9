"""Offline policy evaluation + trajectory dumps.

Replaces the reference's interactive GLFW evaluation path (apex.py:257-280 ->
util/eval.py:17-206, keyboard-driven viewer) with batch deterministic
evaluation and .npz trajectory dumps for offline replay -- the TPU-side
equivalent documented in SURVEY.md section 5 (visualization row).
"""
from __future__ import annotations

import os
import pickle
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np


def load_experiment(path: str):
    """Rebuild (ppo, state) from a run dir containing experiment.pkl +
    checkpoint.pkl (reference loads actor.pt + experiment.pkl,
    apex.py:259-266)."""
    from apex_tpu.agents.ppo import PPO, PPOConfig
    from apex_tpu.envs.registry import env_factory
    from apex_tpu.runtime.checkpoint import load_checkpoint

    with open(os.path.join(path, "experiment.pkl"), "rb") as f:
        exp = pickle.load(f)
    args = SimpleNamespace(**exp)

    env = env_factory(
        getattr(args, "env_name", "Cassie-v0"),
        simrate=getattr(args, "simrate", 50),
        command_profile=getattr(args, "command_profile", "clock"),
        input_profile=getattr(args, "input_profile", "full"),
        learn_gains=getattr(args, "learn_gains", False),
        dynamics_randomization=getattr(args, "dyn_random", False),
        reward=getattr(args, "reward", "early_clock"),
        history=getattr(args, "history", 0),
        estimator=getattr(args, "estimator", "exact"),
        terrain=getattr(args, "terrain", "flat"),
        min_speed=getattr(args, "min_speed", -0.3),
        max_speed=getattr(args, "max_speed", 4.0),
        orient_jump_prob=getattr(args, "orient_jump_prob", 0.0),
        speed_phase_add=getattr(args, "speed_phase_add", False))

    cfg = PPOConfig(
        num_envs=getattr(args, "num_procs", 64),
        num_steps=getattr(args, "num_steps", 5096),
        max_traj_len=getattr(args, "max_traj_len", 400),
        learn_stddev=getattr(args, "learn_stddev", False),
        std_dev=getattr(args, "std_dev", -1.5),
        bounded=getattr(args, "bounded", False),
        use_mirror=getattr(args, "mirror", False))
    ppo = PPO(env, cfg)
    template = ppo.init(seed=0)
    state = load_checkpoint(path, template)
    return ppo, state, args


def eval_checkpoint(path: str, n_episodes: int = 16, traj_len: int = 400,
                    out: str | None = None):
    """Deterministic evaluation of a saved run; prints stats, optionally
    dumps (obs, action, reward) trajectories for offline replay."""
    from apex_tpu.agents.rollout import init_runner, rollout_scan

    ppo, state, _ = load_experiment(path)
    env = ppo.env

    def policy_fn(_, obs):
        return state.actor.act(state.norm, obs, deterministic=True)

    rng = jax.random.PRNGKey(42)
    runner = init_runner(env, rng, n_episodes)
    runner, traj = jax.jit(
        lambda r: rollout_scan(env, policy_fn, r, traj_len, traj_len))(runner)

    n_done = int(jnp.sum(traj.done_ep_len > 0))
    ep_ret = float(jnp.sum(traj.done_ep_return) / max(n_done, 1))
    ep_len = float(jnp.sum(traj.done_ep_len) / max(n_done, 1))
    print(f"episodes: {n_done}  mean return: {ep_ret:.2f}  "
          f"mean length: {ep_len:.1f}")

    if out:
        np.savez_compressed(
            out,
            obs=np.asarray(traj.obs), action=np.asarray(traj.action),
            reward=np.asarray(traj.reward),
            terminated=np.asarray(traj.terminated))
        print(f"wrote trajectory dump: {out}")
    return ep_ret, ep_len


def record_policy(path: str, out: str = "policy_record.npz",
                  n_steps: int = 300, speed: float = 1.0):
    """Record the full control-loop channel set of one deterministic
    rollout: commanded PD targets vs measured motor positions, motor
    velocities, applied torques, ground-reaction forces, foot positions
    and pelvis states (reference plot_policy.py:1-326 captures exactly
    these channels live; here they come from the env's info diagnostics)."""
    ppo, state, _ = load_experiment(path)
    env = ppo.env

    s, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    if hasattr(s, "speed"):
        s = s.replace(speed=jnp.asarray(speed))

    @jax.jit
    def run(s, obs):
        def body(carry, key):
            st, ob = carry
            action = state.actor.act(state.norm, ob, deterministic=True)
            st2, ob2, r, term, info = env.step(st, action, key)
            rec = {
                "pd_target": info["pd_target"],
                "motor_pos": info["motor_pos"],
                "motor_vel": info["motor_vel"],
                "torque": info["motor_torque"],
                "grf": jnp.stack([info["l_foot_frc"],
                                  info["r_foot_frc"]]),
                "foot_pos": info["foot_pos"],
                "qpos": info["qpos"],
                "reward": r,
                "terminated": term,
                "action": action,
            }
            return (st2, ob2), rec

        keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
        _, recs = jax.lax.scan(body, (s, obs), keys)
        return recs

    recs = {k: np.asarray(v) for k, v in run(s, obs).items()}
    recs["speed"] = np.asarray(speed)
    np.savez_compressed(out, **recs)
    print(f"wrote {out}: " + ", ".join(
        f"{k} {v.shape}" for k, v in recs.items() if v.ndim))
    return recs


def dump_gait(path: str, out: str = "gait.npz", n_steps: int = 200,
              speed: float = 1.0):
    """Record qpos of one policy rollout for offline rendering
    (tools/render_gait.py) -- the TPU-side replacement for the live viewer
    (reference cassie_vis_*)."""
    ppo, state, _ = load_experiment(path)
    env = ppo.env

    s, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    if hasattr(s, "speed"):
        s = s.replace(speed=jnp.asarray(speed))

    @jax.jit
    def run(s, obs):
        def body(carry, key):
            st, ob = carry
            action = state.actor.act(state.norm, ob, deterministic=True)
            st2, ob2, _r, _t, _ = env.step(st, action, key)
            return (st2, ob2), st2.phys.qpos

        keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
        _, qpos = jax.lax.scan(body, (s, obs), keys)
        return qpos

    qpos = np.asarray(run(s, obs))
    np.savez_compressed(out, qpos=qpos)
    print(f"wrote {out}: qpos {qpos.shape}")
    return qpos
