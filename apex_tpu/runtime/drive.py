"""Scripted command-driving eval: the reference's interactive keyboard
eval (util/eval.py:17-206), with the keyboard replaced by a timed script.

The reference drives a live policy with single-key commands while a GLFW
window renders. On TPU there is no interactive viewer (SURVEY section 5
visualization row); the equivalent surface is a SCRIPT of the same key
protocol applied at given control steps, with the full telemetry recorded
for offline replay/plotting (tools/render_gait.py, tools/plot_policy.py).

Key protocol (identical bindings to util/eval.py:110-166):
  w/s  speed +/- 0.1           a/d  side speed -/+ 0.02
  j/h  phase_add +/- 0.1       k/l  orient_add +/- 0.1
  x/z  swing duration +/- 0.01 v/c  stance duration +/- 0.01
  1/2/3 stance mode zero/grounded/aerial (rebuilds the gait clock)
  r    reset the environment   p    100 N upward push (apply_force z)
  t    slowmo (ignored: no realtime rendering)

A script is a list of [step, key] pairs (or a JSON file of the same),
e.g. [[10, "w"], [10, "w"], [40, "k"], [80, "p"], [120, "r"]].

Example:
    from apex_tpu.runtime.drive import drive_policy
    out = drive_policy(actor, norm, env, script, n_steps=300)
    np.savez("drive.npz", **out)
"""
from __future__ import annotations

import json
from typing import Dict, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

KEY_DOC = "w s a d j h k l x z v c 1 2 3 r p t"


def load_script(path_or_list) -> List[Tuple[int, str]]:
    if isinstance(path_or_list, str):
        with open(path_or_list) as f:
            raw = json.load(f)
    else:
        raw = path_or_list
    script = [(int(t), str(k)) for t, k in raw]
    return sorted(script, key=lambda e: e[0])


def _apply_key(env, state, key: str, rng):
    """Apply one keyboard command to the env state (util/eval.py:110-166
    semantics)."""
    from apex_tpu.rewards.clock import build_clock

    if key == "w":
        return state.replace(speed=state.speed + 0.1)
    if key == "s":
        return state.replace(speed=state.speed - 0.1)
    if key == "d":
        return state.replace(side_speed=state.side_speed + 0.02)
    if key == "a":
        # upstream quirk kept: the 'a' binding subtracts 0.0 (a dead key,
        # util/eval.py:119 "side_speed -= 0.")
        return state.replace(side_speed=state.side_speed - 0.0)
    if key == "j":
        return state.replace(phase_add=state.phase_add + 0.1)
    if key == "h":
        return state.replace(phase_add=state.phase_add - 0.1)
    if key == "l":
        return state.replace(orient_add=state.orient_add - 0.1)
    if key == "k":
        return state.replace(orient_add=state.orient_add + 0.1)
    if key in "xzvc123":
        swing = state.swing_duration
        stance = state.stance_duration
        mode = state.stance_mode
        if key == "x":
            swing = swing + 0.01
        elif key == "z":
            swing = swing - 0.01
        elif key == "v":
            stance = stance + 0.01
        elif key == "c":
            stance = stance - 0.01
        elif key == "1":
            mode = jnp.asarray([0.0, 0.0, 1.0])    # zero
        elif key == "2":
            mode = jnp.asarray([1.0, 0.0, 0.0])    # grounded
        elif key == "3":
            mode = jnp.asarray([0.0, 1.0, 0.0])    # aerial
        clock = build_clock(swing, stance, mode, env.strict_relaxer,
                            env.have_incentive, float(env._freq))
        return state.replace(swing_duration=swing, stance_duration=stance,
                             stance_mode=mode, clock=clock)
    if key == "r":
        return env.reset(rng)     # (state, obs) -- caller special-cases
    if key == "p":
        # 100 N upward push (util/eval.py:158-162: force_arr[2] = 100 in
        # xfrc [force, torque] order -> our ext_force is [torque, force])
        ext = state.params.ext_force.at[5].set(100.0)
        return state.replace(params=state.params.replace(ext_force=ext))
    if key == "t":
        return state    # slowmo: no realtime rendering to slow down
    raise ValueError(f"unknown drive key {key!r} (one of: {KEY_DOC})")


def drive_policy(actor, norm, env, script, n_steps: int = 300,
                 seed: int = 0, start_speed: float = 0.0) -> Dict:
    """Run a deterministic policy through a timed command script.

    Mirrors the reference loop (util/eval.py:96-200): starts from a reset
    with commanded speed `start_speed` (their reset_for_test semantics),
    applies each scripted key at its control step, steps the env at 40 Hz,
    and records per-step telemetry. Pushes persist (the reference's
    apply_force also persists until overwritten).

    Returns a dict of arrays: qpos (T, nq), speed/side_speed/orient_add/
    phase/phase_add/reward/eval_reward (T,), done flags, foot forces.
    """
    script = load_script(script)
    rng = jax.random.PRNGKey(seed)
    rng, k0 = jax.random.split(rng)
    state, obs = jax.jit(env.reset)(k0)
    state = state.replace(speed=jnp.asarray(start_speed),
                          side_speed=jnp.asarray(0.0),
                          orient_add=jnp.zeros(()))

    step_j = jax.jit(env.step)

    def policy_fn(o):
        return actor.act(norm, o, rng=None, deterministic=True)

    policy_j = jax.jit(policy_fn)

    by_step: Dict[int, List[str]] = {}
    for t, k in script:
        by_step.setdefault(t, []).append(k)

    rec = {k: [] for k in ("qpos", "speed", "side_speed", "orient_add",
                           "phase", "phase_add", "reward", "done",
                           "l_foot_frc", "r_foot_frc")}
    reset_j = jax.jit(env.reset)
    eval_reward = 0.0
    for t in range(n_steps):
        for key in by_step.get(t, ()):
            rng, kr = jax.random.split(rng)
            if key == "r":
                state, obs = reset_j(kr)
            else:
                state = _apply_key(env, state, key, kr)
        action = policy_j(obs)
        rng, ks = jax.random.split(rng)
        state, obs, reward, done, info = step_j(state, action, ks)
        eval_reward += float(reward)
        rec["qpos"].append(np.asarray(state.phys.qpos))
        rec["speed"].append(float(state.speed))
        rec["side_speed"].append(float(state.side_speed))
        rec["orient_add"].append(float(state.orient_add))
        rec["phase"].append(float(state.phase))
        rec["phase_add"].append(float(state.phase_add))
        rec["reward"].append(float(reward))
        rec["done"].append(bool(done))
        rec["l_foot_frc"].append(float(info["l_foot_frc"]))
        rec["r_foot_frc"].append(float(info["r_foot_frc"]))
    out = {k: np.asarray(v) for k, v in rec.items()}
    out["eval_reward"] = np.asarray(eval_reward)
    return out
