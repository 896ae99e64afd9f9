"""Offline policy-analysis batch jobs (the reference's misc analysis tools).

TPU-native rebuilds of:
  * tools/aslip_tests/GRF_compare.py:16-103   -- per-substep ground-reaction
    force profiles phase-averaged over gait cycles;
  * tools/aslip_tests/parallelized.py:25-130  -- footstep-placement error
    (actual landing position vs the gait library's ideal stride deltas);
  * tools/aslip_tests/taskspace_tracking.py:48-180 -- task-space (COM +
    foot) tracking error per commanded speed;
  * tools/vis_input_and_state.py:44-130       -- estimator-state vs true
    mujoco-state recording over a rollout;
  * tools/vis_perturb.py:96-181               -- push-response trajectory
    recording (offline npz + plots instead of the GLFW viewer).

Each job is ONE jitted vmapped program over a trial fleet instead of the
reference's Ray worker pools; results come back as plain numpy for plotting
(tools/aslip_tests.py, tools/vis_perturb.py wrappers).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _deterministic_state(env, state, speed=None, traj_idx=None):
    """Pin the command state for a deterministic eval (the reference's
    reset_for_test + update_speed, cassie.py:682-768)."""
    upd = dict(side_speed=jnp.zeros(()), orient_add=jnp.zeros(()),
               phase=jnp.zeros(()))
    if speed is not None:
        upd["speed"] = jnp.asarray(speed, jnp.float32)
    if traj_idx is not None and hasattr(state, "traj_idx"):
        ti = jnp.asarray(traj_idx, jnp.int32)
        upd["traj_idx"] = ti
        upd["speed"] = env._speeds[ti]
        upd["phaselen"] = (env._traj_len[ti] - 1).astype(jnp.float32)
    return state.replace(**upd)


def rollout_record(env, policy_fn: Callable, n_steps: int,
                   speed=None, traj_idx=None, seed: int = 0,
                   n_trials: int = 1, pre_state_fn=None):
    """Deterministic-policy rollout recording the full info stream.

    Returns a dict of stacked numpy arrays shaped (n_trials, n_steps, ...):
    the env-step info diagnostics plus reward/fallen/phase/qpos trace."""

    def single(key):
        k_reset, k_run = jax.random.split(key)
        state, obs = env.reset(k_reset)
        state = _deterministic_state(env, state, speed, traj_idx)
        if pre_state_fn is not None:
            state = pre_state_fn(state)
        obs = _rebuild_obs(env, state)

        def body(carry, key):
            st, ob, fallen = carry
            action = policy_fn(ob)
            st2, ob2, r, term, info = env.step(st, action, key)
            out = dict(info, reward=r, fallen=fallen | term,
                       phase=st.phase, speed=st.speed)
            return (st2, ob2, fallen | term), out

        keys = jax.random.split(k_run, n_steps)
        _, seq = jax.lax.scan(body, (state, obs, jnp.zeros((), bool)), keys)
        return seq

    keys = jax.random.split(jax.random.PRNGKey(seed), n_trials)
    seq = jax.jit(jax.vmap(single))(keys)
    return {k: np.asarray(v) for k, v in seq.items()}


def _rebuild_obs(env, state):
    """Rebuild obs after mutating command state (phase/speed pinning)."""
    from apex_tpu.physics.cassie_sim import estimate_state, static_diag

    est = estimate_state(env.model, state.phys,
                         static_diag(env.model, state.params, state.phys))
    obs, _ = env._build_obs(state, est)
    return obs


# ----------------------------------------------------------------------
# GRF profiles (GRF_compare.py:16-103)
# ----------------------------------------------------------------------
def grf_profile(env, policy_fn, speed=1.0, traj_idx=None,
                n_cycles: int = 10, wait_cycles: int = 3,
                seeds=(0, 10, 20)):
    """Phase-averaged per-substep ground-reaction-force profile.

    Runs (wait_cycles + n_cycles) gait cycles at a fixed commanded speed and
    returns the per-substep vertical foot forces folded into gait cycles:
    mean/std over (trials x cycles), shape (cycle_steps*simrate, 2)."""
    if traj_idx is not None:
        plen = int(env._traj_len[traj_idx]) - 1
    else:
        plen = int(np.floor(float(
            getattr(env, "_agility_phaselen", 32))))
    cycle = plen + 1
    n_steps = (wait_cycles + n_cycles) * cycle

    profiles = []
    for seed in seeds:
        rec = rollout_record(env, policy_fn, n_steps, speed=speed,
                             traj_idx=traj_idx, seed=seed)
        grf = rec["grf_seq"][0]          # (n_steps, simrate, 2)
        ok = ~rec["fallen"][0]
        grf = grf[wait_cycles * cycle:]
        ok = ok[wait_cycles * cycle:]
        grf = grf.reshape(n_cycles, cycle * env.simrate, 2)
        okc = ok.reshape(n_cycles, cycle).all(axis=1)
        if okc.any():
            profiles.append(grf[okc])
    if not profiles:
        z = np.zeros((cycle * env.simrate, 2))
        return {"mean": z, "std": z, "cycles_used": 0, "cycle_steps": cycle}
    allp = np.concatenate(profiles, axis=0)
    return {"mean": allp.mean(axis=0), "std": allp.std(axis=0),
            "cycles_used": int(allp.shape[0]), "cycle_steps": cycle}


# ----------------------------------------------------------------------
# Footstep placement error (parallelized.py:25-130)
# ----------------------------------------------------------------------
def foot_placement_error(env, policy_fn, traj_idx: int,
                         num_steps: int = 12, n_trials: int = 8,
                         seed: int = 0, frc_threshold: float = 20.0):
    """Landing-position error vs the gait library's ideal stride deltas.

    The reference computes the ideal next-landing position by adding the
    reference trajectory's stance-to-stance stride vectors (the deltas
    between left/right task-space foot positions at double-stance phases,
    parallelized.py:63-78) to the previous actual landing, then measures
    ||ideal - actual|| at each touchdown. Touchdowns are detected from the
    vertical GRF rising edge instead of hard-coded phase indices."""
    t = int(traj_idx)
    plen = int(env._traj_len[t]) - 1
    lpos = np.asarray(env._task["lpos"][t, :plen + 1])
    rpos = np.asarray(env._task["rpos"][t, :plen + 1])
    cpos = np.asarray(env._task["cpos"][t, :plen + 1])
    # world-frame ref foot positions; stance phases = where each foot is
    # lowest. stride deltas between consecutive opposite-foot stances.
    lw, rw = lpos + cpos, rpos + cpos
    # double-stance detection equivalent: use the phases of min foot height
    lp, rp = int(lw[:, 2].argmin()), int(rw[:, 2].argmin())
    right_to_left = lw[lp, :2] - rw[lp, :2]
    left_to_right = rw[rp, :2] - lw[rp, :2]

    n_env_steps = (num_steps + 4) * (plen + 1)
    rec = rollout_record(env, policy_fn, n_env_steps, traj_idx=t, seed=seed,
                         n_trials=n_trials)
    grf = rec["grf_seq"].mean(axis=2)        # (trials, T, 2) per-step mean
    foot_xy = rec["foot_pos"][..., :2]       # (trials, T, 2 feet, 2)
    fallen = rec["fallen"]

    errors = []
    for tr in range(n_trials):
        land = {0: None, 1: None}            # last actual landing per foot
        in_contact = [True, True]
        warmup = 2 * (plen + 1)
        for step in range(n_env_steps):
            if fallen[tr, step]:
                break
            for f in (0, 1):
                contact = grf[tr, step, f] > frc_threshold
                if contact and not in_contact[f]:
                    actual = foot_xy[tr, step, f]
                    other = land[1 - f]
                    if step > warmup and other is not None:
                        delta = (right_to_left if f == 0 else left_to_right)
                        ideal = other + delta
                        errors.append(float(np.linalg.norm(ideal - actual)))
                    land[f] = actual
                in_contact[f] = contact
    errors = np.asarray(errors)
    return {"errors": errors,
            "mean_error": float(errors.mean()) if errors.size else float("nan"),
            "std_error": float(errors.std()) if errors.size else float("nan"),
            "n_footsteps": int(errors.size),
            "stride_right_to_left": right_to_left,
            "stride_left_to_right": left_to_right}


# ----------------------------------------------------------------------
# Task-space tracking (taskspace_tracking.py:48-180)
# ----------------------------------------------------------------------
def taskspace_tracking(env, policy_fn, traj_indices=None,
                       n_cycles: int = 6, ramp_cycles: int = 2,
                       seed: int = 0):
    """Per-speed task-space tracking error of an aslip policy: RMS error of
    the pelvis-relative foot positions and the COM velocity against the
    gait library references, per commanded speed."""
    if traj_indices is None:
        traj_indices = range(int(env.num_speeds))
    rows = []
    for t in traj_indices:
        t = int(t)
        plen = int(env._traj_len[t]) - 1
        n_steps = (ramp_cycles + n_cycles) * (plen + 1)
        rec = rollout_record(env, policy_fn, n_steps, traj_idx=t, seed=seed)
        sl = slice(ramp_cycles * (plen + 1), None)
        phase = rec["phase"][0, sl].astype(int) % (plen + 1)
        ok = ~rec["fallen"][0, sl]
        ref_l = np.asarray(env._task["lpos"][t])[phase]
        ref_r = np.asarray(env._task["rpos"][t])[phase]
        act_l = rec["est_lfoot_pos"][0, sl]
        act_r = rec["est_rfoot_pos"][0, sl]
        if ok.any():
            err_l = np.sqrt(((act_l - ref_l)[ok] ** 2).sum(-1)).mean()
            err_r = np.sqrt(((act_r - ref_r)[ok] ** 2).sum(-1)).mean()
        else:
            err_l = err_r = float("nan")
        rows.append({"traj_idx": t, "speed": round(0.1 * t, 2),
                     "survived": bool(ok.all()),
                     "lfoot_rms": float(err_l), "rfoot_rms": float(err_r)})
    return rows


# ----------------------------------------------------------------------
# Estimator-state vs true-state recording (vis_input_and_state.py:44-130)
# ----------------------------------------------------------------------
def input_and_state_record(env, policy_fn, n_steps: int = 300,
                           speed: float = 2.0, seed: int = 0):
    """Record the robot's estimated state stream (what the policy sees)
    alongside the true mujoco state over a rollout; returns arrays for
    offline plotting and the estimator-vs-truth deltas."""
    rec = rollout_record(env, policy_fn, n_steps, speed=speed, seed=seed)
    qpos = rec["qpos"][0]                   # (T, 35) true state
    est_l = rec["est_lfoot_pos"][0]
    est_r = rec["est_rfoot_pos"][0]
    true_l = rec["foot_pos"][0, :, 0] - qpos[:, 0:3]
    true_r = rec["foot_pos"][0, :, 1] - qpos[:, 0:3]
    return {
        "qpos": qpos, "reward": rec["reward"][0], "fallen": rec["fallen"][0],
        "est_lfoot": est_l, "est_rfoot": est_r,
        "true_lfoot": true_l, "true_rfoot": true_r,
        "est_lfoot_err": np.abs(est_l - true_l).max(),
        "est_rfoot_err": np.abs(est_r - true_r).max(),
    }


# ----------------------------------------------------------------------
# Push-response recording (vis_perturb.py:96-181)
# ----------------------------------------------------------------------
def perturb_response(env, policy_fn, force: float = 170.0,
                     angles=None, phases=None, speed: float = 0.5,
                     wait_steps: int = 80, perturb_steps: int = 8,
                     recover_steps: int = 120, seed: int = 0):
    """Apply a pelvis push of `force` N at each (angle, phase) and record
    the pelvis trajectory through recovery. Offline equivalent of the
    reference's interactive perturbation visualizer (vis_perturb.py:96-181:
    170 N, 0.2 s pushes over 4 directions at phase-resolved starts)."""
    if angles is None:
        angles = np.linspace(0, 2 * np.pi, 4, endpoint=False)
    if phases is None:
        phases = [0]
    total = wait_steps + perturb_steps + recover_steps

    def single(angle, phase0, key):
        k_reset, k_run = jax.random.split(key)
        state, obs = env.reset(k_reset)
        state = _deterministic_state(env, state, speed=speed)
        state = state.replace(phase=jnp.asarray(phase0, jnp.float32))
        obs = _rebuild_obs(env, state)
        fvec = jnp.concatenate([
            jnp.zeros(3),
            jnp.stack([force * jnp.cos(angle), force * jnp.sin(angle),
                       0.0])])

        def body(carry, inp):
            st, ob, fallen = carry
            i, key = inp
            pushing = (i >= wait_steps) & (i < wait_steps + perturb_steps)
            st = st.replace(params=st.params.replace(
                ext_force=jnp.where(pushing, fvec, jnp.zeros(6))))
            action = policy_fn(ob)
            st2, ob2, _r, term, _ = env.step(st, action, key)
            fallen = fallen | term
            return (st2, ob2, fallen), (st2.phys.qpos[:7], fallen)

        keys = jax.random.split(k_run, total)
        (_, _, fallen), (pelvis, fallen_seq) = jax.lax.scan(
            body, (state, obs, jnp.zeros((), bool)),
            (jnp.arange(total), keys))
        return pelvis, fallen_seq, jnp.logical_not(fallen)

    A, P = np.meshgrid(np.asarray(angles), np.asarray(phases, np.float64),
                       indexing="ij")
    flat_a, flat_p = jnp.asarray(A.ravel()), jnp.asarray(P.ravel())
    keys = jax.random.split(jax.random.PRNGKey(seed), flat_a.shape[0])
    pelvis, fallen_seq, survived = jax.jit(jax.vmap(single))(
        flat_a, flat_p, keys)
    shape = (len(angles), len(phases))
    return {
        "angles": np.asarray(angles), "phases": np.asarray(phases),
        "force": force,
        "pelvis": np.asarray(pelvis).reshape(shape + (total, 7)),
        "fallen_seq": np.asarray(fallen_seq).reshape(shape + (total,)),
        "survived": np.asarray(survived).reshape(shape),
        "push_window": (wait_steps, wait_steps + perturb_steps),
    }
