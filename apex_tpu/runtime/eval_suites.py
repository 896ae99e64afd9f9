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
from apex_tpu.utils.quaternion import quat2euler


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
    n_commands: int = 4,
    steps_per_command: int = 200,
    max_speed: float = 3.0,
    seed: int = 0,
):
    """Random speed/orient schedules with the reference's exact command
    statistics (test_commands.py:66-140): speeds follow a bounded random
    walk from 0.5 m/s with per-command deltas +-U(0.4, 1.3) (sign flipped
    at the bounds), the heading accumulates per-command increments
    +-U(pi/6, pi/3), the speed change lands at each block start while the
    heading increment lands at the block MIDPOINT (staggered cadence,
    :81-93), and the gait frequency bumps to phase_add 1.5 above 1.4 m/s
    (:85-88). Pass = survived the whole schedule."""

    def single(key):
        k_reset, k_sp, k_mag, k_sgn, k_run = jax.random.split(key, 5)
        state, obs = env.reset(k_reset)
        # bounded random-walk speeds (test_commands.py:132-137)
        deltas = (jax.random.uniform(k_sp, (n_commands,), minval=0.4,
                                     maxval=1.3)
                  * jax.random.choice(jax.random.fold_in(k_sp, 1),
                                      jnp.asarray([-1.0, 1.0]),
                                      (n_commands,)))

        def walk(s, d):
            d = jnp.where((s + d < 0.0) | (s + d > max_speed), -d, d)
            return s + d, s + d

        _, speeds = jax.lax.scan(walk, jnp.asarray(0.5), deltas)
        speeds = jnp.concatenate([jnp.asarray([0.5]), speeds[:-1]])
        # cumulative heading increments (test_commands.py:138-140)
        incs = (jax.random.uniform(k_mag, (n_commands,), minval=jnp.pi / 6,
                                   maxval=jnp.pi / 3)
                * jax.random.choice(k_sgn, jnp.asarray([-1.0, 1.0]),
                                    (n_commands,)))
        orients = jnp.cumsum(incs)

        half = steps_per_command // 2

        def command_block(carry, idx):
            st, ob, fallen, fail_idx = carry
            # speed command at block start (+ phase_add bump >1.4 m/s)
            st = st.replace(speed=speeds[idx],
                            phase_add=jnp.where(speeds[idx] > 1.4, 1.5, 1.0))
            st, ob, f1 = _run_steps(env, policy_fn, st, ob,
                                    jax.random.fold_in(k_run, 2 * idx),
                                    half)
            # heading increment at block midpoint
            st = st.replace(orient_add=orients[idx])
            st, ob, f2 = _run_steps(env, policy_fn, st, ob,
                                    jax.random.fold_in(k_run, 2 * idx + 1),
                                    steps_per_command - half)
            f = f1 | f2
            fail_idx = jnp.where(fallen | ~f, fail_idx, idx)
            return (st, ob, fallen | f, fail_idx), None

        (_, _, fallen, fail_idx), _ = jax.lax.scan(
            command_block,
            (state, obs, jnp.zeros((), bool), jnp.asarray(-1, jnp.int32)),
            jnp.arange(n_commands))
        return jnp.logical_not(fallen), fail_idx, speeds, orients

    keys = jax.random.split(jax.random.PRNGKey(seed), n_trials)
    passed, fail_idx, speeds, orients = jax.jit(jax.vmap(single))(keys)
    passed = np.asarray(passed)
    fail_idx = np.asarray(fail_idx)
    speeds = np.asarray(speeds)
    orients = np.asarray(orients)

    # report_stats-level failure aggregation (reference
    # tools/test_commands.py:187-223): classify each failure by whether the
    # SPEED change or the ORIENT change into the failing command was the
    # dominant delta, and report the average failing magnitudes.
    fail_speed, fail_orient = [], []
    speed_fails = orient_fails = 0
    for t in range(n_trials):
        i = fail_idx[t]
        if passed[t] or i < 0:
            continue
        ds = abs(speeds[t, i] - (speeds[t, i - 1] if i > 0 else 0.0))
        do = abs(orients[t, i] - (orients[t, i - 1] if i > 0 else 0.0))
        # normalize deltas by command range to compare the two axes
        if ds / max_speed >= do / (np.pi / 2):
            speed_fails += 1
        else:
            orient_fails += 1
        fail_speed.append(speeds[t, i])
        fail_orient.append(do)
    return {
        "pass_rate": passed.mean(),
        "passed": passed,
        "fail_command_idx": fail_idx,
        "n_speed_fails": speed_fails,
        "n_orient_fails": orient_fails,
        "avg_failing_speed": float(np.mean(fail_speed)) if fail_speed
        else float("nan"),
        "avg_failing_orient_delta": float(np.mean(fail_orient))
        if fail_orient else float("nan"),
    }


def eval_mission(policy_fn, mission: str = "default", simrate: int = 60,
                 max_steps: int = 1200, seed: int = 0):
    """Mission completion on CassiePlayground (reference
    tools/eval_mission.py:45-112): run the command schedule; success = not
    falling before the schedule ends."""
    from apex_tpu.envs.cassie_playground import CassiePlayground

    env = CassiePlayground(mission=mission, simrate=simrate)
    state, obs = env.reset(jax.random.PRNGKey(seed))
    steps = min(max_steps, env.trajlen - 1)

    def body(carry, key):
        st, ob, fallen, progress = carry
        action = policy_fn(ob)
        st2, ob2, _r, term, _ = env.step(st, action, key)
        # schedule steps survived (command_counter itself wraps to 0 when
        # the schedule completes, which mis-reported full runs as 0)
        progress = progress + jnp.logical_not(fallen | term).astype(
            jnp.int32)
        # per-step command-tracking errors (reference eval_mission.py:69-82:
        # pos/speed/orient deviation logged per step until the fall)
        qpos, qvel = st2.phys.qpos, st2.phys.qvel
        cc = st2.command_counter
        pos_err = jnp.linalg.norm(
            qpos[0:2] - (env._cmd_pos[cc, 0:2] + st2.last_position[0:2]))
        speed_err = jnp.abs(jnp.linalg.norm(qvel[0:2])
                            - env._cmd_speed[cc])
        yaw = quat2euler(qpos[3:7])[2]
        orient_err = jnp.abs(yaw - env._cmd_orient[cc])
        alive = jnp.logical_not(fallen | term)
        errs = (pos_err, speed_err, orient_err, alive)
        return (st2, ob2, fallen | term, progress), errs

    keys = jax.random.split(jax.random.PRNGKey(seed + 1), steps)
    (state, obs, fallen, progress), (pos_e, spd_e, ori_e, alive) = jax.jit(
        lambda c, k: jax.lax.scan(body, c, k))(
        (state, obs, jnp.zeros((), bool), jnp.zeros((), jnp.int32)), keys)
    alive = np.asarray(alive)
    n_alive = max(int(alive.sum()), 1)
    mask = alive.astype(np.float64)
    return {"success": bool(~fallen), "progress": int(progress),
            "total": steps,
            # per-step error traces over the alive prefix + summary stats
            # (reference plot_mission_data consumes exactly these columns)
            "pos_error": np.asarray(pos_e), "speed_error": np.asarray(spd_e),
            "orient_error": np.asarray(ori_e), "alive": alive,
            "avg_pos_error": float((np.asarray(pos_e) * mask).sum()
                                   / n_alive),
            "avg_speed_error": float((np.asarray(spd_e) * mask).sum()
                                     / n_alive),
            "avg_orient_error": float((np.asarray(ori_e) * mask).sum()
                                      / n_alive)}


def eval_sensitivity(env_base, policy_fn, param: str = "friction",
                     values=None, n_trials: int = 16,
                     episode_steps: int = 200, seed: int = 0):
    """Dynamics-parameter sensitivity sweep (reference
    tools/eval_sensitivity.py:9-98): fix one parameter across a range,
    report survival rate at each value."""
    if values is None:
        values = {"friction": np.linspace(0.3, 1.3, 6),
                  "mass": np.linspace(0.5, 1.5, 6),
                  "damping": np.linspace(0.3, 4.0, 6)}[param]

    def single(value, key):
        k_reset, k_run = jax.random.split(key)
        state, obs = env_base.reset(k_reset)
        p = state.params
        if param == "friction":
            p = p.replace(friction=value)
        elif param == "mass":
            p = p.replace(body_mass=p.body_mass * value)
        elif param == "damping":
            p = p.replace(dof_damping=p.dof_damping * value)
        state = state.replace(params=p, speed=jnp.asarray(1.0))
        _, _, fallen = _run_steps(env_base, policy_fn, state, obs, k_run,
                                  episode_steps)
        return jnp.logical_not(fallen)

    out = {}
    vv = jnp.asarray(np.repeat(values, n_trials))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(values) * n_trials)
    survived = np.asarray(jax.jit(jax.vmap(single))(vv, keys))
    survived = survived.reshape(len(values), n_trials)
    return {"values": np.asarray(values),
            "survival_rate": survived.mean(axis=1)}


DEFAULT_5K_TERRAINS = ("flat", "noise1", "noise2", "hill1", "hill2",
                       "up_3", "down_3", "left_3", "right_3")


def _terrain_config(name: str, seed: int = 0):
    """Terrain spec -> (needs_hfield, hfield_table_or_None, floor_euler).

    Mirrors the reference terrain list (5k_test.py:302-304): the flat xml,
    noisy heightfields (terrains/noise*.npy), rolling-hill heightfields
    (rand_hill*.npy) and 3-degree tilt ramps (up/down/left/right_3)."""
    import hashlib

    from apex_tpu.utils.terrain import noise_hfield

    # deterministic name->seed: Python's str hash is salted per process
    # (PYTHONHASHSEED), which made heightfields non-reproducible across runs
    digest = int.from_bytes(
        hashlib.sha256(name.encode()).digest()[:4], "little")
    key = jax.random.fold_in(jax.random.PRNGKey(seed), digest)
    tilt = np.deg2rad(3.0)
    if name == "flat":
        return False, None, (0.0, 0.0)
    if name.startswith("noise"):
        return True, np.asarray(noise_hfield(key, amplitude=0.04,
                                             smoothness=2)), (0.0, 0.0)
    if name.startswith("hill"):
        return True, np.asarray(noise_hfield(key, amplitude=0.15,
                                             smoothness=8)), (0.0, 0.0)
    if name == "up_3":
        return False, None, (tilt, 0.0)
    if name == "down_3":
        return False, None, (-tilt, 0.0)
    if name == "left_3":
        return False, None, (0.0, tilt)
    if name == "right_3":
        return False, None, (0.0, -tilt)
    raise ValueError(f"unknown terrain {name}")


def eval_5k_matrix(policy_fn,
                   missions=("straight", "curvy", "90_left", "90_right"),
                   mission_speeds=(0.5, 1.4, 2.8),
                   terrains=DEFAULT_5K_TERRAINS,
                   frictions=(0.8, 1.0, 1.2),
                   foot_mass_scales=(0.8, 1.0, 1.2),
                   simrate: int = 60,
                   max_steps: int = 900,
                   seed: int = 0,
                   env_base=None):
    """The reference's full "5k" robustness matrix (5k_test.py:330-391):
    missions x mission-speeds x terrains (flat / noise+hill heightfields /
    3-degree tilts) x frictions x foot masses. A trial runs the mission's
    command schedule on CassiePlayground; pass = not falling before the
    schedule ends (5k_test.py:19-74).

    frictions / foot_mass_scales are multiples of the model defaults
    (reference sweeps .8x..1.2x, 5k_test.py:307-310). Returns the pass
    tensor plus per-axis pass-rate breakdowns (report_stats,
    5k_test.py:230-285)."""
    from apex_tpu.envs.cassie_playground import CassiePlayground
    from apex_tpu.utils.quaternion import euler2quat

    shape = (len(missions), len(mission_speeds), len(terrains),
             len(frictions), len(foot_mass_scales))
    passed = np.zeros(shape, dtype=bool)

    fr = jnp.asarray(np.repeat(frictions, len(foot_mass_scales)), jnp.float32)
    fm = jnp.asarray(np.tile(foot_mass_scales, len(frictions)), jnp.float32)
    Bcell = fr.shape[0]

    envs = {}   # (mission_name, hfield) -> (env, jitted cell fn)

    def _make_cell_fn(env, needs_hf):
        """One jitted program per (mission, hfield) env, with the
        heightfield table and floor-tilt euler angles as TRACED arguments —
        every terrain in the grid reuses the same compilation instead of
        recompiling the full rollout per cell."""
        foot_ids = [env.model.body_id("left-foot"),
                    env.model.body_id("right-foot")]
        steps = min(max_steps, env.trajlen - 1)

        def single(fric, fmass, hf_table, ey, ex, k):
            k_reset, k_run = jax.random.split(k)
            state, obs = env.reset(k_reset)
            p = state.params
            mass = p.body_mass
            for fid in foot_ids:
                mass = mass.at[fid].multiply(fmass)
            p = p.replace(friction=p.friction * fric, body_mass=mass,
                          floor_quat=euler2quat(z=jnp.zeros(()), y=ey, x=ex))
            if needs_hf:
                p = p.replace(hfield=hf_table,
                              hfield_active=jnp.ones(()))
            state = state.replace(params=p)
            _, _, fallen = _run_steps(env, policy_fn, state, obs, k_run,
                                      steps)
            return jnp.logical_not(fallen)

        return jax.jit(jax.vmap(single,
                                in_axes=(0, 0, None, None, None, 0)))

    dummy_hf = jnp.zeros_like(jnp.asarray(
        _terrain_config("noise1", seed)[1], jnp.float32))

    for mi, mission in enumerate(missions):
        for si, speed in enumerate(mission_speeds):
            mname = f"{mission}_{speed}"
            for ti, terrain in enumerate(terrains):
                needs_hf, table, euler = _terrain_config(terrain, seed)
                ekey = (mname, needs_hf)
                if ekey not in envs:
                    env = CassiePlayground(
                        mission=mname, simrate=simrate, hfield=needs_hf)
                    envs[ekey] = (env, _make_cell_fn(env, needs_hf))
                _, cell_fn = envs[ekey]
                key = jax.random.fold_in(
                    jax.random.PRNGKey(seed), mi * 1000 + si * 100 + ti)
                keys = jax.random.split(key, Bcell)
                hf = (jnp.asarray(table, jnp.float32) if needs_hf
                      else dummy_hf)
                cell = np.asarray(cell_fn(
                    fr, fm, hf, jnp.asarray(euler[0], jnp.float32),
                    jnp.asarray(euler[1], jnp.float32), keys))
                passed[mi, si, ti] = cell.reshape(len(frictions),
                                                  len(foot_mass_scales))

    def axis_rate(axis_names, axis):
        keep = tuple(i for i in range(passed.ndim) if i != axis)
        return dict(zip(axis_names, passed.mean(axis=keep)))

    return {
        "grid": dict(missions=missions, mission_speeds=mission_speeds,
                     terrains=terrains, frictions=frictions,
                     foot_mass_scales=foot_mass_scales),
        "passed": passed,
        "pass_rate": passed.mean(),
        "by_mission": axis_rate(missions, 0),
        "by_speed": axis_rate(mission_speeds, 1),
        "by_terrain": axis_rate(terrains, 2),
        "by_friction": axis_rate(frictions, 3),
        "by_foot_mass": axis_rate(foot_mass_scales, 4),
    }


def compare_policies(path_a: str, path_b: str, n_episodes: int = 32,
                     traj_len: int = 300):
    """Two-policy comparison report (reference tools/compare_pols.py:6-182,
    text instead of PDF)."""
    from apex_tpu.runtime.evaluate import eval_checkpoint

    ra = eval_checkpoint(path_a, n_episodes=n_episodes, traj_len=traj_len)
    rb = eval_checkpoint(path_b, n_episodes=n_episodes, traj_len=traj_len)
    print(f"\n{'':>12} {'return':>10} {'ep_len':>8}")
    print(f"{'policy A':>12} {ra[0]:10.2f} {ra[1]:8.1f}")
    print(f"{'policy B':>12} {rb[0]:10.2f} {rb[1]:8.1f}")
    return {"a": ra, "b": rb}
