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


def _run_steps(env, policy_fn, state, obs, rng, n_steps, fail="term"):
    """Scan the policy through n_steps; returns (state, obs, fallen).

    fail="term" counts the env's own termination (height bounds; the
    perturb suite semantics, eval_perturb.py:59-81). fail="height"
    replicates the reference command-test criterion exactly: ONLY
    qpos[2] < 0.4 fails a trial -- the env's `done` is ignored and
    stepping continues (test_commands.py:113-115)."""

    def body(carry, key):
        st, ob, fallen = carry
        action = policy_fn(ob)
        st2, ob2, _r, term, _ = env.step(st, action, key)
        failed = (st2.phys.qpos[2] < 0.4) if fail == "height" else term
        return (st2, ob2, fallen | failed), None

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
    (:85-88). Pass = qpos[2] never dropped below 0.4: the reference
    worker ignores the env's `done` and keeps stepping (:113-115), so
    reward-cutoff or upper-height terminations do NOT fail a trial."""

    def single(key):
        k_reset, k_sp, k_mag, k_sgn, k_run = jax.random.split(key, 5)
        # deterministic eval start (reference reset_for_test(full_reset=
        # True) + speed=0.5, test_commands.py:69-72): default dynamics,
        # grounded swing-.15/stance-.25 clock held for the whole trial
        # (block speed changes set env.speed DIRECTLY, without the
        # update_speed clock rebuild)
        state, obs = env.reset_for_test(k_reset)
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
                                    half, fail="height")
            # heading increment at block midpoint
            st = st.replace(orient_add=orients[idx])
            st, ob, f2 = _run_steps(env, policy_fn, st, ob,
                                    jax.random.fold_in(k_run, 2 * idx + 1),
                                    steps_per_command - half,
                                    fail="height")
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


DEFAULT_5K_TERRAINS = ("flat", "noise1", "noise2", "noise3", "hill1",
                       "hill2", "hill3", "left_3", "right_3", "up_3",
                       "down_3")


def _terrain_config(name: str, seed: int = 0):
    """Terrain spec -> (needs_hfield, hfield_table_or_None, floor_euler
    (y_pitch, x_roll)).

    Mirrors the reference terrain list (5k_test.py:299-301): the flat
    xml, noisy heightfields (terrains/noise{1,2,3}.npy), rolling-hill
    heightfields (rand_hill{1,2,3}.npy) and 3-degree tilt ramps. Tilt
    signs follow the reference exactly (5k_test.py:35-47): left x=+3deg,
    right x=-3deg, up y=-3deg (uphill along +x with the shared w-positive
    euler2quat convention -- verified numerically against the reference's
    quaternion_function.py). The reference's own down branch is dead code
    (its elif chain tests "right" twice), so down y=+3deg implements the
    evident intent; note a downhill mission at >=0.5 m/s is geometrically
    capped by the ABSOLUTE qpos[2] < 0.4 failure criterion (the pelvis
    drops ~0.05 m per meter travelled), in our harness and the
    reference's alike."""
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
        return False, None, (-tilt, 0.0)
    if name == "down_3":
        return False, None, (tilt, 0.0)
    if name == "left_3":
        return False, None, (0.0, tilt)
    if name == "right_3":
        return False, None, (0.0, -tilt)
    raise ValueError(f"unknown terrain {name}")


def eval_5k_matrix(policy_fn, env,
                   missions=("curvy", "straight", "90_left", "90_right"),
                   mission_speeds=(0.5, 0.9, 1.4, 1.9, 2.3, 2.8),
                   terrains=DEFAULT_5K_TERRAINS,
                   frictions=None,
                   foot_mass_scales=None,
                   max_steps: int = 0,
                   seed: int = 0):
    """The reference's full "5k" robustness matrix, at reference
    semantics (5k_test.py:19-74, 296-311):

      * the trial drives the policy's own TRAINING env (env_fn() from
        experiment.pkl), not the playground: per mission-schedule step it
        applies update_speed(speeds[i]) + orient_add = orients[i] and
        advances through step_basic (no reward, no random command
        changes);
      * dynamics are the model DEFAULTS with the cell's friction /
        foot-mass overrides (reset_for_test restores defaults);
      * the ONLY failure criterion is qpos[2] < 0.4 at any point before
        the schedule ends.

    Default grid = the reference full test (5k_test.py:299-311):
    4 missions x 6 speeds x 11 terrains x 19 frictions (.8x..1.2x) x
    19 foot masses (.8x..1.2x). The shipped reference artifact
    (trained_models/nodelta_.../5k_test.pkl, 17328 entries) covers the
    first TWO terrains (flat + noise1) of this grid; report that subset
    separately when comparing. max_steps > 0 truncates schedules (tests).

    Returns the pass tensor plus per-axis breakdowns (report_stats,
    5k_test.py:230-285)."""
    from apex_tpu.envs.trajectory import CommandTrajectory
    from apex_tpu.utils.quaternion import euler2quat

    if frictions is None:
        frictions = tuple(np.round(np.linspace(0.8, 1.2, 19), 6))
    if foot_mass_scales is None:
        foot_mass_scales = tuple(np.round(np.linspace(0.8, 1.2, 19), 6))
    if not env.model.enable_hfield and any(
            t.startswith(("noise", "hill")) for t in terrains):
        # heightfield terrains need the hfield-enabled model; plane cells
        # run through it identically with hfield_active=0
        import dataclasses as _dc

        env = _dc.replace(env, terrain="noise")

    shape = (len(missions), len(mission_speeds), len(terrains),
             len(frictions), len(foot_mass_scales))
    passed = np.zeros(shape, dtype=bool)

    fr = jnp.asarray(np.repeat(frictions, len(foot_mass_scales)),
                     jnp.float32)
    fm = jnp.asarray(np.tile(foot_mass_scales, len(frictions)), jnp.float32)
    Bcell = fr.shape[0]
    foot_ids = [env.model.body_id("left-foot"),
                env.model.body_id("right-foot")]
    dummy_hf = jnp.zeros_like(jnp.asarray(
        _terrain_config("noise1", seed)[1], jnp.float32))

    def single(speeds, orients, n_real, fric, fmass, hf_table, hf_active,
               ey, ex, key):
        state, obs = env.reset_for_test(key)
        p = state.params
        mass = p.body_mass
        for fid in foot_ids:
            mass = mass.at[fid].multiply(fmass)
        p = p.replace(
            friction=p.friction * fric, body_mass=mass,
            floor_quat=euler2quat(z=jnp.zeros(()), y=ey, x=ex),
            hfield=hf_table, hfield_active=hf_active)
        state = state.replace(params=p)

        def body(carry, cmd):
            st, ob, fallen = carry
            i, sp, orr = cmd
            # reference-exact update_speed incl. the int() phase rescale,
            # whose per-step application FREEZES the gait clock for the
            # length of a mission speed ramp (see update_speed_state
            # docstring) -- the reference's artifact policies were
            # measured under exactly this quirk, so the harness keeps it
            st = env.update_speed_state(st, sp)
            st = st.replace(orient_add=orr)
            st2, ob2 = env.step_basic(st, policy_fn(ob))
            # schedules are padded to the grid max length so every
            # (mission, speed) pair reuses ONE compiled program; steps
            # past the real schedule end cannot fail the trial
            fallen = fallen | ((st2.phys.qpos[2] < 0.4) & (i < n_real))
            return (st2, ob2, fallen), None

        L = speeds.shape[0]
        (_, _, fallen), _ = jax.lax.scan(
            body, (state, obs, jnp.zeros((), bool)),
            (jnp.arange(L), speeds, orients))
        return jnp.logical_not(fallen)

    # one trial per (terrain, friction, foot-mass): terrains fold into the
    # vmapped batch via per-trial hfield tables / tilt angles
    cell_fn = jax.jit(jax.vmap(
        single, in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0)))

    scheds = {}
    for mission in missions:
        for speed in mission_speeds:
            cmd = CommandTrajectory(f"{mission}_{speed}")
            n = cmd.trajlen - 1
            if max_steps:
                n = min(n, max_steps)
            scheds[(mission, speed)] = (cmd.speed_cmd[:n], cmd.orient[:n],
                                        n)
    maxlen = max(v[2] for v in scheds.values())

    n_t = len(terrains)
    hf_tables, hf_act, eys, exs = [], [], [], []
    for terrain in terrains:
        needs_hf, table, euler = _terrain_config(terrain, seed)
        hf_tables.append(jnp.asarray(table, jnp.float32) if needs_hf
                         else dummy_hf)
        hf_act.append(1.0 if needs_hf else 0.0)
        eys.append(euler[0])
        exs.append(euler[1])
    rep = lambda x: jnp.repeat(jnp.asarray(x, jnp.float32), Bcell, axis=0)
    hf_b = rep(jnp.stack(hf_tables))           # (n_t*Bcell, res, res)
    act_b, ey_b, ex_b = rep(hf_act), rep(eys), rep(exs)
    fr_b = jnp.tile(fr, n_t)
    fm_b = jnp.tile(fm, n_t)

    for mi, mission in enumerate(missions):
        for si, speed in enumerate(mission_speeds):
            sp, orr, n = scheds[(mission, speed)]
            sp = np.concatenate([sp, np.full(maxlen - n, sp[-1])])
            orr = np.concatenate([orr, np.full(maxlen - n, orr[-1])])
            key = jax.random.fold_in(jax.random.PRNGKey(seed),
                                     mi * 1000 + si * 100)
            keys = jax.random.split(key, n_t * Bcell)
            cell = np.asarray(cell_fn(
                jnp.asarray(sp, jnp.float32), jnp.asarray(orr, jnp.float32),
                jnp.asarray(n, jnp.int32), fr_b, fm_b, hf_b, act_b, ey_b,
                ex_b, keys))
            passed[mi, si] = cell.reshape(n_t, len(frictions),
                                          len(foot_mass_scales))

    def axis_rate(axis_names, axis):
        keep = tuple(i for i in range(passed.ndim) if i != axis)
        return dict(zip(axis_names, passed.mean(axis=keep)))

    out = {
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
    # the subset the reference artifact actually covers (flat + noise1)
    ref_terr = [t for t in ("flat", "noise1") if t in terrains]
    if ref_terr:
        idx = [terrains.index(t) for t in ref_terr]
        out["pass_rate_ref_subset"] = passed[:, :, idx].mean()
    return out


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
