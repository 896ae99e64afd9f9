"""CassieTrajEnv: reference-trajectory tracking environment, pure JAX.

Rebuild of reference cassie/cassie_traj.py (1196 LoC): CassieEnv plus
  * Agility 2 kHz reference trajectories ("walking"/"stepping") or the
    21-speed ASLIP task-space gait library with IK-net joint targets
    (cassie_traj.py:62-76);
  * delta vs no_delta action modes (PD offset = reference motor positions vs
    the fixed neutral offset) and ik_baseline (offset = IKNet output at the
    current substep) (step_simulation, cassie_traj.py:346-357);
  * command profiles clock / phase / traj, the last appending the
    next-phase reference state to the observation (40-dim agility slice or
    18-dim aslip task state; set_up_state_space, cassie_traj.py:274-331);
  * resets onto the reference trajectory at a random phase
    (cassie_traj.py:750-760);
  * the iros_paper joint/com/orientation/spring tracking reward
    (rewards/iros_paper_reward.py:3-59) alongside the clock family.

ASLIP trajectories have per-speed lengths; they are padded to a common
length with a static per-speed length table so speed is a runtime value.
"""
from __future__ import annotations

import dataclasses
from math import floor
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from apex_tpu.envs.base import Env
from apex_tpu.envs.cassie import (
    MIRROR_ACTS,
    MIRROR_ACTS_GAINS,
    MIRROR_OBS_FULL,
    MIRROR_OBS_MIN,
    NEUTRAL_FOOT_ORIENT,
)
from apex_tpu.envs.trajectory import (
    CassieTrajectory,
    get_all_aslip_trajectories,
)
from apex_tpu.physics.cassie_sim import (
    CassiePhysState,
    DEFAULT_D_GAIN,
    DEFAULT_P_GAIN,
    MOTOR_QPOS_IDX,
    NEUTRAL_OFFSET,
    PDCommand,
    cassie_model,
    estimate_state,
    pd_scan,
    static_diag,
)
from apex_tpu.physics.engine import PhysParams
from apex_tpu.rewards.clock import (
    REWARD_FUNCS,
    RewardInputs,
    STANCE_AERIAL,
    STANCE_GROUNDED,
    STANCE_ZERO,
    build_clock,
    speed_to_durations,
)
from apex_tpu.utils.quaternion import euler2quat, quat_inverse, quat_mul, quat_rotate

# obs slices of the reference state (cassie.py:103-104)
POS_INDEX = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 14, 15, 16, 20, 21, 22, 23,
                      28, 29, 30, 34])
VEL_INDEX = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 12, 13, 14, 18, 19, 20, 21,
                      25, 26, 27, 31])

# mirrored ref-traj index lists (cassie_traj.py:317-324)
MIRROR_TRAJ_ASLIP = [6, 7, 8, 9, 10, 11, 0.1, 1, 2, 3, 4, 5, 12, 13, 14, 15,
                     16, 17]
MIRROR_TRAJ_AGILITY = [0.1, 1, 2, 3, 4, 5, -13, -14, 15, 16, 17, 18, 19, -6,
                       -7, 8, 9, 10, 11, 12, 20, 21, 22, 23, 24, 25, -33,
                       -34, 35, 36, 37, 38, 39, -26, -27, 28, 29, 30, 31, 32]


@struct.dataclass
class CassieTrajEnvState:
    phys: CassiePhysState
    params: PhysParams
    clock: jnp.ndarray        # packed GaitClock arrays or zeros (traj mode)
    clock_y: jnp.ndarray
    clock_d: jnp.ndarray
    phaselen: jnp.ndarray
    phase: jnp.ndarray
    counter: jnp.ndarray
    time: jnp.ndarray
    simsteps: jnp.ndarray
    traj_idx: jnp.ndarray     # aslip speed index (0 for agility)
    speed: jnp.ndarray
    side_speed: jnp.ndarray
    orient_add: jnp.ndarray
    swing_duration: jnp.ndarray
    stance_duration: jnp.ndarray
    stance_mode: jnp.ndarray
    motor_enc_noise: jnp.ndarray
    joint_enc_noise: jnp.ndarray
    prev_action: jnp.ndarray
    prev_torque: jnp.ndarray
    obs_history: jnp.ndarray


@dataclasses.dataclass
class CassieTrajEnv(Env):
    traj: str = "walking"                # walking | stepping | aslip
    simrate: int = 50
    command_profile: str = "clock"       # clock | phase | traj
    input_profile: str = "full"
    dynamics_randomization: bool = True
    learn_gains: bool = False
    reward: str = "iros_paper"
    no_delta: bool = True
    ik_baseline: bool = False
    history: int = 0
    max_speed: float = 4.0
    min_speed: float = -0.3
    max_side_speed: float = 0.3
    min_side_speed: float = -0.3
    max_orient_change: float = 0.2
    damping_low: float = 0.3
    damping_high: float = 5.0
    mass_low: float = 0.5
    mass_high: float = 1.5
    fric_low: float = 0.4
    fric_high: float = 1.1
    max_pitch_incline: float = 0.03
    max_roll_incline: float = 0.03
    encoder_noise: float = 0.01
    strict_relaxer: float = 0.1
    clock_based: bool = True

    def __post_init__(self):
        self.model = cassie_model()
        self.aslip = self.traj == "aslip"
        self.clock_based = self.command_profile == "clock"

        if self.aslip:
            trajs = get_all_aslip_trajectories()
            self.num_speeds = len(trajs)
            maxlen = max(t.length for t in trajs)
            def pad(arrs):
                out = np.zeros((len(trajs), maxlen) + arrs[0].shape[1:],
                               np.float32)
                for i, a in enumerate(arrs):
                    out[i, :len(a)] = a
                    out[i, len(a):] = a[-1]
                return out
            self._traj_qpos = jnp.asarray(pad([t.qpos for t in trajs]))
            self._traj_ik = jnp.asarray(pad([t.ik_pos for t in trajs]))
            self._task = {
                k: jnp.asarray(pad([getattr(t, k) for t in trajs]))
                for k in ("rpos", "rvel", "lpos", "lvel", "cpos", "cvel")}
            self._traj_len = jnp.asarray([t.length for t in trajs], jnp.int32)
            self._traj_x_span = jnp.asarray(
                [t.qpos[-1, 0] - t.qpos[0, 0] for t in trajs])
            self._speeds = jnp.asarray([0.1 * i for i in range(21)])
        else:
            trajectory = CassieTrajectory(self.traj)
            self._traj_qpos = jnp.asarray(trajectory.qpos)
            self._traj_qvel = jnp.asarray(trajectory.qvel)
            self._x_span = float(trajectory.qpos[-1, 0]
                                 - trajectory.qpos[0, 0])
            self._agility_phaselen = float(
                floor(len(trajectory) / self.simrate) - 1)

        base = 46 if self.input_profile == "full" else 21
        if self.command_profile == "clock":
            ext = 4
        elif self.command_profile == "phase":
            ext = 9
        else:
            ext = 18 if self.aslip else 40
        self._base_obs = base + ext
        self.observation_size = self._base_obs * (1 + self.history)
        self.action_size = 30 if self.learn_gains else 10
        self.mirrored_acts = (MIRROR_ACTS_GAINS if self.learn_gains
                              else MIRROR_ACTS)
        base_mir = (MIRROR_OBS_FULL if self.input_profile == "full"
                    else MIRROR_OBS_MIN)
        if self.command_profile in ("clock", "phase"):
            append = list(range(len(base_mir), self._base_obs))
            self.mirrored_obs = list(base_mir) + append
            self.clock_inds = [len(base_mir), len(base_mir) + 1]
        else:
            # signed ref-traj mirror with offset (cassie_traj.py:325-327)
            mt = MIRROR_TRAJ_ASLIP if self.aslip else MIRROR_TRAJ_AGILITY
            obs_size = base
            shifted = [np.sign(m) * (obs_size + np.floor(abs(m))) for m in mt]
            self.mirrored_obs = list(base_mir) + shifted
            self.clock_inds = None

        # reward dispatch: reference-trajectory tracking rewards or the
        # clock family. trajmatch_reward (rewards/trajmatch_reward.py:3-75)
        # is numerically identical to iros_paper_reward (same 30x weights
        # and 0.5/0.3/0.1/0.1 mix; its phase-interpolation preamble is
        # overwritten at :18), so both share _iros_reward.
        self.have_incentive = "no_incentive" not in self.reward
        self._iros = self.reward in ("iros_paper", "trajmatch",
                                     "trajmatch_reward")
        self._trajmatch_fo = self.reward in (
            "trajmatch_footorient_hiprollvelact",
            "trajmatch_footorient_hiprollvelact_reward")
        self._jonah = self.reward in ("jonah_RNN", "jonah_RNN_reward")
        if "early" in self.reward:
            self._reward_key = "early_clock"
        elif "no_speed" in self.reward:
            self._reward_key = "no_speed_clock"
        elif "max_vel" in self.reward:
            self._reward_key = "max_vel_clock"
        else:
            self._reward_key = "clock"
        if "grounded" in self.reward:
            self._stance_mode = STANCE_GROUNDED
        elif "aerial" in self.reward:
            self._stance_mode = STANCE_AERIAL
        else:
            self._stance_mode = STANCE_ZERO

        self._freq = 2000 // self.simrate
        self._offset = jnp.asarray(NEUTRAL_OFFSET)
        self._neutral_foot = jnp.asarray(NEUTRAL_FOOT_ORIENT)
        if self._iros or self._trajmatch_fo or self._jonah:
            self._early_term_cutoff = 0.3    # cassie_traj.py:59
        elif self.reward == "aslip_old":
            self._early_term_cutoff = 0.0    # cassie_traj.py:912
        else:
            self._early_term_cutoff = -99.0

    # ------------------------------------------------------------------
    def get_ref_state(self, state: CassieTrajEnvState, phase):
        """(ref_qpos(35,), ref_qvel(32,)) at a phase
        (cassie_traj.py:926-972)."""
        phase = jnp.where(phase > state.phaselen, 0.0, phase)
        if self.aslip:
            idx = jnp.clip(phase.astype(jnp.int32), 0,
                           self._traj_len[state.traj_idx] - 1)
            pos = self._traj_qpos[state.traj_idx, idx]
            pos = pos.at[0].add(self._traj_x_span[state.traj_idx]
                                * state.counter)
            pos = pos.at[1].set(0.0)
            vel = jnp.zeros(32)   # aslip stores only motor velocities
            return pos, vel
        idx = (phase * self.simrate).astype(jnp.int32)
        idx = jnp.clip(idx, 0, self._traj_qpos.shape[0] - 1)
        pos = self._traj_qpos[idx]
        pos = pos.at[0].multiply(state.speed)
        pos = pos.at[0].add(self._x_span * state.counter.astype(jnp.float32)
                            * state.speed)
        pos = pos.at[1].set(0.0)
        vel = self._traj_qvel[idx].at[0].multiply(state.speed)
        return pos, vel

    def _make_clock(self, rng, speed):
        if self.command_profile == "phase":
            k_sw, k_st, k_mode = jax.random.split(rng, 3)
            swing = jax.random.randint(k_sw, (), 1, 51) / 100.0
            stance = jax.random.randint(k_st, (), 1, 31) / 100.0
            mode = jax.nn.one_hot(jax.random.randint(k_mode, (), 0, 3), 3)
        else:
            swing, stance = speed_to_durations(speed)
            mode = self._stance_mode
        clock = build_clock(swing, stance, mode, self.strict_relaxer,
                            self.have_incentive, float(self._freq))
        return clock, swing, stance, mode

    def _sample_params(self, rng):
        from apex_tpu.envs.cassie import CassieEnv, _DAMP_SCALED

        m = self.model
        default = PhysParams.from_model(m)
        k_damp, k_mass, k_fric, k_slope, k_menc, k_jenc = jax.random.split(rng, 6)
        if self.dynamics_randomization:
            damp_scale = jax.random.uniform(
                k_damp, (m.nv,), minval=self.damping_low,
                maxval=self.damping_high)
            damping = jnp.where(jnp.asarray(_DAMP_SCALED),
                                default.dof_damping * damp_scale,
                                default.dof_damping)
            mass_scale = jax.random.uniform(
                k_mass, (m.nbody,), minval=self.mass_low, maxval=self.mass_high)
            friction = jax.random.uniform(k_fric, (), minval=self.fric_low,
                                          maxval=self.fric_high)
            roll = jax.random.uniform(k_slope, (), minval=-self.max_roll_incline,
                                      maxval=self.max_roll_incline)
            pitch = jax.random.uniform(
                jax.random.fold_in(k_slope, 1), (),
                minval=-self.max_pitch_incline, maxval=self.max_pitch_incline)
            params = default.replace(
                body_mass=default.body_mass * mass_scale,
                dof_damping=jnp.maximum(damping, 0.0), friction=friction,
                floor_quat=euler2quat(z=0.0, y=pitch, x=roll))
            menc = jax.random.uniform(k_menc, (10,), minval=-self.encoder_noise,
                                      maxval=self.encoder_noise)
            jenc = jax.random.uniform(k_jenc, (6,), minval=-self.encoder_noise,
                                      maxval=self.encoder_noise)
        else:
            params, menc, jenc = default, jnp.zeros(10), jnp.zeros(6)
        return params, menc, jenc

    # ------------------------------------------------------------------
    def reset(self, rng):
        k_speed, k_side, k_clock, k_phase, k_dyn = jax.random.split(rng, 5)
        if self.aslip:
            traj_idx = jax.random.randint(k_speed, (), 0, self.num_speeds)
            speed = self._speeds[traj_idx]
            phaselen = (self._traj_len[traj_idx] - 1).astype(jnp.float32)
        else:
            traj_idx = jnp.zeros((), jnp.int32)
            # speed = randint(0, 40)/10 (cassie_traj.py:608)
            speed = jax.random.randint(k_speed, (), 0, 41) / 10.0
            phaselen = jnp.asarray(self._agility_phaselen)
        side_speed = jax.random.uniform(
            k_side, (), minval=self.min_side_speed, maxval=self.max_side_speed)

        clock, swing, stance, mode = self._make_clock(k_clock, speed)
        if self.command_profile in ("clock", "phase"):
            phaselen = clock.phaselen

        phase = jnp.floor(jax.random.uniform(k_phase, ())
                          * jnp.floor(phaselen + 1.0))
        params, menc, jenc = self._sample_params(k_dyn)

        state = CassieTrajEnvState(
            phys=CassiePhysState.standing(), params=params,
            clock=clock.x, clock_y=clock.y, clock_d=clock.d,
            phaselen=phaselen, phase=phase,
            counter=jnp.zeros((), jnp.int32), time=jnp.zeros((), jnp.int32),
            simsteps=jnp.zeros((), jnp.int32), traj_idx=traj_idx,
            speed=speed, side_speed=side_speed, orient_add=jnp.zeros(()),
            swing_duration=swing, stance_duration=stance, stance_mode=mode,
            motor_enc_noise=menc, joint_enc_noise=jenc,
            prev_action=jnp.zeros(self.action_size),
            prev_torque=jnp.zeros(10),
            obs_history=jnp.zeros((self.history + 1, self._base_obs)))

        # reset onto the reference trajectory (cassie_traj.py:750-760)
        ref_pos, ref_vel = self.get_ref_state(state, phase)
        ref_vel = jnp.where(self.aslip, jnp.zeros_like(ref_vel), ref_vel)
        phys = CassiePhysState(qpos=ref_pos, qvel=ref_vel, qacc=jnp.zeros(32))
        state = state.replace(phys=phys)

        est = estimate_state(self.model, phys,
                             static_diag(self.model, params, phys))
        obs, hist = self._build_obs(state, est)
        return state.replace(obs_history=hist), obs

    # ------------------------------------------------------------------
    def step(self, state: CassieTrajEnvState, action, rng):
        m = self.model
        if self.learn_gains:
            targets10, gains = action[:10], action[10:]
            p_gain = jnp.asarray(DEFAULT_P_GAIN) + gains[0:10]
            d_gain = jnp.asarray(DEFAULT_D_GAIN) + gains[10:20]
        else:
            targets10, p_gain, d_gain = action, None, None

        # PD baseline: neutral offset, reference motors (delta mode), or
        # IK output (cassie_traj.py:346-357)
        next_ref_pos, _ = self.get_ref_state(state, state.phase + 1.0)
        if self.ik_baseline and self.aslip:
            idx = jnp.clip(state.phase.astype(jnp.int32), 0,
                           self._traj_len[state.traj_idx] - 1)
            offset = self._traj_ik[state.traj_idx, idx][MOTOR_QPOS_IDX]
        elif self.no_delta:
            offset = self._offset
        else:
            offset = next_ref_pos[jnp.asarray(MOTOR_QPOS_IDX)]
        target = targets10 + offset - state.motor_enc_noise
        cmd = PDCommand.from_targets(target, p_gain, d_gain)

        # fused 2 kHz loop (batch-last under vmap, see cassie_sim.pd_scan);
        # tracking computed on the stacked sequences, same formulas as the
        # old in-loop accumulation
        phys, diag_seq, qvel_seq, _ = pd_scan(
            m, state.params, state.phys, cmd, self.simrate)
        diag_last = jax.tree_util.tree_map(lambda x: x[-1], diag_seq)
        prev_foot0 = static_diag(m, state.params, state.phys).foot_pos
        prev_pos_seq = jnp.concatenate(
            [prev_foot0[None], diag_seq.foot_pos[:-1]])
        foot_vel_seq = (diag_seq.foot_pos - prev_pos_seq) / m.timestep
        fq = diag_seq.foot_quat
        l_or = 1.0 - (fq[:, 0] @ self._neutral_foot) ** 2
        r_or = 1.0 - (fq[:, 1] @ self._neutral_foot) ** 2
        hiproll_seq = (jnp.abs(qvel_seq[:, 6])
                       + jnp.abs(qvel_seq[:, 19])) / 3.0

        time_ = state.time + 1
        phase = state.phase + 1.0
        wrapped = phase > state.phaselen
        counter = state.counter + wrapped.astype(jnp.int32)
        phase = jnp.where(wrapped, 0.0, phase)
        new_state = state.replace(
            phys=phys, phase=phase, counter=counter, time=time_,
            simsteps=state.simsteps + self.simrate)

        est = estimate_state(m, phys, diag_last)
        first = state.time == 0
        prev_action = jnp.where(first, action, state.prev_action)
        prev_torque = jnp.where(first, diag_last.motor_torque,
                                state.prev_torque)

        if self.reward == "aslip_old" and self.aslip:
            reward = self._aslip_old_reward(
                new_state, est, action[:10], prev_action[:10],
                l_or.mean() + r_or.mean())
        elif self._iros:
            reward = self._iros_reward(new_state)
        elif self._trajmatch_fo:
            prev10 = prev_action[:10]
            hiproll_act = 2.0 * jnp.linalg.norm(
                prev10[jnp.asarray([0, 5])] - action[jnp.asarray([0, 5])])
            reward = self._trajmatch_footorient_reward(
                new_state, l_or.mean(), r_or.mean(), hiproll_seq.mean(),
                hiproll_act)
        elif self._jonah:
            reward = self._jonah_rnn_reward(new_state)
        else:
            from apex_tpu.rewards.clock import GaitClock

            clock = GaitClock(x=state.clock, y=state.clock_y, d=state.clock_d,
                              phaselen=state.phaselen)
            ri = RewardInputs(
                qpos=phys.qpos, qvel=phys.qvel,
                l_foot_frc=diag_seq.foot_frc_z[:, 0].mean(),
                r_foot_frc=diag_seq.foot_frc_z[:, 1].mean(),
                l_foot_vel=foot_vel_seq[-1, 0], r_foot_vel=foot_vel_seq[-1, 1],
                l_foot_orient_cost=l_or.mean(), r_foot_orient_cost=r_or.mean(),
                pelvis_rot_vel=est.pelvis_rot_vel,
                pelvis_accel=est.pelvis_trans_accel,
                motor_torque=diag_last.motor_torque, prev_torque=prev_torque,
                action=action[:10], prev_action=prev_action[:10],
                speed=state.speed, phase=phase)
            reward = REWARD_FUNCS[self._reward_key](clock, ri)

        height = phys.qpos[2]
        terminated = (height < 0.4) | (height > 3.0) | \
            (reward < self._early_term_cutoff)

        # random command changes (same as CassieEnv; only for clock/phase)
        k1, k2 = jax.random.split(rng)
        orient_add = state.orient_add + jnp.where(
            jax.random.randint(k1, (), 0, 300) == 0,
            jax.random.uniform(k2, (), minval=-self.max_orient_change,
                               maxval=self.max_orient_change), 0.0)

        new_state = new_state.replace(
            orient_add=orient_add, prev_action=action,
            prev_torque=diag_last.motor_torque)
        obs, hist = self._build_obs(new_state, est)
        new_state = new_state.replace(obs_history=hist)
        # Diagnostics for the offline analysis tools (reference
        # tools/aslip_tests/*: GRF profiles, foot placement, task-space
        # tracking). Unused entries are dead-code-eliminated by XLA when the
        # caller drops info (rollout_scan does), so training pays nothing.
        info = {
            "grf_seq": diag_seq.foot_frc_z,           # (simrate, 2) l/r Fz
            "foot_pos": diag_last.foot_pos,           # (2, 3) world
            "est_lfoot_pos": est.left_foot_position,  # pelvis-relative
            "est_rfoot_pos": est.right_foot_position,
            "qpos": phys.qpos,
        }
        return new_state, obs, reward, terminated, info

    # ------------------------------------------------------------------
    def _iros_reward(self, state: CassieTrajEnvState):
        """iros_paper_reward (rewards/iros_paper_reward.py:3-59)."""
        qpos = state.phys.qpos
        ref_pos, _ = self.get_ref_state(state, state.phase)
        weight = jnp.asarray([0.15, 0.15, 0.1, 0.05, 0.05,
                              0.15, 0.15, 0.1, 0.05, 0.05])
        motor_idx = jnp.asarray(MOTOR_QPOS_IDX)
        joint_error = jnp.sum(
            30.0 * weight * (ref_pos[motor_idx] - qpos[motor_idx]) ** 2)
        com_error = jnp.sum((ref_pos[0:3] - qpos[0:3]) ** 2)
        orient_error = jnp.sum((ref_pos[4:7] - qpos[4:7]) ** 2)
        spring_idx = jnp.asarray([15, 29])
        spring_error = jnp.sum(
            1000.0 * (ref_pos[spring_idx] - qpos[spring_idx]) ** 2)
        return (0.5 * jnp.exp(-joint_error) + 0.3 * jnp.exp(-com_error)
                + 0.1 * jnp.exp(-orient_error) + 0.1 * jnp.exp(-spring_error))

    def _trajmatch_footorient_reward(self, state, l_orient, r_orient,
                                     hiproll_cost, hiproll_act):
        """trajmatch_footorient_hiprollvelact_reward
        (rewards/trajmatch_reward.py:77-151): the iros tracking terms at
        0.3/0.2/0.1/0.1 plus foot-orient and hip-roll vel/act terms."""
        qpos = state.phys.qpos
        ref_pos, _ = self.get_ref_state(state, state.phase)
        weight = jnp.asarray([0.15, 0.15, 0.1, 0.05, 0.05,
                              0.15, 0.15, 0.1, 0.05, 0.05])
        motor_idx = jnp.asarray(MOTOR_QPOS_IDX)
        joint_error = jnp.sum(
            30.0 * weight * (ref_pos[motor_idx] - qpos[motor_idx]) ** 2)
        com_error = jnp.sum((ref_pos[0:3] - qpos[0:3]) ** 2)
        orient_error = jnp.sum((ref_pos[4:7] - qpos[4:7]) ** 2)
        spring_idx = jnp.asarray([15, 29])
        spring_error = jnp.sum(
            1000.0 * (ref_pos[spring_idx] - qpos[spring_idx]) ** 2)
        return (0.3 * jnp.exp(-joint_error) + 0.2 * jnp.exp(-com_error)
                + 0.1 * jnp.exp(-orient_error) + 0.1 * jnp.exp(-spring_error)
                + 0.075 * jnp.exp(-l_orient) + 0.075 * jnp.exp(-r_orient)
                + 0.1 * jnp.exp(-hiproll_cost)
                + 0.05 * jnp.exp(-hiproll_act))

    def _jonah_rnn_reward(self, state):
        """jonah_RNN_reward (rewards/rnn_dyn_random_reward.py:3-50):
        heavier joint (50x) / com (10x) weights, quaternion inner-product
        orientation error (5x)."""
        qpos = state.phys.qpos
        ref_pos, _ = self.get_ref_state(state, state.phase)
        weight = jnp.asarray([0.15, 0.15, 0.1, 0.05, 0.05,
                              0.15, 0.15, 0.1, 0.05, 0.05])
        motor_idx = jnp.asarray(MOTOR_QPOS_IDX)
        joint_error = jnp.sum(
            50.0 * weight * (ref_pos[motor_idx] - qpos[motor_idx]) ** 2)
        com_error = jnp.sum(10.0 * (ref_pos[0:3] - qpos[0:3]) ** 2)
        orient_error = 5.0 * (1.0 - jnp.dot(qpos[3:7], ref_pos[3:7]) ** 2)
        spring_idx = jnp.asarray([15, 29])
        spring_error = jnp.sum(
            1000.0 * (ref_pos[spring_idx] - qpos[spring_idx]) ** 2)
        return (0.200 * jnp.exp(-joint_error) + 0.450 * jnp.exp(-com_error)
                + 0.300 * jnp.exp(-orient_error)
                + 0.050 * jnp.exp(-spring_error))

    def _aslip_old_reward(self, state, est, action, prev_action,
                          foot_orient_cost):
        """aslip_old_reward (rewards/aslip_rewards.py:5-69): task-space foot
        and com-velocity tracking against the gait library."""
        qpos = state.phys.qpos
        p = jnp.where(state.phase > state.phaselen, 0.0, state.phase)
        idx = jnp.clip(p.astype(jnp.int32), 0,
                       self._traj_len[state.traj_idx] - 1)
        t = state.traj_idx
        ref_lfoot = self._task["lpos"][t, idx]
        ref_rfoot = self._task["rpos"][t, idx]
        ref_cvel = self._task["cvel"][t, idx]

        footpos_error = (jnp.sum(jnp.abs(est.left_foot_position - ref_lfoot))
                         + jnp.sum(jnp.abs(est.right_foot_position - ref_rfoot)))
        com_vel_error = jnp.sum(jnp.abs(est.pelvis_trans_vel - ref_cvel))
        action_penalty = jnp.linalg.norm(action - prev_action)
        straight_diff = jnp.abs(qpos[1])
        straight_diff = jnp.where(straight_diff < 0.05, 0.0, straight_diff)
        return (0.3 * jnp.exp(-footpos_error)
                + 0.3 * jnp.exp(-com_vel_error)
                + 0.1 * jnp.exp(-action_penalty)
                + 0.2 * jnp.exp(-foot_orient_cost)
                + 0.1 * jnp.exp(-straight_diff))

    # ------------------------------------------------------------------
    def _rotate_to_orient(self, orient_add, vec):
        q = euler2quat(z=orient_add, y=jnp.zeros(()), x=jnp.zeros(()))
        iq = quat_inverse(q)
        if vec.shape[-1] == 3:
            return quat_rotate(iq, vec)
        out = quat_mul(iq, vec)
        return jnp.where(out[0] < 0, -out, out)

    def _build_obs(self, state: CassieTrajEnvState, est):
        phase_frac = 2.0 * jnp.pi * state.phase / state.phaselen
        clock = jnp.stack([jnp.sin(phase_frac), jnp.cos(phase_frac)])
        if self.command_profile == "phase":
            ext = jnp.concatenate([
                clock,
                jnp.stack([state.swing_duration, state.stance_duration]),
                state.stance_mode,
                jnp.stack([state.speed, state.side_speed])])
        elif self.command_profile == "clock":
            ext = jnp.concatenate(
                [clock, jnp.stack([state.speed, state.side_speed])])
        elif self.aslip:
            # 18-dim unaltered aslip task state (aslip_trajectory.py:139-160)
            p = jnp.where(state.phase == 0, state.phaselen - 1.0, state.phase)
            idx = jnp.clip(p.astype(jnp.int32), 0,
                           self._traj_len[state.traj_idx] - 1)
            t = state.traj_idx
            ext = jnp.concatenate([
                self._task["rpos"][t, idx], self._task["rvel"][t, idx],
                self._task["lpos"][t, idx], self._task["lvel"][t, idx],
                self._task["cpos"][t, idx], self._task["cvel"][t, idx]])
        else:
            ref_pos, ref_vel = self.get_ref_state(state, state.phase + 1.0)
            ext = jnp.concatenate([ref_pos[jnp.asarray(POS_INDEX)],
                                   ref_vel[jnp.asarray(VEL_INDEX)]])

        new_orient = self._rotate_to_orient(state.orient_add,
                                            est.pelvis_orientation)
        new_tvel = self._rotate_to_orient(state.orient_add,
                                          est.pelvis_trans_vel)
        new_tacc = self._rotate_to_orient(state.orient_add,
                                          est.pelvis_trans_accel)
        motor_pos = est.motor_position + state.motor_enc_noise
        joint_pos = est.joint_position + state.joint_enc_noise

        if self.input_profile == "min":
            robot = jnp.concatenate([
                est.left_foot_position, est.right_foot_position, new_orient,
                est.pelvis_rot_vel, est.left_foot_orientation,
                est.right_foot_orientation])
        else:
            robot = jnp.concatenate([
                (est.pelvis_position[2] - est.terrain_height)[None],
                new_orient, motor_pos, new_tvel, est.pelvis_rot_vel,
                est.motor_velocity, new_tacc, joint_pos, est.joint_velocity])

        base = jnp.concatenate([robot, ext])
        hist = jnp.roll(state.obs_history, 1, axis=0).at[0].set(base)
        return hist.reshape(-1), hist
