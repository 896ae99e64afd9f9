"""CassieStandingEnv: standing/balance environment, pure JAX.

Rebuild of reference cassie/cassie_standing_env.py (297 LoC): 46-dim
state-estimator observation, capture-point + pose + COM-velocity reward with
a no-ground-contact penalty (:142-196), resets onto random phases of the
stepping reference trajectory (:129-139), termination on pelvis height
(:123-126).

Reference quirks kept for parity (documented):
  * the reward's z terms index qpos[1] (pelvis y) where the comments say
    height (:175, :179) -- replicated, with an epsilon guard so the
    division cannot produce NaN at y == 0;
  * the ground-contact check tests rightFoot.heelForce twice, so the right
    toe never participates (:184, :193).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from apex_tpu.envs.base import Env
from apex_tpu.envs.trajectory import CassieTrajectory
from apex_tpu.physics.cassie_sim import (
    CassiePhysState,
    NEUTRAL_OFFSET,
    PDCommand,
    cassie_model,
    estimate_state,
    pd_scan,
    static_diag,
)
from apex_tpu.physics.engine import PhysParams


@struct.dataclass
class StandingState:
    phys: CassiePhysState
    phase: jnp.ndarray
    counter: jnp.ndarray
    time: jnp.ndarray


@dataclasses.dataclass
class CassieStandingEnv(Env):
    simrate: int = 60
    traj: str = "stepping"

    observation_size = 46
    action_size = 10
    mirrored_obs = None
    mirrored_acts = None
    clock_inds = None

    def __post_init__(self):
        self.model = cassie_model()
        self.params = PhysParams.from_model(self.model)
        trajectory = CassieTrajectory(self.traj)
        self.phaselen = int(np.floor(len(trajectory) / self.simrate)) - 1
        # reset states at each phase (reference get_ref_state, :198-210:
        # qpos with y zeroed, qvel as recorded)
        idx = np.arange(self.phaselen + 1) * self.simrate
        qpos = trajectory.qpos[idx].copy()
        qpos[:, 1] = 0.0
        self._ref_qpos = jnp.asarray(qpos)
        self._ref_qvel = jnp.asarray(trajectory.qvel[idx])
        self._offset = jnp.asarray(NEUTRAL_OFFSET)

    def reset(self, rng):
        phase = jax.random.randint(rng, (), 0, self.phaselen + 1)
        phys = CassiePhysState(
            qpos=self._ref_qpos[phase], qvel=self._ref_qvel[phase],
            qacc=jnp.zeros(32))
        state = StandingState(
            phys=phys, phase=phase.astype(jnp.float32),
            counter=jnp.zeros((), jnp.int32), time=jnp.zeros((), jnp.int32))
        est = estimate_state(self.model, phys,
                             static_diag(self.model, self.params, phys))
        return state, self._obs(est)

    def _obs(self, est):
        """46-dim robot state (reference get_full_state, :274-287)."""
        return jnp.concatenate([
            (est.pelvis_position[2] - est.terrain_height)[None],
            est.pelvis_orientation, est.motor_position,
            est.pelvis_trans_vel, est.pelvis_rot_vel, est.motor_velocity,
            est.pelvis_trans_accel, est.joint_position, est.joint_velocity])

    def step(self, state: StandingState, action, rng):
        m = self.model
        cmd = PDCommand.from_targets(action + self._offset)

        # fused 2 kHz loop (batch-last under vmap, see cassie_sim.pd_scan)
        phys, diag_seq, _, _ = pd_scan(
            m, self.params, state.phys, cmd, self.simrate)
        diag = jax.tree_util.tree_map(lambda x: x[-1], diag_seq)
        est = estimate_state(m, phys, diag)

        reward = self._reward(phys, est, diag)
        time_ = state.time + 1
        phase = state.phase + 1.0
        wrapped = phase > self.phaselen
        counter = state.counter + wrapped.astype(jnp.int32)
        phase = jnp.where(wrapped, 0.0, phase)

        height = phys.qpos[2]
        terminated = jnp.logical_not((height > 0.4) & (height < 3.0))
        new_state = StandingState(phys=phys, phase=phase, counter=counter,
                                  time=time_)
        return new_state, self._obs(est), reward, terminated, {}

    def _reward(self, phys, est, diag):
        """compute_reward (:142-196)."""
        qpos, qvel = phys.qpos, phys.qvel
        foot_pos = jnp.concatenate([est.left_foot_position,
                                    est.right_foot_position])

        # upper body pose modulation
        r_pose = 0.25 * (jnp.exp(-qpos[6] ** 2) + jnp.exp(-qpos[8] ** 2)
                         + jnp.exp(-qpos[13] ** 2) + jnp.exp(-qpos[15] ** 2))

        # capture point
        cp_pos = jnp.sqrt(
            0.5 * (jnp.abs(foot_pos[0]) + jnp.abs(foot_pos[3])) ** 2
            + 0.5 * (jnp.abs(foot_pos[1]) + jnp.abs(foot_pos[4])) ** 2)
        xy_com_pos = jnp.exp(-cp_pos ** 2)
        z_com_pos = jnp.exp(-(qpos[1] - 0.9) ** 2)   # qpos[1]: parity quirk
        r_com_pos = 0.5 * xy_com_pos + 0.5 * z_com_pos

        cp_vel = cp_pos * jnp.sqrt(9.8 / jnp.maximum(jnp.abs(qpos[1]), 1e-6))
        xy_com_vel = jnp.exp(
            -(cp_vel - jnp.sqrt(qvel[0] ** 2 + qvel[1] ** 2)) ** 2)
        z_com_vel = jnp.exp(-qvel[2] ** 2)

        l_heel = jnp.linalg.norm(diag.toe_heel_force[0, 1])
        l_toe = jnp.linalg.norm(diag.toe_heel_force[0, 0])
        r_heel = jnp.linalg.norm(diag.toe_heel_force[1, 1])
        # right toe unused: reference checks rightFoot.heelForce twice (:184)
        any_light = (l_heel < 5) | (l_toe < 5) | (r_heel < 5) | (r_heel < 5)
        r_com_vel = jnp.where(any_light, z_com_vel,
                              0.5 * xy_com_vel + 0.5 * z_com_vel)

        reward = 0.33 * r_pose + 0.33 * r_com_pos + 0.34 * r_com_vel
        all_light = (l_heel < 5) & (l_toe < 5) & (r_heel < 5) & (r_heel < 5)
        return jnp.where(all_light, reward - 0.5, reward)
