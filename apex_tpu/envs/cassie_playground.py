"""CassiePlayground: mission (waypoint command) following environment.

Rebuild of reference cassie/cassie_playground.py (720 LoC): walks a mission
command schedule (speed + heading per 30 Hz step, loaded from
missions/<name> data), obs = 46-dim state-est robot state + [clock, speed]
(:560-565), command_reward = speed/position/heading tracking
(rewards/command_reward.py:51-123), early termination on height or
reward < 0.3 (:330-339).
"""
from __future__ import annotations

import dataclasses
from math import floor

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from apex_tpu.envs.base import Env
from apex_tpu.envs.trajectory import CassieTrajectory, CommandTrajectory
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
from apex_tpu.utils.quaternion import (
    euler2quat,
    quat2euler,
    quat_inverse,
    quat_mul,
    quat_rotate,
)

from apex_tpu.envs.cassie import NEUTRAL_FOOT_ORIENT


@struct.dataclass
class PlaygroundState:
    phys: CassiePhysState
    params: PhysParams
    phase: jnp.ndarray
    counter: jnp.ndarray
    command_counter: jnp.ndarray
    time: jnp.ndarray
    last_position: jnp.ndarray     # (3,) mission-origin offset
    prev_action: jnp.ndarray


@dataclasses.dataclass
class CassiePlayground(Env):
    simrate: int = 60
    mission: str = "default"
    reward: str = "command"        # command | command_no_pos | keepalive
    traj: str = "walking"
    # static heightfield-terrain switch (the reference 5k matrix swaps in
    # hfield terrain xmls, 5k_test.py:302-304); per-env tables then flow
    # through state.params.hfield
    hfield: bool = False

    observation_size = 49
    action_size = 10
    mirrored_obs = None
    mirrored_acts = None
    clock_inds = [46, 47]

    def __post_init__(self):
        self.model = cassie_model()
        if self.hfield:
            self.model = dataclasses.replace(self.model, enable_hfield=True)
        self.params = PhysParams.from_model(self.model)
        trajectory = CassieTrajectory(self.traj)
        self.phaselen = float(floor(len(trajectory) / self.simrate) - 1)
        cmd = CommandTrajectory(self.mission)
        self._cmd_speed = jnp.asarray(cmd.speed_cmd)
        self._cmd_orient = jnp.asarray(cmd.orient)
        self._cmd_pos = jnp.asarray(cmd.global_pos)
        self.trajlen = cmd.trajlen
        self._offset = jnp.asarray(NEUTRAL_OFFSET)
        self._neutral_foot = jnp.asarray(NEUTRAL_FOOT_ORIENT)

    def reset(self, rng):
        phys = CassiePhysState.standing()
        state = PlaygroundState(
            phys=phys, params=self.params, phase=jnp.zeros(()),
            counter=jnp.zeros((), jnp.int32),
            command_counter=jnp.zeros((), jnp.int32),
            time=jnp.zeros((), jnp.int32),
            last_position=jnp.array([0.0, 0.0, 1.0]),
            prev_action=jnp.zeros(10))
        est = estimate_state(self.model, phys,
                             static_diag(self.model, self.params, phys))
        return state, self._obs(state, est)

    def _obs(self, state: PlaygroundState, est):
        speed = self._cmd_speed[state.command_counter]
        phase_frac = 2.0 * jnp.pi * state.phase / self.phaselen
        ext = jnp.concatenate([
            jnp.stack([jnp.sin(phase_frac), jnp.cos(phase_frac)]),
            speed[None]])
        # rotate pelvis orientation/velocities into the commanded-heading
        # frame (reference cassie_playground.py:578-585) -- without this
        # the policy is blind to the mission's heading commands (the
        # round-4 bug behind 0/2 corner missions). The reference computes
        # orient_add = cmd - pelvis.orientation[2], indexing the QUAT's y
        # component (~0 upright) rather than yaw -- an upstream quirk kept
        # as-is so commanded rotation semantics match exactly.
        orient_add = (self._cmd_orient[state.command_counter]
                      - est.pelvis_orientation[2])
        q = euler2quat(z=orient_add, y=jnp.zeros(()), x=jnp.zeros(()))
        iq = quat_inverse(q)
        new_orient = quat_mul(iq, est.pelvis_orientation)
        new_tvel = quat_rotate(iq, est.pelvis_trans_vel)
        new_tacc = quat_rotate(iq, est.pelvis_trans_accel)
        robot = jnp.concatenate([
            (est.pelvis_position[2] - est.terrain_height)[None],
            new_orient, est.motor_position,
            new_tvel, est.pelvis_rot_vel, est.motor_velocity,
            new_tacc, est.joint_position, est.joint_velocity])
        return jnp.concatenate([robot, ext])

    def step(self, state: PlaygroundState, action, rng):
        m = self.model
        cmd = PDCommand.from_targets(action + self._offset)

        # fused 2 kHz loop (batch-last under vmap, see cassie_sim.pd_scan)
        phys, diag_seq, _, _ = pd_scan(
            m, state.params, state.phys, cmd, self.simrate)
        diag = jax.tree_util.tree_map(lambda x: x[-1], diag_seq)
        est = estimate_state(m, phys, diag)

        time_ = state.time + 1
        phase = state.phase + 1.0
        wrapped = phase > self.phaselen
        counter = state.counter + wrapped.astype(jnp.int32)
        phase = jnp.where(wrapped, 0.0, phase)

        cc = state.command_counter + 1
        cc_wrap = cc >= self.trajlen - 1
        last_position = jnp.where(
            cc_wrap, state.last_position + self._cmd_pos[-1],
            state.last_position)
        cc = jnp.where(cc_wrap, 0, cc)

        new_state = PlaygroundState(
            phys=phys, params=state.params, phase=phase, counter=counter,
            command_counter=cc, time=time_, last_position=last_position,
            prev_action=action)

        reward = self._reward(new_state)
        height = phys.qpos[2]
        terminated = jnp.logical_not((height > 0.4) & (height < 3.0)) | \
            (reward < 0.3)
        return new_state, self._obs(new_state, est), reward, terminated, {}

    def _reward(self, state: PlaygroundState):
        """command_reward (rewards/command_reward.py:51-123)."""
        qpos, qvel = state.phys.qpos, state.phys.qvel
        curr_orient = quat2euler(qpos[3:7])[2]
        cc = state.command_counter
        desired_pos = self._cmd_pos[cc] + state.last_position
        desired_speed = self._cmd_speed[cc]
        desired_orient = self._cmd_orient[cc]

        compos_error = jnp.linalg.norm(qpos[0:3] - desired_pos)
        speed_error = jnp.abs(qvel[0] - desired_speed)
        orient_error = jnp.abs(curr_orient - desired_orient)

        if self.reward == "command_no_pos":
            return (0.5 * jnp.exp(-speed_error)
                    + 0.5 * jnp.exp(-orient_error))
        if self.reward == "keepalive":
            return jnp.ones(())
        return (0.2 * jnp.exp(-speed_error) + 0.3 * jnp.exp(-compos_error)
                + 0.5 * jnp.exp(-orient_error))
