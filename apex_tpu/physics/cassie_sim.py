"""Cassie simulation layer: PD drives, 2 kHz substep, state estimator.

TPU-native equivalent of the reference's C trio (SURVEY.md section 2.1):
  * PdInput       (include/pd_in_t.h:24-49): per-leg PD torque controller
  * CassieCoreSim (include/CassieCoreSim.h): firmware emulation producing
    state_out_t (include/state_out_t.h:24-78)
  * cassie_sim_step_pd / foot_forces / foot_positions / qpos / qvel
    (include/cassiemujoco.h:80-158)

Everything is a pure function over CassiePhysState; a policy step is a
lax.scan of `pd_substep` (the reference loops step_pd simrate times per
policy step, cassie.py:410-433).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from apex_tpu.physics.engine import (
    PhysParams,
    StepOut,
    step,
)
from apex_tpu.physics.models.cassie_gen import make_model
from apex_tpu.physics.spec import PhysModel

# ---------------------------------------------------------------------------
# index maps (reference cassie.py:100-104 and include/cassiemujoco.h qpos
# docs; the achilles ball and passive linkage dofs are interleaved)
# ---------------------------------------------------------------------------

MOTOR_QPOS_IDX = np.array([7, 8, 9, 14, 20, 21, 22, 23, 28, 34])
MOTOR_QVEL_IDX = np.array([6, 7, 8, 12, 18, 19, 20, 21, 25, 31])
JOINT_QPOS_IDX = np.array([15, 16, 20, 29, 30, 34])   # shin, tarsus, foot x2
JOINT_QVEL_IDX = np.array([13, 14, 18, 26, 27, 31])

# default PD gains (reference cassie.py:57-58)
DEFAULT_P_GAIN = np.array([100.0, 100.0, 88.0, 96.0, 50.0] * 2)
DEFAULT_D_GAIN = np.array([10.0, 10.0, 8.0, 9.6, 5.0] * 2)

# neutral motor offsets = standing pose motor angles (cassie.py:107)
NEUTRAL_OFFSET = np.array([0.0045, 0.0, 0.4973, -1.1997, -1.5968,
                           0.0045, 0.0, 0.4973, -1.1997, -1.5968])

# Standing configuration with closed loops (the pose cassie_sim_set_const
# resets to; motor/joint values match reference reset_cassie_state,
# cassie.py:737-746). Achilles-rod quaternions / linkage angles are refined
# by `settle` against our loop-closure constraints at env setup.
CASSIE_QPOS_INIT = np.array([
    0.0, 0.0, 1.01,               # pelvis pos
    1.0, 0.0, 0.0, 0.0,           # pelvis quat
    0.0045, 0.0, 0.4973,          # left hip roll/yaw/pitch
    0.9785, -0.0164, 0.01787, -0.2049,   # left achilles rod quat
    -1.1997,                      # left knee
    0.0, 1.4267,                  # left shin (spring), tarsus
    -0.0, -1.5244, 1.5244,        # left heel spring, foot crank, plantar rod
    -1.5968,                      # left foot
    -0.0045, 0.0, 0.4973,         # right hip roll/yaw/pitch
    0.9786, 0.00386, -0.01524, -0.2051,  # right achilles rod quat
    -1.1997,
    0.0, 1.4267,
    -0.0, -1.5244, 1.5244,
    -1.5968,
])

_MODEL_CACHE = None
_HF_MODEL_CACHE = None


def cassie_model(enable_hfield: bool = False) -> PhysModel:
    """Canonical Cassie PhysModel (cached per hfield variant so kernel /
    structure caches hung off the instance are shared by every env)."""
    global _MODEL_CACHE, _HF_MODEL_CACHE
    if enable_hfield:
        if _HF_MODEL_CACHE is None:
            import dataclasses

            _HF_MODEL_CACHE = dataclasses.replace(
                cassie_model(), enable_hfield=True)
        return _HF_MODEL_CACHE
    if _MODEL_CACHE is None:
        _MODEL_CACHE = make_model()
    return _MODEL_CACHE


@struct.dataclass
class CassiePhysState:
    qpos: jnp.ndarray   # (35,)
    qvel: jnp.ndarray   # (32,)
    qacc: jnp.ndarray   # (32,) last-step acceleration (for IMU output)

    @staticmethod
    def standing() -> "CassiePhysState":
        return CassiePhysState(
            qpos=jnp.asarray(CASSIE_QPOS_INIT),
            qvel=jnp.zeros(32),
            qacc=jnp.zeros(32),
        )


@struct.dataclass
class PDCommand:
    """pd_in_t equivalent (include/pd_in_t.h:24-49), both legs flattened to
    10-vectors ordered [left(5), right(5)]."""
    p_target: jnp.ndarray
    d_target: jnp.ndarray
    p_gain: jnp.ndarray
    d_gain: jnp.ndarray
    ff_torque: jnp.ndarray

    @staticmethod
    def from_targets(p_target, p_gain=None, d_gain=None) -> "PDCommand":
        return PDCommand(
            p_target=p_target,
            d_target=jnp.zeros(10),
            p_gain=jnp.asarray(DEFAULT_P_GAIN) if p_gain is None else p_gain,
            d_gain=jnp.asarray(DEFAULT_D_GAIN) if d_gain is None else d_gain,
            ff_torque=jnp.zeros(10),
        )


class SubstepDiag(NamedTuple):
    """Per-substep diagnostics the env layer accumulates (reference
    step_simulation/step, cassie.py:293-443)."""
    foot_frc_z: jnp.ndarray      # (2,) left/right vertical contact force
    foot_pos: jnp.ndarray        # (2, 3) world foot body positions
    foot_vel: jnp.ndarray        # (2, 3) world foot linear velocities
    foot_quat: jnp.ndarray       # (2, 4) foot body orientations
    toe_heel_force: jnp.ndarray  # (2, 2, 3) [foot][toe/heel] world forces
    motor_torque: jnp.ndarray    # (10,) applied joint torques


def pd_control(model: PhysModel, state: CassiePhysState,
               cmd: PDCommand) -> jnp.ndarray:
    """PD torque law tau = P(pT - q) + D(dT - qd) + ff at the joint level
    (PdInput semantics, include/pd_in_t.h), clamped to the drive torque
    limits gear*ctrlrange (cassie.xml:232-244). Returns per-motor ctrl in
    actuator units (joint torque / gear)."""
    q = state.qpos[MOTOR_QPOS_IDX]
    qd = state.qvel[MOTOR_QVEL_IDX]
    tau = (cmd.p_gain * (cmd.p_target - q) + cmd.d_gain * (cmd.d_target - qd)
           + cmd.ff_torque)
    gear = jnp.array([a.gear for a in model.actuators])
    return tau / gear   # engine clips to ctrlrange


_LEFT_FOOT = None
_RIGHT_FOOT = None
_PELVIS = None


def _foot_ids(model: PhysModel):
    global _LEFT_FOOT, _RIGHT_FOOT, _PELVIS
    if _LEFT_FOOT is None:
        _LEFT_FOOT = model.body_id("left-foot")
        _RIGHT_FOOT = model.body_id("right-foot")
        _PELVIS = model.body_id("cassie-pelvis")
    return _LEFT_FOOT, _RIGHT_FOOT, _PELVIS


def _contact_groups(model: PhysModel):
    left = [i for i, c in enumerate(model.contacts) if c.group == 0]
    right = [i for i, c in enumerate(model.contacts) if c.group == 1]
    return left, right


def pd_substep(model: PhysModel, params: PhysParams, state: CassiePhysState,
               cmd: PDCommand) -> Tuple[CassiePhysState, SubstepDiag]:
    """One 0.0005 s physics substep under PD control
    (cassie_sim_step_pd, include/cassiemujoco.h:80)."""
    ctrl = pd_control(model, state, cmd)
    out: StepOut = step(model, params, state.qpos, state.qvel, ctrl)

    lf, rf, _ = _foot_ids(model)
    lcon, rcon = _contact_groups(model)

    l_frc = sum(out.contact.force[i][2] for i in lcon)
    r_frc = sum(out.contact.force[i][2] for i in rcon)

    origin = out.kin.origin
    foot_pos = jnp.stack([out.kin.xpos[lf] + origin, out.kin.xpos[rf] + origin])
    foot_quat = jnp.stack([out.kin.xquat[lf], out.kin.xquat[rf]])
    # foot body-origin world velocity from spatial velocity is recomputed by
    # the env from position differences (reference does the same,
    # cassie.py:330-331); provide contact-point based estimate here
    l_vel = (out.contact.vel[lcon[0]] + out.contact.vel[lcon[1]]) / 2.0
    r_vel = (out.contact.vel[rcon[0]] + out.contact.vel[rcon[1]]) / 2.0

    toe_heel = jnp.stack([
        jnp.stack([out.contact.force[lcon[0]], out.contact.force[lcon[1]]]),
        jnp.stack([out.contact.force[rcon[0]], out.contact.force[rcon[1]]]),
    ])

    diag = SubstepDiag(
        foot_frc_z=jnp.stack([l_frc, r_frc]),
        foot_pos=foot_pos,
        foot_vel=jnp.stack([l_vel, r_vel]),
        foot_quat=foot_quat,
        toe_heel_force=toe_heel,
        motor_torque=out.actuator_torque,
    )
    new_state = CassiePhysState(qpos=out.qpos, qvel=out.qvel, qacc=out.qacc)
    return new_state, diag


def pd_scan(model: PhysModel, params: PhysParams, phys: CassiePhysState,
            cmd: PDCommand, length: int):
    """`length` PD substeps (the 2 kHz control-step loop) in one call.

    Returns (phys_final, diag_seq, qvel_seq, qacc_seq) where diag_seq
    leaves carry a leading (length,) substep axis and qvel/qacc_seq are
    (length, nv) -- the post-substep velocity/acceleration streams the env
    tracking layer reduces (means, EMAs, recurrences).

    Unbatched calls run the per-env `lax.scan` of `pd_substep`; under
    `vmap` a custom batching rule reroutes the WHOLE loop through the
    batch-last fleet pipeline with the layout transposes hoisted OUT of
    the substep scan (the per-substep custom_vmap on engine.step paid a
    full PhysParams transpose -- including the heightfield -- plus ~100
    fragmented batch-first tracking kernels per substep; measured 14.7 ms
    vs ~0.4 ms for this fused path at fleet 1024 on v5e).

    Reference parity anchor: the simrate x cassie_sim_step_pd loop
    (cassie.py:410-433, include/cassiemujoco.h:80)."""
    import os

    if os.environ.get("APEX_TPU_NO_FLEET", "") not in ("", "0"):
        return _pd_scan_single(model, params, phys, cmd, length)
    return _pd_scan_dispatch(model, length)(params, phys, cmd)


def _pd_scan_single(model: PhysModel, params: PhysParams,
                    phys: CassiePhysState, cmd: PDCommand, length: int):
    def body(carry, _):
        s, d = pd_substep(model, params, carry, cmd)
        return s, (d, s.qvel, s.qacc)

    phys_f, (diag_seq, qvel_seq, qacc_seq) = jax.lax.scan(
        body, phys, None, length=length)
    return phys_f, diag_seq, qvel_seq, qacc_seq


def _pd_scan_dispatch(model: PhysModel, length: int):
    cache = model.__dict__.get("_pd_scan_cv")
    if cache is None:
        cache = {}
        object.__setattr__(model, "_pd_scan_cv", cache)
    f = cache.get(length)
    if f is not None:
        return f

    @jax.custom_batching.custom_vmap
    def f(params, phys, cmd):
        return _pd_scan_single(model, params, phys, cmd, length)

    @f.def_vmap
    def _rule(axis_size, in_batched, params, phys, cmd):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                jnp.asarray(x), (axis_size,) + jnp.shape(x))

        params = jax.tree_util.tree_map(bcast, params, in_batched[0])
        phys = jax.tree_util.tree_map(bcast, phys, in_batched[1])
        cmd = jax.tree_util.tree_map(bcast, cmd, in_batched[2])
        out = _fleet_pd_scan(model, params, phys, cmd, length)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    cache[length] = f
    return f


def _fleet_pd_scan(model: PhysModel, params_b: PhysParams,
                   phys_b: CassiePhysState, cmd_b: PDCommand, length: int):
    """Batch-FIRST adapter: transpose once, scan `length` substeps fully
    batch-last (PD law + fleet_step + diagnostics), transpose outputs
    once. Numerics mirror `_pd_scan_single` (same op order per substep);
    fleet-vs-per-env physics parity is pinned by tests/test_fleet_parity.py
    and the pd_scan-level test in tests/test_cassie_env.py."""
    import os

    from apex_tpu.physics import fleet

    to_bt = lambda x: jnp.moveaxis(x, 0, -1)
    params_bt = jax.tree_util.tree_map(to_bt, params_b)
    cmd_bt = jax.tree_util.tree_map(to_bt, cmd_b)       # leaves (10, B)
    qpos0, qvel0 = to_bt(phys_b.qpos), to_bt(phys_b.qvel)

    on_accel = jax.default_backend() not in ("cpu", "gpu")
    force = os.environ.get("APEX_TPU_FORCE_MEGAKERNEL", "") not in ("", "0")
    if ((on_accel or force)
            and os.environ.get("APEX_TPU_NO_MEGAKERNEL", "") in ("", "0")):
        from apex_tpu.physics import fleet_kernel

        if fleet_kernel.supported(model):
            return _megakernel_pd_scan(model, params_bt, cmd_bt, qpos0,
                                       qvel0, length)

    gear = np.array([a.gear for a in model.actuators])[:, None]
    lf, rf, _ = _foot_ids(model)
    lcon, rcon = _contact_groups(model)
    mq, mv = MOTOR_QPOS_IDX, MOTOR_QVEL_IDX

    def body(carry, _):
        qpos, qvel = carry
        q = qpos[mq]                                     # (10, B)
        qd = qvel[mv]
        tau = (cmd_bt.p_gain * (cmd_bt.p_target - q)
               + cmd_bt.d_gain * (cmd_bt.d_target - qd) + cmd_bt.ff_torque)
        ctrl = tau / gear
        dyn, contact, qpos2, qvel2, qacc2, act_torque = fleet.fleet_step(
            model, params_bt, qpos, qvel, ctrl)
        kin = dyn.kin
        l_frc = sum(contact.force[i, 2] for i in lcon)   # (B,)
        r_frc = sum(contact.force[i, 2] for i in rcon)
        origin = kin.origin
        foot_pos = jnp.stack([kin.xpos[lf] + origin,
                              kin.xpos[rf] + origin])    # (2, 3, B)
        foot_quat = fleet._mat2quat_bt(kin.ximat[np.array([lf, rf])])  # (2, 4, B)
        l_vel = (contact.vel[lcon[0]] + contact.vel[lcon[1]]) / 2.0
        r_vel = (contact.vel[rcon[0]] + contact.vel[rcon[1]]) / 2.0
        toe_heel = jnp.stack([
            jnp.stack([contact.force[lcon[0]], contact.force[lcon[1]]]),
            jnp.stack([contact.force[rcon[0]], contact.force[rcon[1]]]),
        ])                                               # (2, 2, 3, B)
        diag = SubstepDiag(
            foot_frc_z=jnp.stack([l_frc, r_frc]),
            foot_pos=foot_pos,
            foot_vel=jnp.stack([l_vel, r_vel]),
            foot_quat=foot_quat,
            toe_heel_force=toe_heel,
            motor_torque=act_torque,
        )
        return (qpos2, qvel2), (diag, qvel2, qacc2)

    (qpos_f, qvel_f), (diag_seq, qvel_seq, qacc_seq) = jax.lax.scan(
        body, (qpos0, qvel0), None, length=length)

    to_bf = lambda x: jnp.moveaxis(x, -1, 0)   # (L, ..., B) -> (B, L, ...)
    phys_f = CassiePhysState(qpos=to_bf(qpos_f), qvel=to_bf(qvel_f),
                             qacc=to_bf(qacc_seq[-1]))
    return (phys_f,
            jax.tree_util.tree_map(to_bf, diag_seq),
            to_bf(qvel_seq), to_bf(qacc_seq))


def _gspmd_mesh_axis(batch: int):
    """(abstract_mesh, axis_name) when tracing inside a jit that carries a
    mesh context (jax.sharding.set_mesh / shard_ppo_state callers), else
    None. The env-fleet batch must divide the axis size."""
    get = getattr(jax.sharding, "get_abstract_mesh", None)
    if get is None:
        return None
    am = get()
    if am is None or getattr(am, "empty", True):
        return None
    # inside shard_map the axes are Manual: the caller already partitioned
    # the batch; wrapping again would double-shard. str() of the enum is
    # "AxisType.Manual" on the pinned jax, so match by suffix (ADVICE r4).
    types = getattr(am, "axis_types", ())
    if any(str(t).endswith("Manual") for t in types):
        return None
    if "env" in am.axis_names:
        name = "env"
    else:
        sized = [n for n in am.axis_names if am.shape[n] > 1]
        name = sized[0] if sized else am.axis_names[0]
    if batch % am.shape[name] != 0:
        return None
    return am, name


def _megakernel_pd_scan(model: PhysModel, params_bt: PhysParams,
                        cmd_bt: PDCommand, qpos0: jnp.ndarray,
                        qvel0: jnp.ndarray, length: int):
    """Batch-last PD scan over the whole-substep Pallas kernel
    (fleet_kernel.pallas_pd_substep): the entire physics pipeline --
    FK, CRBA/RNEA, tree-sparse LTDL solves, contacts, loop-closure
    impulses, PD law, integration -- runs as ONE program per substep
    with all intermediates resident in VMEM/registers.

    GSPMD composition (round-3 Weak #1): on TPU the pallas_call itself is
    partitionable along the env axis (fleet_kernel._partitioned_invoke,
    a custom_partitioning with an SDY batch rule) -- each device runs the
    grid on its local shard with no wrapper boundary, so XLA keeps its
    fusion freedom around the substep scan, and it composes identically
    whether the caller uses sharding annotations (GSPMD) or the manual
    shard_map training path (PPO.train_iter_spmd). On CPU (forced-kernel
    tests) the emulated generator body stands in for pallas_call and the
    scan runs under shard_map instead, which validates the same
    dispatch-level partitioning shape on the virtual 8-device mesh."""
    from apex_tpu.physics import fleet_kernel

    cmd_rows = jnp.concatenate([
        cmd_bt.p_target, cmd_bt.d_target, cmd_bt.p_gain, cmd_bt.d_gain,
        cmd_bt.ff_torque], axis=0)                       # (5*nu, B)

    emulated = jax.default_backend() in ("cpu", "gpu")
    substep = (fleet_kernel.emulated_pd_substep if emulated
               else fleet_kernel.pallas_pd_substep)

    def core(params_bt, cmd_rows, qpos0, qvel0):
        fleet_kernel.LAST_KERNEL_BATCH = qpos0.shape[-1]

        def body(carry, _):
            qpos, qvel = carry
            qpos2, qvel2, qacc2, diag_rows = substep(
                model, params_bt, qpos, qvel, cmd_rows)
            diag = SubstepDiag(
                foot_frc_z=diag_rows[0:2],
                foot_pos=diag_rows[2:8].reshape(2, 3, -1),
                foot_vel=diag_rows[8:14].reshape(2, 3, -1),
                foot_quat=diag_rows[14:22].reshape(2, 4, -1),
                toe_heel_force=diag_rows[22:34].reshape(2, 2, 3, -1),
                motor_torque=diag_rows[34:34 + model.nu],
            )
            return (qpos2, qvel2), (diag, qvel2, qacc2)

        return jax.lax.scan(body, (qpos0, qvel0), None, length=length)

    mesh_axis = _gspmd_mesh_axis(qpos0.shape[-1]) if emulated else None
    if mesh_axis is not None:
        from jax.sharding import PartitionSpec as P

        am, axis = mesh_axis
        last = lambda t: jax.tree_util.tree_map(
            lambda x: P(*([None] * (jnp.ndim(x) - 1) + [axis])), t)
        args = (params_bt, cmd_rows, qpos0, qvel0)
        out_spec = jax.tree_util.tree_map(
            lambda x: P(*([None] * (len(x.shape) - 1) + [axis])),
            jax.eval_shape(core, *args))
        core = jax.shard_map(core, mesh=am,
                             in_specs=tuple(last(a) for a in args),
                             out_specs=out_spec, check_vma=False)

    (qpos_f, qvel_f), (diag_seq, qvel_seq, qacc_seq) = core(
        params_bt, cmd_rows, qpos0, qvel0)

    to_bf = lambda x: jnp.moveaxis(x, -1, 0)
    phys_f = CassiePhysState(qpos=to_bf(qpos_f), qvel=to_bf(qvel_f),
                             qacc=to_bf(qacc_seq[-1]))
    return (phys_f,
            jax.tree_util.tree_map(to_bf, diag_seq),
            to_bf(qvel_seq), to_bf(qacc_seq))


@struct.dataclass
class CassieStateOut:
    """state_out_t equivalent (include/state_out_t.h:24-78), restricted to
    the fields the env layer consumes (cassie.py:818-850)."""
    pelvis_position: jnp.ndarray            # (3,)
    pelvis_orientation: jnp.ndarray         # (4,)
    pelvis_rot_vel: jnp.ndarray             # (3,) body frame (gyro)
    pelvis_trans_vel: jnp.ndarray           # (3,) world frame
    pelvis_trans_accel: jnp.ndarray         # (3,) world, gravity-removed
    motor_position: jnp.ndarray             # (10,)
    motor_velocity: jnp.ndarray             # (10,)
    motor_torque: jnp.ndarray               # (10,)
    joint_position: jnp.ndarray             # (6,)
    joint_velocity: jnp.ndarray             # (6,)
    left_foot_position: jnp.ndarray         # (3,) relative to pelvis, world
    right_foot_position: jnp.ndarray        # (3,)
    left_foot_orientation: jnp.ndarray      # (4,)
    right_foot_orientation: jnp.ndarray     # (4,)
    terrain_height: jnp.ndarray             # scalar


def estimate_state(model: PhysModel, state: CassiePhysState,
                   diag: SubstepDiag) -> CassieStateOut:
    """Build the firmware state-estimator outputs from sim state.

    The reference's estimator (inside CassieCoreSim) converges to the true
    state in simulation; we output the true values directly (documented
    divergence: no estimator transients)."""
    qpos, qvel = state.qpos, state.qvel
    pelvis_pos = qpos[0:3]
    return CassieStateOut(
        pelvis_position=pelvis_pos,
        pelvis_orientation=qpos[3:7],
        pelvis_rot_vel=qvel[3:6],
        pelvis_trans_vel=qvel[0:3],
        pelvis_trans_accel=state.qacc[0:3],
        motor_position=qpos[MOTOR_QPOS_IDX],
        motor_velocity=qvel[MOTOR_QVEL_IDX],
        motor_torque=diag.motor_torque,
        joint_position=qpos[JOINT_QPOS_IDX],
        joint_velocity=qvel[JOINT_QVEL_IDX],
        left_foot_position=diag.foot_pos[0] - pelvis_pos,
        right_foot_position=diag.foot_pos[1] - pelvis_pos,
        left_foot_orientation=diag.foot_quat[0],
        right_foot_orientation=diag.foot_quat[1],
        terrain_height=jnp.zeros(()),
    )


def static_diag(model: PhysModel, params: PhysParams,
                state: CassiePhysState) -> SubstepDiag:
    """FK-only diagnostics (no step): foot poses from kinematics, zero
    forces/velocities. Used at reset to populate the estimator."""
    from apex_tpu.physics.engine import forward_kinematics_fleet

    kin = forward_kinematics_fleet(model, params, state.qpos)
    lf, rf, _ = _foot_ids(model)
    origin = kin.origin
    return SubstepDiag(
        foot_frc_z=jnp.zeros(2),
        foot_pos=jnp.stack([kin.xpos[lf] + origin, kin.xpos[rf] + origin]),
        foot_vel=jnp.zeros((2, 3)),
        foot_quat=jnp.stack([kin.xquat[lf], kin.xquat[rf]]),
        toe_heel_force=jnp.zeros((2, 2, 3)),
        motor_torque=jnp.zeros(10),
    )


def settle(model: PhysModel, params: PhysParams,
           state: CassiePhysState, n_substeps: int = 400) -> CassiePhysState:
    """Hold the neutral PD targets for n substeps to let the soft loop
    closures and contacts converge to a consistent standing state."""
    cmd = PDCommand.from_targets(jnp.asarray(NEUTRAL_OFFSET))

    def body(carry, _):
        s, _diag = pd_substep(model, params, carry, cmd)
        return s, None

    out, _ = jax.lax.scan(body, state, None, length=n_substeps)
    return out
