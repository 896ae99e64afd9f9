"""Generalized-coordinate rigid-body dynamics in pure JAX.

TPU-native replacement for the physics core inside libcassiemujoco.so
(reference include/cassiemujoco.h:41-158: `cassie_sim_step*`, qpos(35)/
qvel(32), foot forces/positions/velocities). Algorithmic structure follows
the classical CRBA/RNEA formulation over world-frame per-dof motion axes
("cdof"), with MuJoCo-compatible model semantics (joint ref offsets, body-
frame ball velocities, armature, implicit joint damping) so models compiled
from the same MJCF behave alike:

  * forward kinematics + per-dof spatial axes, origin-shifted to the root
    body position for f32 robustness over kilometer-scale runs;
  * composite-rigid-body algorithm for the (nv, nv) mass matrix;
  * recursive Newton-Euler for Coriolis/centrifugal/gravity bias;
  * floor contacts and joint limits as critically-damped spring-dampers
    scaled by the exact per-constraint effective mass diag(J M^-1 J^T)^-1
    -- a diagonal approximation of the reference solver's (PGS,
    cassie.xml:5) Delassus operator with the same solref=(0.005, 1)
    impedance;
  * loop-closure connects as velocity-level impulses with Baumgarte
    stabilization (rigid rods; see equality_jacobian);
  * semi-implicit Euler with implicit damping: (M + h D) dv = h f;
  * all small SPD solves via unrolled batched Cholesky (ops/linalg.py).

Everything is a pure function of (model, params, state); batching = vmap,
the 2 kHz substep loop = lax.scan (see step_fn builders below).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from apex_tpu.ops.linalg import batched_spd_inverse, batched_spd_solve
from apex_tpu.physics.spec import (
    DOF_WIDTH,
    JointType,
    PhysModel,
)
from apex_tpu.utils.quaternion import (
    mat2quat,
    quat_integrate,
    quat_rotate,
    quat2mat,
)


@struct.dataclass
class PhysParams:
    """Dynamics parameters mutable at reset time (dynamics randomization).

    Mirrors what the reference mutates through cassie_sim_set_* + set_const
    (cassie.py:634-650): dof damping, body masses, body com offsets, floor
    friction, floor orientation (slope), with encoder noise handled at the
    env layer.
    """
    body_mass: jnp.ndarray     # (nbody,)
    body_ipos: jnp.ndarray     # (nbody, 3)
    dof_damping: jnp.ndarray   # (nv,)
    friction: jnp.ndarray      # scalar, translational mu
    floor_quat: jnp.ndarray    # (4,) floor plane orientation
    floor_pos: jnp.ndarray     # (3,) point on the floor plane
    ext_force: jnp.ndarray     # (6,) [torque, force] world wrench on the
                               # root body (cassie_sim_apply_force equivalent,
                               # include/cassiemujoco.h)
    # heightfield terrain (cassie_sim_set_hfielddata / hfield_size
    # equivalents; reference terrain xml variants). heights in meters on a
    # HFIELD_RES^2 grid spanning +-hfield_radius; all-zeros = flat. When
    # hfield_active > 0 the terrain path replaces the (possibly tilted)
    # plane.
    hfield: jnp.ndarray        # (HFIELD_RES, HFIELD_RES)
    hfield_radius: jnp.ndarray  # scalar, half-extent in x and y
    hfield_active: jnp.ndarray  # scalar 0/1

    @staticmethod
    def from_model(model: PhysModel) -> "PhysParams":
        return PhysParams(
            body_mass=jnp.asarray(model.body_mass),
            body_ipos=jnp.asarray(model.body_ipos),
            dof_damping=jnp.asarray(model.dof_damping),
            friction=jnp.asarray(1.0),
            floor_quat=jnp.asarray(model.floor_quat),
            floor_pos=jnp.asarray(model.floor_pos),
            ext_force=jnp.zeros(6),
            hfield=jnp.zeros((HFIELD_RES, HFIELD_RES)),
            hfield_radius=jnp.asarray(10.0),
            hfield_active=jnp.zeros(()),
        )


HFIELD_RES = 32


def hfield_lookup(params: "PhysParams", xy: jnp.ndarray):
    """Bilinear terrain height + gradient at world xy ((..., 2)).

    Grid is centered on params.floor_pos, spanning +-hfield_radius."""
    n = HFIELD_RES
    cell = 2.0 * params.hfield_radius / (n - 1)
    u = (xy - params.floor_pos[0:2]) / cell + (n - 1) / 2.0
    u = jnp.clip(u, 0.0, n - 1.001)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    h00 = params.hfield[i0[..., 0], i0[..., 1]]
    h10 = params.hfield[i0[..., 0] + 1, i0[..., 1]]
    h01 = params.hfield[i0[..., 0], i0[..., 1] + 1]
    h11 = params.hfield[i0[..., 0] + 1, i0[..., 1] + 1]
    fx, fy = f[..., 0], f[..., 1]
    h = (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
         + h01 * (1 - fx) * fy + h11 * fx * fy)
    dhdx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) / cell
    dhdy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) / cell
    return h, dhdx, dhdy


class Kinematics(NamedTuple):
    xpos: jnp.ndarray    # (nbody, 3) body frame origins, world
    xquat: jnp.ndarray   # (nbody, 4)
    ximat: jnp.ndarray   # (nbody, 3, 3) rotation matrices
    xipos: jnp.ndarray   # (nbody, 3) com positions, world
    cdof: jnp.ndarray    # (nv, 6) spatial motion axes [ang, lin] about origin
    origin: jnp.ndarray  # (3,) spatial-algebra origin (root position)


class Dynamics(NamedTuple):
    kin: Kinematics
    body_vel: jnp.ndarray   # (nbody, 6) spatial velocities [ang, lin@origin]
    cdof_dot: jnp.ndarray   # (nv, 6)
    M: jnp.ndarray          # (nv, nv) mass matrix (with armature)
    Minv: jnp.ndarray       # (nv, nv)
    qfrc_bias: jnp.ndarray  # (nv,) coriolis + gravity


class ContactInfo(NamedTuple):
    force: jnp.ndarray      # (ncon, 3) world-frame force on the body
    depth: jnp.ndarray      # (ncon,) penetration depth (>0 when touching)
    pos: jnp.ndarray        # (ncon, 3) contact point, world
    vel: jnp.ndarray        # (ncon, 3) contact point velocity


class _Structure:
    """Static index/mask structure derived from the kinematic tree, used to
    vectorize CRBA / jacobian / scatter passes into masked matmuls (keeps the
    XLA graph small: thousands of dynamic-update-slices collapse into a few
    einsums)."""

    def __init__(self, model: PhysModel):
        nb, nv = model.nbody, model.nv
        dof_body = np.zeros(nv, dtype=np.int32)
        for j in model.joints:
            for k in range(DOF_WIDTH[j.jtype]):
                dof_body[j.dofadr + k] = j.body
        # ancestor_mask[b, d] = 1 if dof d lies on the path from body b to
        # the root (including b's own dofs)
        ancestor_mask = np.zeros((nb, nv), dtype=np.float32)
        for b in range(nb):
            cur = b
            while cur != -1:
                for jidx in model.body_joints[cur]:
                    j = model.joints[jidx]
                    ancestor_mask[b, j.dofadr:j.dofadr + DOF_WIDTH[j.jtype]] = 1.0
                cur = int(model.body_parent[cur])
        # crba_mask[d1, d2] = 1 if d2 is an ancestor dof of body(d1) and
        # d2 <= d1 (strict lower wedge + diagonal)
        crba_mask = np.zeros((nv, nv), dtype=np.float32)
        for d1 in range(nv):
            for d2 in range(nv):
                if d2 <= d1 and ancestor_mask[dof_body[d1], d2]:
                    crba_mask[d1, d2] = 1.0

        # passive springs: per-dof stiffness vector + qpos gather index
        spring_k = np.zeros(nv, dtype=np.float32)
        spring_qadr = np.zeros(nv, dtype=np.int32)
        for j in model.joints:
            if j.stiffness != 0.0 and j.jtype != JointType.BALL:
                spring_k[j.dofadr] = j.stiffness
                spring_qadr[j.dofadr] = j.qposadr

        # joint limits
        lim_dof, lim_qadr, lim_lo, lim_hi = [], [], [], []
        for j in model.joints:
            if j.limited and j.jtype != JointType.BALL:
                lim_dof.append(j.dofadr)
                lim_qadr.append(j.qposadr)
                lim_lo.append(j.range[0])
                lim_hi.append(j.range[1])
        self.lim_dof = np.asarray(lim_dof, dtype=np.int32)
        self.lim_qadr = np.asarray(lim_qadr, dtype=np.int32)
        self.lim_lo = np.asarray(lim_lo, dtype=np.float32)
        self.lim_hi = np.asarray(lim_hi, dtype=np.float32)

        # actuators
        self.act_dof = np.asarray(
            [model.joints[a.joint].dofadr for a in model.actuators], np.int32)
        self.act_gear = np.asarray([a.gear for a in model.actuators],
                                   np.float32)
        self.act_lo = np.asarray([a.ctrlrange[0] for a in model.actuators],
                                 np.float32)
        self.act_hi = np.asarray([a.ctrlrange[1] for a in model.actuators],
                                 np.float32)

        self.dof_body = dof_body
        self.ancestor_mask = ancestor_mask
        self.crba_mask = crba_mask
        self.spring_k = spring_k
        self.spring_qadr = spring_qadr

        # contacts, stacked for vectorized collision/jacobian math
        nc = len(model.contacts)
        self.ncon = nc
        self.con_body = np.asarray([c.body for c in model.contacts], np.int32)
        self.con_offset = (np.stack([c.offset for c in model.contacts])
                           if nc else np.zeros((0, 3)))
        self.con_radius = np.asarray([c.radius for c in model.contacts],
                                     np.float32)
        self.con_mask = (ancestor_mask[self.con_body]
                         if nc else np.zeros((0, nv), np.float32))

        # qpos integration index maps (hinge/slide in one scatter)
        lin_dof, lin_qadr, ball_list = [], [], []
        for j in model.joints:
            if j.jtype == JointType.BALL:
                ball_list.append((j.qposadr, j.dofadr))
            else:
                lin_dof.append(j.dofadr)
                lin_qadr.append(j.qposadr)
        self.lin_dof = np.asarray(lin_dof, np.int32)
        self.lin_qadr = np.asarray(lin_qadr, np.int32)
        self.balls = ball_list

        # FK constants: body-frame rotation matrices and per-joint Rodrigues
        # skews (keeps the traced FK to ~15 eqns per body)
        def _np_quat2mat(q):
            w, x, y, z = q
            return np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ])

        self.body_rot = np.stack([_np_quat2mat(model.body_quat[b])
                                  for b in range(nb)])
        self.body_rot_identity = [
            bool(np.allclose(self.body_rot[b], np.eye(3)))
            for b in range(nb)]
        self.joint_K = {}
        for jidx, j in enumerate(model.joints):
            a = np.asarray(j.axis, float)
            K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]],
                          [-a[1], a[0], 0]])
            self.joint_K[jidx] = (K, K @ K)
            if np.linalg.norm(j.pos) > 0:
                raise NotImplementedError(
                    "joints with nonzero anchor not supported by the fast FK")

    @classmethod
    def of(cls, model: PhysModel) -> "_Structure":
        # Cached on the model instance itself (object.__setattr__ bypasses
        # the frozen-dataclass guard): an id()-keyed module dict let a new
        # model silently reuse a GC'd model's structure when CPython
        # recycled the address.
        st = model.__dict__.get("_structure")
        if st is None:
            st = cls(model)
            object.__setattr__(model, "_structure", st)
        return st


# ---------------------------------------------------------------------------
# spatial algebra helpers ([angular, linear] 6-vectors about a common origin)
# ---------------------------------------------------------------------------

def _cross_motion(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """v x m for motion vectors."""
    w, vl = v[:3], v[3:]
    mw, ml = m[:3], m[3:]
    return jnp.concatenate([jnp.cross(w, mw), jnp.cross(w, ml) + jnp.cross(vl, mw)])


def _cross_force(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """v x* f for force vectors."""
    w, vl = v[:3], v[3:]
    tau, F = f[:3], f[3:]
    return jnp.concatenate([jnp.cross(w, tau) + jnp.cross(vl, F), jnp.cross(w, F)])


def _skew(c: jnp.ndarray) -> jnp.ndarray:
    cx, cy, cz = c[0], c[1], c[2]
    z = jnp.zeros(())
    return jnp.array([[z, -cz, cy], [cz, z, -cx], [-cy, cx, z]])


def _spatial_inertia(mass, com, inertia_world) -> jnp.ndarray:
    """6x6 spatial inertia about the spatial origin.

    com: com position relative to origin; inertia_world: 3x3 about com in
    world axes. Featherstone eq. 2.63 with [ang, lin] ordering.
    """
    C = _skew(com)
    upper_left = inertia_world - mass * (C @ C)
    return jnp.block([
        [upper_left, mass * C],
        [-mass * C, mass * jnp.eye(3)],
    ])


# ---------------------------------------------------------------------------
# forward kinematics
# ---------------------------------------------------------------------------

def forward_kinematics(model: PhysModel, params: PhysParams,
                       qpos: jnp.ndarray) -> Kinematics:
    """Position pass (public, differentiable per-env pipeline). For hot
    vmapped FK-only paths (e.g. static_diag at env reset) use
    `forward_kinematics_fleet`, which reroutes the whole fleet through the
    batch-last FK under vmap -- the custom_vmap wrapper there does not
    compose with autodiff, so this entry stays plain."""
    return _forward_kinematics_single(model, params.body_ipos, qpos)


def forward_kinematics_fleet(model: PhysModel, params: PhysParams,
                             qpos: jnp.ndarray) -> Kinematics:
    """forward_kinematics with a custom batching rule: under `vmap` the
    whole fleet routes through the batch-last FK (fleet._fk_bt / the
    Pallas kernel on TPU) -- the vmapped per-env lowering fragments the
    26-body chain into ~100 tiny kernels. NOT differentiable (custom_vmap
    has no JVP rule). Disable with APEX_TPU_NO_FLEET=1."""
    import os

    if os.environ.get("APEX_TPU_NO_FLEET", "") in ("", "0"):
        return _fk_dispatch(model)(params.body_ipos, qpos)
    return _forward_kinematics_single(model, params.body_ipos, qpos)


def _fk_dispatch(model: PhysModel):
    """Per-model custom_vmap wrapper for forward_kinematics (cached on the
    model instance, like _Structure)."""
    f = model.__dict__.get("_fk_cv")
    if f is not None:
        return f

    @jax.custom_batching.custom_vmap
    def f(body_ipos, qpos):
        return _forward_kinematics_single(model, body_ipos, qpos)

    @f.def_vmap
    def _rule(axis_size, in_batched, body_ipos, qpos):
        from apex_tpu.physics import fleet

        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                jnp.asarray(x), (axis_size,) + jnp.shape(x))

        body_ipos = bcast(body_ipos, in_batched[0])
        qpos = bcast(qpos, in_batched[1])
        kin_bt = fleet._fk_bt(model, jnp.moveaxis(body_ipos, 0, -1),
                              jnp.moveaxis(qpos, 0, -1))
        xquat_bt = fleet._mat2quat_bt(kin_bt.ximat)
        to_bf = lambda x: jnp.moveaxis(x, -1, 0)
        out = Kinematics(
            xpos=to_bf(kin_bt.xpos), xquat=to_bf(xquat_bt),
            ximat=to_bf(kin_bt.ximat), xipos=to_bf(kin_bt.xipos),
            cdof=to_bf(kin_bt.cdof), origin=to_bf(kin_bt.origin))
        return out, jax.tree_util.tree_map(lambda _: True, out)

    object.__setattr__(model, "_fk_cv", f)
    return f


def _forward_kinematics_single(model: PhysModel, body_ipos: jnp.ndarray,
                               qpos: jnp.ndarray) -> Kinematics:
    """Position pass. Rotations are propagated as 3x3 matrices with
    constant-folded body frames and Rodrigues joint rotations
    (R_j = I + sin(t) K + (1 - cos(t)) K^2 with K the constant axis skew),
    which keeps the traced graph to ~15 eqns per body. Joint anchors are
    assumed at the body origin (true for the Cassie and Walker2d models;
    enforced at _Structure build)."""
    nb, nv = model.nbody, model.nv
    st = _Structure.of(model)
    xpos: List = [None] * nb
    xmat: List = [None] * nb
    cdof_rows: List = [None] * nv

    # origin shift: root body translation (gauge choice for f32 stability
    # over long runs; all spatial quantities are formed about this point)
    origin = jax.lax.stop_gradient(qpos[0:3]) if nv >= 3 else jnp.zeros(3)
    eye3 = jnp.eye(3)

    for i in range(nb):
        p = model.body_parent[i]
        if p == -1:
            pos = jnp.asarray(model.body_pos[i]) - origin
            R = jnp.asarray(st.body_rot[i])
        else:
            pos = xpos[p] + xmat[p] @ jnp.asarray(model.body_pos[i])
            if st.body_rot_identity[i]:
                R = xmat[p]
            else:
                R = xmat[p] @ jnp.asarray(st.body_rot[i])

        for jidx in model.body_joints[i]:
            j = model.joints[jidx]
            if j.jtype == JointType.SLIDE:
                axis_w = R @ jnp.asarray(j.axis)
                pos = pos + axis_w * (qpos[j.qposadr] - j.ref)
                cdof_rows[j.dofadr] = jnp.concatenate([jnp.zeros(3), axis_w])
            elif j.jtype == JointType.HINGE:
                axis_w = R @ jnp.asarray(j.axis)
                angle = qpos[j.qposadr] - j.ref
                K, KK = st.joint_K[jidx]
                Rj = eye3 + jnp.sin(angle) * jnp.asarray(K) \
                    + (1.0 - jnp.cos(angle)) * jnp.asarray(KK)
                R = R @ Rj
                cdof_rows[j.dofadr] = jnp.concatenate(
                    [axis_w, jnp.cross(axis_w, -pos)])
            else:  # BALL
                q_j = qpos[j.qposadr:j.qposadr + 4]
                q_j = q_j / jnp.linalg.norm(q_j)
                R = R @ quat2mat(q_j)
                # ball qvel is in the child (post-joint) frame (MuJoCo
                # convention) -> world axes are the child frame axes
                for k in range(3):
                    axis_w = R[:, k]
                    cdof_rows[j.dofadr + k] = jnp.concatenate(
                        [axis_w, jnp.cross(axis_w, -pos)])
        xpos[i], xmat[i] = pos, R

    xpos_a = jnp.stack(xpos)
    ximat = jnp.stack(xmat)
    xquat_a = mat2quat(ximat)
    xipos = xpos_a + jnp.sum(ximat * body_ipos[..., None, :], axis=-1)
    return Kinematics(xpos=xpos_a, xquat=xquat_a, ximat=ximat, xipos=xipos,
                      cdof=jnp.stack(cdof_rows), origin=origin)


# ---------------------------------------------------------------------------
# velocities, mass matrix, bias forces
# ---------------------------------------------------------------------------

def _body_dofs(model: PhysModel, i: int) -> List[int]:
    dofs = []
    for jidx in model.body_joints[i]:
        j = model.joints[jidx]
        dofs.extend(range(j.dofadr, j.dofadr + DOF_WIDTH[j.jtype]))
    return dofs


def _ancestor_dofs(model: PhysModel, i: int) -> List[int]:
    """All dofs on the path from body i to the root, in address order."""
    dofs: List[int] = []
    cur = i
    while cur != -1:
        dofs = _body_dofs(model, cur) + dofs
        cur = int(model.body_parent[cur])
    return dofs


def _cross_motion_batch(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Rowwise v x m for (N, 6) motion-vector arrays."""
    w, vl = v[..., :3], v[..., 3:]
    mw, ml = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, ml) + jnp.cross(vl, mw)], axis=-1)


def _cross_force_batch(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Rowwise v x* f for (N, 6) arrays."""
    w, vl = v[..., :3], v[..., 3:]
    tau, F = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, tau) + jnp.cross(vl, F), jnp.cross(w, F)], axis=-1)


def compute_dynamics(model: PhysModel, params: PhysParams, qpos: jnp.ndarray,
                     qvel: jnp.ndarray) -> Dynamics:
    """Velocities, mass matrix, bias forces -- tree recursions expressed as
    masked matmuls over the static ancestor structure, so the whole pass is
    a handful of MXU-friendly einsums instead of per-body scatter loops:

      v_i        = sum_{d in anc(i)} cdof_d qvel_d          = A_i (q. * cdof)
      cdof_dot_d = v_pre(d) x cdof_d,   v_pre via the strict ancestor mask
      a_i        = a_0 + sum_{d in anc(i)} cdof_dot_d qvel_d
      qfrc_bias  = cdof . (A^T f)       (A^T accumulates subtree wrenches)
      M          = tree-masked cdof I^C cdof^T
    """
    nb, nv = model.nbody, model.nv
    kin = forward_kinematics(model, params, qpos)
    st = _Structure.of(model)
    A = jnp.asarray(st.ancestor_mask)            # (nb, nv)
    dof_body = jnp.asarray(st.dof_body)

    wdof = kin.cdof * qvel[:, None]              # (nv, 6)
    body_vel = A @ wdof                          # (nb, 6)

    # velocity "before" each dof = ancestors of dof's body excluding the dof
    # itself and later dofs on the same body: strict crba mask
    strict = jnp.asarray(st.crba_mask) - jnp.eye(nv)
    v_pre = strict @ wdof                        # (nv, 6)
    cdof_dot = _cross_motion_batch(v_pre, kin.cdof)

    # --- spatial inertias about origin (batched) ---
    # R I0 R^T expanded as broadcast-multiply-reduce: under vmap the einsum
    # forms lower to (B*nb)-batched 3x3 MXU matmuls at <1% utilization and
    # dominated the whole substep (~1.4 ms of 2.4 ms at B=1024); the
    # elementwise forms ride the VPU across the fleet.
    I0 = jnp.asarray(model.body_inertia)         # (nb, 3, 3)
    R = kin.ximat
    T = jnp.sum(R[..., :, :, None] * I0[..., None, :, :], axis=-2)
    I_world = jnp.sum(T[..., :, None, :] * R[..., None, :, :], axis=-1)
    # skew(c)^2 = c c^T - |c|^2 I (closed form, no batched matmul)
    c = kin.xipos                                # (nb, 3)
    ccT = c[..., :, None] * c[..., None, :]
    cc = jnp.sum(c * c, axis=-1)
    eye3 = jnp.eye(3)
    CC = ccT - cc[..., None, None] * eye3
    C = jax.vmap(_skew)(kin.xipos)               # (nb, 3, 3)
    mass = params.body_mass
    upper_left = I_world - mass[:, None, None] * CC
    mC = mass[:, None, None] * C
    inertias = jnp.concatenate([
        jnp.concatenate([upper_left, mC], axis=2),
        jnp.concatenate([-mC, mass[:, None, None]
                         * jnp.broadcast_to(eye3, (nb, 3, 3))], axis=2),
    ], axis=1)                                   # (nb, 6, 6)

    # --- RNEA bias with qacc=0, gravity as base acceleration ---
    grav = jnp.asarray(model.gravity)
    a0 = jnp.concatenate([jnp.zeros(3), -grav])
    body_acc = a0[None, :] + A @ (cdof_dot * qvel[:, None])   # (nb, 6)
    # 6x6 matvecs as explicit mul-reduce (same MXU-underutilization issue)
    Iv = jnp.sum(inertias * body_vel[..., None, :], axis=-1)
    body_frc = jnp.sum(inertias * body_acc[..., None, :], axis=-1) + \
        _cross_force_batch(body_vel, Iv)         # (nb, 6)

    # subtree wrench accumulation: dof d sees bodies whose ancestry contains
    # d, i.e. column d of A
    F_sub = A.T @ body_frc                       # (nv, 6)
    qfrc_bias = jnp.sum(kin.cdof * F_sub, axis=-1)

    # --- CRBA: composite inertia per dof via the same transpose trick ---
    Ic_dof = jnp.einsum("bv,bij->vij", A, inertias)           # (nv, 6, 6)
    H = jnp.sum(Ic_dof * kin.cdof[:, None, :], axis=-1)       # (nv, 6)
    # (nv,6)@(6,nv): mul-reduce beats a (B)-batched skinny MXU matmul
    M_full = jnp.sum(H[:, None, :] * kin.cdof[None, :, :], axis=-1)
    Ml = M_full * jnp.asarray(st.crba_mask)
    M = Ml + Ml.T - jnp.diag(jnp.diag(Ml))
    M = M + jnp.diag(jnp.asarray(model.dof_armature))

    # effective-mass inverse for constraint impedances (damped M for
    # consistency with the implicit integrator). Under vmap this routes the
    # whole fleet through one fused Pallas Cholesky-inverse kernel; XLA's
    # pivoted-LU inv is pathologically slow/fragile batched on TPU and the
    # unrolled jnp form is kernel-launch bound.
    Minv = batched_spd_inverse(
        M + model.timestep * jnp.diag(params.dof_damping))

    return Dynamics(kin=kin, body_vel=body_vel, cdof_dot=cdof_dot, M=M,
                    Minv=Minv, qfrc_bias=qfrc_bias)


# ---------------------------------------------------------------------------
# constraint forces (soft, effective-mass scaled)
# ---------------------------------------------------------------------------

def _point_jacobian(model: PhysModel, kin: Kinematics, body: int,
                    point: jnp.ndarray) -> jnp.ndarray:
    """(3, nv) translational jacobian of a world point on `body` (about the
    spatial origin, so point must be origin-shifted). Vectorized over all
    dofs with a static ancestor mask."""
    st = _Structure.of(model)
    cols = jnp.cross(kin.cdof[:, :3], point[None, :]) + kin.cdof[:, 3:]
    return (jnp.asarray(st.ancestor_mask[body])[:, None] * cols).T


def _point_velocity(kin_vel_row: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """World velocity of a body point (origin-shifted) from spatial velocity."""
    return kin_vel_row[3:] + jnp.cross(kin_vel_row[:3], point)


def constraint_forces(model: PhysModel, params: PhysParams, dyn: Dynamics,
                      qvel: jnp.ndarray) -> Tuple[jnp.ndarray, ContactInfo]:
    """Contacts + loop-closure equalities + joint limits as soft constraints.

    Per-constraint impedance from solref (timeconst tau, dampratio zeta):
      k = m_eff / (tau^2 * zeta^2),  b = 2 m_eff / tau
    with m_eff = 1 / diag(J Minv J^T) -- the diagonal Delassus approximation.
    """
    kin = dyn.kin
    nv = model.nv
    tau_c = model.solref_timeconst
    zeta = model.solref_dampratio
    k_unit = 1.0 / (tau_c * tau_c * zeta * zeta)
    b_unit = 2.0 / tau_c

    st = _Structure.of(model)
    qfrc = jnp.zeros(nv)

    # ---- floor contacts (fully vectorized over the nc contact spheres) ----
    n_w = quat_rotate(params.floor_quat, jnp.array([0.0, 0.0, 1.0]))
    floor_p = params.floor_pos - kin.origin

    if st.ncon:
        cb = jnp.asarray(st.con_body)
        p = kin.xpos[cb] + jnp.einsum(
            "cij,cj->ci", kin.ximat[cb], jnp.asarray(st.con_offset))  # (nc,3)
        radius = jnp.asarray(st.con_radius)
        # plane terrain (possibly tilted by slope randomization)
        depth_plane = radius - (p - floor_p) @ n_w                    # (nc,)
        p_world = p + kin.origin
        if model.enable_hfield:
            # heightfield terrain (replaces the plane when active)
            h, dhdx, dhdy = hfield_lookup(params, p_world[:, 0:2])
            n_h = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)], axis=-1)
            n_h = n_h / jnp.linalg.norm(n_h, axis=-1, keepdims=True)
            depth_h = radius + (params.floor_pos[2] + h) - p_world[:, 2]
            active = params.hfield_active > 0.5
            depth = jnp.where(active, depth_h, depth_plane)
            n_c = jnp.where(active, n_h,
                            jnp.broadcast_to(n_w, n_h.shape))
        else:
            depth = depth_plane
            n_c = jnp.broadcast_to(n_w, (st.ncon, 3))

        bv = dyn.body_vel[cb]                                         # (nc,6)
        v_p = bv[:, 3:] + jnp.cross(bv[:, :3], p)                     # (nc,3)

        # jacobians: (nc, nv, 3), masked by tree ancestry
        cols = (jnp.cross(kin.cdof[None, :, :3], p[:, None, :])
                + kin.cdof[None, :, 3:])
        J = jnp.asarray(st.con_mask)[:, :, None] * cols
        JM = jnp.einsum("cvi,vw->cwi", J, dyn.Minv)
        G = jnp.einsum("cwi,cwj->cij", JM, J)                         # (nc,3,3)
        g_n = jnp.einsum("ci,cij,cj->c", n_c, G, n_c)
        m_n = 1.0 / jnp.maximum(g_n, 1e-8)
        vn = jnp.sum(v_p * n_c, axis=-1)
        fn = jnp.maximum(0.0, m_n * (k_unit * depth - b_unit * vn))
        fn = jnp.where(depth > 0, fn, 0.0)

        vt = v_p - vn[:, None] * n_c
        vt_norm = jnp.linalg.norm(vt, axis=-1) + 1e-9
        trG = G[:, 0, 0] + G[:, 1, 1] + G[:, 2, 2]
        m_t = 1.0 / jnp.maximum((trG - g_n) / 2.0, 1e-8)
        # stiction cap: force that would stop sliding within ~2 steps
        f_stick = m_t * vt_norm / (2.0 * model.timestep)
        ft_mag = jnp.minimum(params.friction * fn, f_stick)
        ft = -(ft_mag / vt_norm)[:, None] * vt

        f = fn[:, None] * n_c + ft                                    # (nc,3)
        qfrc = qfrc + jnp.einsum("cvi,ci->v", J, f)
        contact_info = ContactInfo(force=f, depth=depth,
                                   pos=p_world, vel=v_p)
    else:
        contact_info = ContactInfo(force=jnp.zeros((0, 3)),
                                   depth=jnp.zeros((0,)),
                                   pos=jnp.zeros((0, 3)),
                                   vel=jnp.zeros((0, 3)))

    return qfrc, contact_info


def equality_jacobian(model: PhysModel, dyn: Dynamics
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(J_eq (3*neq, nv), err (3*neq,)) for the connect constraints.

    The loop-closure rods (achilles, plantar -- cassie.xml:225-230) are
    physically rigid push-rods; compliance in the real mechanism lives in
    the heel-spring hinge (stiffness 1250), which the joint-spring model
    already captures. The connects are therefore enforced (nearly) rigidly
    at the velocity level -- see `step` -- rather than as acceleration-level
    soft springs, whose stable stiffness at dt=0.5 ms is orders of magnitude
    too low for the rod load path (the stretch direction is dominated by the
    heel-spring dof's ~1e-3 kg m^2 effective inertia).
    """
    kin = dyn.kin
    rows, errs = [], []
    for eq in model.equalities:
        b1, b2 = eq.body1, eq.body2
        p1 = kin.xpos[b1] + kin.ximat[b1] @ jnp.asarray(eq.anchor1)
        p2 = kin.xpos[b2] + kin.ximat[b2] @ jnp.asarray(eq.anchor2)
        errs.append(p1 - p2)
        rows.append(_point_jacobian(model, kin, b1, p1)
                    - _point_jacobian(model, kin, b2, p2))
    return jnp.concatenate(rows, axis=0), jnp.concatenate(errs)


def joint_limit_forces(model: PhysModel, params: PhysParams, dyn: Dynamics,
                       qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
    """Soft joint-limit torques (limited hinge/slide joints), vectorized."""
    st = _Structure.of(model)
    if len(st.lim_dof) == 0:
        return jnp.zeros(model.nv)
    tau_c = model.solref_timeconst
    zeta = model.solref_dampratio
    k_unit = 1.0 / (tau_c * tau_c * zeta * zeta)
    b_unit = 2.0 / tau_c

    dof = jnp.asarray(st.lim_dof)
    q = qpos[jnp.asarray(st.lim_qadr)]
    qd = qvel[dof]
    m_eff = 1.0 / jnp.maximum(jnp.diag(dyn.Minv)[dof], 1e-8)
    below = jnp.asarray(st.lim_lo) - q
    above = q - jnp.asarray(st.lim_hi)
    f_lo = jnp.where(below > 0, m_eff * (k_unit * below - b_unit * qd), 0.0)
    f_hi = jnp.where(above > 0, m_eff * (k_unit * above + b_unit * qd), 0.0)
    f = jnp.maximum(f_lo, 0.0) - jnp.maximum(f_hi, 0.0)
    return jnp.zeros(model.nv).at[dof].add(f)


def passive_forces(model: PhysModel, qpos: jnp.ndarray) -> jnp.ndarray:
    """Joint springs: -stiffness * (qpos - springref(=0)). Damping is folded
    into the implicit integrator. (cassie shin/heel springs, cassie.xml:117,
    127: stiffness 1500/1250.)"""
    st = _Structure.of(model)
    return -jnp.asarray(st.spring_k) * qpos[jnp.asarray(st.spring_qadr)]


def actuator_forces(model: PhysModel, ctrl: jnp.ndarray) -> jnp.ndarray:
    """qfrc = gear * clip(ctrl, ctrlrange) on the actuated dofs
    (cassie.xml:232-244)."""
    if model.nu == 0:
        return jnp.zeros(model.nv)
    st = _Structure.of(model)
    u = jnp.clip(ctrl, jnp.asarray(st.act_lo), jnp.asarray(st.act_hi))
    return jnp.zeros(model.nv).at[jnp.asarray(st.act_dof)].add(
        jnp.asarray(st.act_gear) * u)


# ---------------------------------------------------------------------------
# integration step
# ---------------------------------------------------------------------------

class StepOut(NamedTuple):
    qpos: jnp.ndarray
    qvel: jnp.ndarray
    qacc: jnp.ndarray
    contact: ContactInfo
    kin: Kinematics
    actuator_torque: jnp.ndarray  # (nu,) joint-level torques applied


def _external_wrench(model: PhysModel, dyn: Dynamics,
                     wrench: jnp.ndarray) -> jnp.ndarray:
    """Generalized force of a world-frame [torque, force] wrench applied at
    the root body origin (cassie_sim_apply_force equivalent)."""
    st = _Structure.of(model)
    kin = dyn.kin
    tau, F = wrench[:3], wrench[3:]
    # wrench about the spatial origin: the root body origin is at
    # kin.xpos[0] (origin-shifted)
    w = jnp.concatenate([tau + jnp.cross(kin.xpos[0], F), F])
    qfrc = (kin.cdof @ w) * jnp.asarray(st.ancestor_mask[0])
    return qfrc


BAUMGARTE_BETA = 0.2   # per-substep fraction of connect error corrected


def step(model: PhysModel, params: PhysParams, qpos: jnp.ndarray,
         qvel: jnp.ndarray, ctrl: jnp.ndarray) -> StepOut:
    """One physics substep (dt = model.timestep, 0.0005s for cassie).

    Public entry: unbatched calls run the per-env pipeline below; under
    `vmap` a custom batching rule reroutes the WHOLE fleet through the
    batch-last implementation in physics/fleet.py (same math, fleet-friendly
    layout -- see that module's docstring). Disable with APEX_TPU_NO_FLEET=1.
    """
    import os

    if os.environ.get("APEX_TPU_NO_FLEET", "") in ("", "0"):
        return _step_dispatch(model)(params, qpos, qvel, ctrl)
    return _step_single(model, params, qpos, qvel, ctrl)


def _step_dispatch(model: PhysModel):
    """Per-model custom_vmap wrapper (cached on the model instance, like
    _Structure): primal = per-env step, vmap rule = batch-last fleet step."""
    f = model.__dict__.get("_step_cv")
    if f is not None:
        return f

    @jax.custom_batching.custom_vmap
    def f(params, qpos, qvel, ctrl):
        return _step_single(model, params, qpos, qvel, ctrl)

    @f.def_vmap
    def _rule(axis_size, in_batched, params, qpos, qvel, ctrl):
        from apex_tpu.physics import fleet

        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                jnp.asarray(x), (axis_size,) + jnp.shape(x))

        params = jax.tree_util.tree_map(bcast, params, in_batched[0])
        qpos = bcast(qpos, in_batched[1])
        qvel = bcast(qvel, in_batched[2])
        ctrl = bcast(ctrl, in_batched[3])
        out = fleet.fleet_step_batch_first(model, params, qpos, qvel, ctrl)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    object.__setattr__(model, "_step_cv", f)
    return f


def _step_single(model: PhysModel, params: PhysParams, qpos: jnp.ndarray,
                 qvel: jnp.ndarray, ctrl: jnp.ndarray) -> StepOut:
    """One per-env physics substep (the reference pipeline).

    Pipeline: smooth forces (actuation, springs, bias) and penalty contacts /
    joint limits at the acceleration level; loop-closure connects as
    velocity-level impulses with Baumgarte position stabilization
    (unconditionally stable, near-rigid -- see equality_jacobian docstring).
    """
    dyn = compute_dynamics(model, params, qpos, qvel)

    qfrc_con, contact = constraint_forces(model, params, dyn, qvel)
    qfrc_lim = joint_limit_forces(model, params, dyn, qpos, qvel)
    qfrc_spring = passive_forces(model, qpos)
    qfrc_act = actuator_forces(model, ctrl)
    qfrc_ext = _external_wrench(model, dyn, params.ext_force)

    qfrc = (qfrc_act + qfrc_spring + qfrc_con + qfrc_lim + qfrc_ext
            - dyn.qfrc_bias)
    # implicit damping (MuJoCo Euler): solve (M + hD) dv = h (qfrc - D qvel)
    h = model.timestep
    D = params.dof_damping
    Ainv = dyn.Minv   # (M + hD)^-1, computed in compute_dynamics
    qacc_free = Ainv @ (qfrc - D * qvel)
    v_pred = qvel + h * qacc_free

    if model.equalities:
        # velocity-level impulse: G lambda = -(J v_pred + beta/h * err),
        # Jacobi-preconditioned for f32 (the Delassus operator couples dofs
        # with ~1e5 mass ratio)
        J_eq, err = equality_jacobian(model, dyn)
        G = J_eq @ Ainv @ J_eq.T
        d = jax.lax.rsqrt(jnp.diag(G) + 1e-12)
        Gs = d[:, None] * G * d[None, :] + 1e-6 * jnp.eye(G.shape[0])
        rhs = -(J_eq @ v_pred + (BAUMGARTE_BETA / h) * err)
        # pivot_floor 1e-4: Gs is Jacobi-normalized (unit diagonal), so a
        # smaller Cholesky pivot is a numerically singular direction;
        # without the floor the cascaded 1/pivot factors overflow f32 for
        # flailing states (Inf impulses -> NaN qvel)
        from apex_tpu.ops.linalg import spd_solve

        lam = d * spd_solve(Gs, d * rhs, pivot_floor=1e-4)
        new_qvel = v_pred + Ainv @ (J_eq.T @ lam)
    else:
        new_qvel = v_pred

    qacc = (new_qvel - qvel) / h
    new_qpos = _integrate_qpos(model, qpos, new_qvel, h)

    if model.nu:
        st = _Structure.of(model)
        act_torque = jnp.asarray(st.act_gear) * jnp.clip(
            ctrl, jnp.asarray(st.act_lo), jnp.asarray(st.act_hi))
    else:
        act_torque = jnp.zeros(0)

    return StepOut(qpos=new_qpos, qvel=new_qvel, qacc=qacc, contact=contact,
                   kin=dyn.kin, actuator_torque=act_torque)


def _integrate_qpos(model: PhysModel, qpos: jnp.ndarray, qvel: jnp.ndarray,
                    h: float) -> jnp.ndarray:
    st = _Structure.of(model)
    # hinge/slide dofs in one scatter-add
    new_qpos = qpos.at[jnp.asarray(st.lin_qadr)].add(
        h * qvel[jnp.asarray(st.lin_dof)])
    # ball quaternions (body-frame angular velocity, exponential map)
    for qadr, dofadr in st.balls:
        q = qpos[qadr:qadr + 4]
        w = qvel[dofadr:dofadr + 3]
        new_qpos = new_qpos.at[qadr:qadr + 4].set(quat_integrate(q, w, h))
    return new_qpos


# ---------------------------------------------------------------------------
# energies (for tests)
# ---------------------------------------------------------------------------

def total_energy(model: PhysModel, params: PhysParams, qpos: jnp.ndarray,
                 qvel: jnp.ndarray) -> jnp.ndarray:
    """Kinetic + gravitational + joint-spring potential energy."""
    dyn = compute_dynamics(model, params, qpos, qvel)
    ke = 0.5 * qvel @ dyn.M @ qvel
    g = jnp.asarray(model.gravity)
    pe = -jnp.sum(params.body_mass *
                  ((dyn.kin.xipos + dyn.kin.origin) @ g))
    se = jnp.zeros(())
    for j in model.joints:
        if j.stiffness != 0.0 and j.jtype != JointType.BALL:
            se = se + 0.5 * j.stiffness * qpos[j.qposadr] ** 2
    return ke + pe + se
