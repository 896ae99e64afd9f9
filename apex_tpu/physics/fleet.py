"""Batch-last fleet physics: the whole env fleet through one substep.

The per-env engine (engine.py) is semantically ideal but, under vmap, every
intermediate carries the fleet on the LEADING axis with tiny trailing dims
(3, 6, nv) -- on TPU those trailing dims land on the 128-wide lane minor
dimension at <5-25% occupancy, so the 2 kHz substep runs at a few percent of
the VPU roofline (measured 1.35 us/env/substep at fleet 1024 on v5e).

This module is the same pipeline re-laid out batch-LAST: every array is
shape + (B,), so
  * elementwise spatial algebra gets full (8, 128) tiles (B is the lane dim);
  * the tree recursions (ancestor/CRBA masks -- engine.py _Structure) become
    plain dense matmuls `mask @ X.reshape(k, -1)` with a CONSTANT left
    operand, i.e. real MXU work shared across the fleet instead of nb*nv
    per-env scatter math;
  * the per-substep SPD inverse feeds the Pallas Cholesky kernel
    (ops/pallas_linalg.py) in its native (n, n, B) layout with no
    transposes.

`engine.step` dispatches here through a custom_vmap rule, so the public
per-env API (and every env built on it) is unchanged: vmap(step) IS the
fleet step. Numerics are the same math in the same order; fleet-vs-per-env
parity is pinned by tests/test_fleet_parity.py.

Reference parity anchor: this is still the TPU-native replacement for
`cassie_sim_step_pd`'s mj_step path (reference include/cassiemujoco.h:80);
see engine.py for the per-component citations.
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from apex_tpu.physics.engine import (
    BAUMGARTE_BETA,
    ContactInfo,
    HFIELD_RES,
    Kinematics,
    PhysParams,
    StepOut,
    _Structure,
)
from apex_tpu.physics.spec import DOF_WIDTH, JointType, PhysModel


# ---------------------------------------------------------------------------
# batch-last helpers: arrays are shape + (B,)
# ---------------------------------------------------------------------------

def _cross_bt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product over axis -2 of (..., 3, B) arrays."""
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack([a1 * b2 - a2 * b1,
                      a2 * b0 - a0 * b2,
                      a0 * b1 - a1 * b0], axis=-2)


def _cross_motion_bt(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """v x m for (..., 6, B) motion vectors (engine._cross_motion_batch)."""
    w, vl = v[..., :3, :], v[..., 3:, :]
    mw, ml = m[..., :3, :], m[..., 3:, :]
    return jnp.concatenate(
        [_cross_bt(w, mw), _cross_bt(w, ml) + _cross_bt(vl, mw)], axis=-2)


def _cross_force_bt(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """v x* f for (..., 6, B) force vectors (engine._cross_force_batch)."""
    w, vl = v[..., :3, :], v[..., 3:, :]
    tau, F = f[..., :3, :], f[..., 3:, :]
    return jnp.concatenate(
        [_cross_bt(w, tau) + _cross_bt(vl, F), _cross_bt(w, F)], axis=-2)


def _mat_mul_c(R: jnp.ndarray, C: np.ndarray) -> jnp.ndarray:
    """(3, 3, B) @ constant (3, 3): explicit FMA form (zero entries of C
    constant-fold away; keeps the lowering on full-lane VPU ops)."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            t = None
            for k in range(3):
                c = float(C[k, j])
                if c == 0.0:
                    continue
                term = R[i, k] if c == 1.0 else R[i, k] * c
                t = term if t is None else t + term
            cols.append(jnp.zeros_like(R[0, 0]) if t is None else t)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _mat_mul_bt(A: jnp.ndarray, B_: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, B) @ (3, 3, B)."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(A[i, 0] * B_[0, j] + A[i, 1] * B_[1, j]
                        + A[i, 2] * B_[2, j])
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _matvec_c(R: jnp.ndarray, v: np.ndarray) -> jnp.ndarray:
    """(3, 3, B) @ constant (3,)."""
    out = []
    for i in range(3):
        t = None
        for k in range(3):
            c = float(v[k])
            if c == 0.0:
                continue
            term = R[i, k] if c == 1.0 else R[i, k] * c
            t = term if t is None else t + term
        out.append(jnp.zeros_like(R[0, 0]) if t is None else t)
    return jnp.stack(out)


def _mm_left(Mc: np.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Constant (m, k) @ X (k, ..., B): ONE dense MXU matmul over the
    flattened trailing dims -- this is how the per-env tree recursions
    (ancestor/CRBA masks) are shared across the whole fleet.

    Precision HIGHEST is load-bearing: the default TPU matmul runs in
    bf16, and the mass matrix built downstream of these products spans
    ~7 orders of magnitude (1e-5 kg m^2 rod inertias vs 60 kg pelvis
    rows) -- bf16 accumulation made M indefinite for ~1% of envs, and the
    Cholesky then emitted Inf (observed as per-env NaNs at fleet >= 1024
    that vanished at small B where XLA picked a VPU lowering)."""
    Mc = jnp.asarray(Mc)
    k = X.shape[0]
    flat = X.reshape(k, -1)
    out = jax.lax.dot(Mc, flat, precision=jax.lax.Precision.HIGHEST)
    return out.reshape((Mc.shape[0],) + X.shape[1:])


def _quat2mat_bt(q: jnp.ndarray) -> jnp.ndarray:
    """(4, B) wxyz -> (3, 3, B)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)]),
    ])


def _mat2quat_bt(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3, B) -> (..., 4, B) wxyz, w >= 0; same branch-free max-trace
    selection as utils.quaternion.mat2quat."""
    m00, m01, m02 = m[..., 0, 0, :], m[..., 0, 1, :], m[..., 0, 2, :]
    m10, m11, m12 = m[..., 1, 0, :], m[..., 1, 1, :], m[..., 1, 2, :]
    m20, m21, m22 = m[..., 2, 0, :], m[..., 2, 1, :], m[..., 2, 2, :]
    tr = m00 + m11 + m22

    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12)) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-2)
    s1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, s1 / 4.0, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-2)
    s2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, s2 / 4.0,
                    (m12 + m21) / s2], axis=-2)
    s3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    s3 / 4.0], axis=-2)

    cond0 = (tr > 0.0)[..., None, :]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None, :]
    cond2 = (m11 >= m22)[..., None, :]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    q = q / jnp.sqrt(jnp.sum(q * q, axis=-2, keepdims=True))
    return jnp.where(q[..., 0:1, :] < 0, -q, q)


def _quat_rotate_bt(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate (3, B) vectors by (4, B) quaternions (w x y z)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    u = jnp.stack([x, y, z])
    uv = _cross_bt(u, v)
    uuv = _cross_bt(u, uv)
    return v + 2.0 * (w[None] * uv + uuv)


def _quat_integrate_bt(q: jnp.ndarray, omega: jnp.ndarray,
                       dt: float) -> jnp.ndarray:
    """(4, B), (3, B) body-frame omega -> exponential-map update
    (utils.quaternion.quat_integrate semantics)."""
    angle = jnp.sqrt(jnp.sum(omega * omega, axis=0, keepdims=True)) * dt
    half = 0.5 * angle
    # sinc-based axis term, matching utils.quaternion.quat_integrate exactly
    small = angle < 1e-8
    k = jnp.where(small, 0.5 * dt,
                  jnp.sin(half) * dt / jnp.where(small, 1.0, angle))
    dq = jnp.concatenate([jnp.cos(half), omega * k], axis=0)
    w1, x1, y1, z1 = q[0], q[1], q[2], q[3]
    w2, x2, y2, z2 = dq[0], dq[1], dq[2], dq[3]
    out = jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])
    return out / jnp.sqrt(jnp.sum(out * out, axis=0, keepdims=True))


def _spd_inverse_bt(A: jnp.ndarray) -> jnp.ndarray:
    """(n, n, B) SPD inverse: Pallas kernel on TPU (native layout), unrolled
    Cholesky elsewhere."""
    if jax.default_backend() not in ("cpu", "gpu"):
        from apex_tpu.ops.pallas_linalg import (default_block,
                                                pallas_spd_inverse_bt)

        return pallas_spd_inverse_bt(
            A, block_b=default_block(A.shape[0], A.shape[-1]))
    from apex_tpu.ops.linalg import spd_inverse

    return jnp.moveaxis(spd_inverse(jnp.moveaxis(A, -1, 0)), 0, -1)


def _chol_solve_bt(A: jnp.ndarray, b: jnp.ndarray,
                   pivot_floor: float = 1e-4) -> jnp.ndarray:
    """Unrolled Cholesky solve for small (k, k, B) systems, batch-last.

    pivot_floor defaults to 1e-4 because the only caller solves the
    Jacobi-normalized (unit-diagonal) equality Delassus system: a smaller
    pivot is a numerically singular direction, and letting it through
    cascades 1/d factors that overflow f32 (observed as Inf impulses for
    ~1% of flailing envs, batch-size-dependent via fusion order)."""
    k = A.shape[0]
    L = [[None] * k for _ in range(k)]
    for j in range(k):
        s = A[j, j]
        for p in range(j):
            s = s - L[j][p] * L[j][p]
        d = jnp.sqrt(jnp.maximum(s, pivot_floor))
        L[j][j] = d
        for i in range(j + 1, k):
            r = A[i, j]
            for p in range(j):
                r = r - L[i][p] * L[j][p]
            L[i][j] = r / d
    # forward
    y = [None] * k
    for i in range(k):
        r = b[i]
        for p in range(i):
            r = r - L[i][p] * y[p]
        y[i] = r / L[i][i]
    # back
    x = [None] * k
    for i in reversed(range(k)):
        r = y[i]
        for p in range(i + 1, k):
            r = r - L[p][i] * x[p]
        x[i] = r / L[i][i]
    return jnp.stack(x)


# ---------------------------------------------------------------------------
# forward kinematics (batch-last mirror of engine.forward_kinematics)
# ---------------------------------------------------------------------------

class FleetKin(NamedTuple):
    xpos: jnp.ndarray    # (nb, 3, B)
    ximat: jnp.ndarray   # (nb, 3, 3, B)
    xipos: jnp.ndarray   # (nb, 3, B)
    cdof: jnp.ndarray    # (nv, 6, B)
    origin: jnp.ndarray  # (3, B)


def _fk_bt(model: PhysModel, body_ipos: jnp.ndarray,
           qpos: jnp.ndarray) -> FleetKin:
    """qpos (nq, B), body_ipos (nb, 3, B). On TPU the whole position pass
    runs as ONE Pallas program (fleet_fk.py) -- the XLA lowering of the
    body-chain fragments into ~100 tiny kernels and ran 50x off roofline."""
    if jax.default_backend() not in ("cpu", "gpu"):
        from apex_tpu.physics.fleet_fk import pallas_fk

        xpos, ximat, xipos, cdof, origin = pallas_fk(model, body_ipos, qpos)
        return FleetKin(xpos=xpos, ximat=ximat, xipos=xipos, cdof=cdof,
                        origin=origin)
    nb, nv = model.nbody, model.nv
    st = _Structure.of(model)
    B = qpos.shape[-1]
    xpos: List = [None] * nb
    xmat: List = [None] * nb
    cdof_rows: List = [None] * nv

    origin = (jax.lax.stop_gradient(qpos[0:3]) if nv >= 3
              else jnp.zeros((3, B), qpos.dtype))

    for i in range(nb):
        p = model.body_parent[i]
        if p == -1:
            pos = jnp.asarray(model.body_pos[i])[:, None] - origin
            R = jnp.broadcast_to(jnp.asarray(st.body_rot[i])[:, :, None],
                                 (3, 3, B))
        else:
            bp = model.body_pos[i]
            pos = xpos[p]
            for k in range(3):
                if bp[k] != 0.0:
                    pos = pos + xmat[p][:, k] * float(bp[k])
            if st.body_rot_identity[i]:
                R = xmat[p]
            else:
                R = _mat_mul_c(xmat[p], st.body_rot[i])

        for jidx in model.body_joints[i]:
            j = model.joints[jidx]
            if j.jtype == JointType.SLIDE:
                axis_w = _matvec_c(R, np.asarray(j.axis))
                pos = pos + axis_w * (qpos[j.qposadr] - j.ref)[None, :]
                cdof_rows[j.dofadr] = jnp.concatenate(
                    [jnp.zeros_like(axis_w), axis_w], axis=0)
            elif j.jtype == JointType.HINGE:
                axis_w = _matvec_c(R, np.asarray(j.axis))
                angle = qpos[j.qposadr] - j.ref
                K, KK = st.joint_K[jidx]
                RK = _mat_mul_c(R, K)
                RKK = _mat_mul_c(R, KK)
                s = jnp.sin(angle)[None, None, :]
                c1 = (1.0 - jnp.cos(angle))[None, None, :]
                R = R + s * RK + c1 * RKK
                cdof_rows[j.dofadr] = jnp.concatenate(
                    [axis_w, _cross_bt(axis_w, -pos)], axis=0)
            else:  # BALL
                q_j = qpos[j.qposadr:j.qposadr + 4]
                q_j = q_j / jnp.sqrt(jnp.sum(q_j * q_j, axis=0,
                                             keepdims=True))
                R = _mat_mul_bt(R, _quat2mat_bt(q_j))
                for k in range(3):
                    axis_w = R[:, k]
                    cdof_rows[j.dofadr + k] = jnp.concatenate(
                        [axis_w, _cross_bt(axis_w, -pos)], axis=0)
        xpos[i], xmat[i] = pos, R

    xpos_a = jnp.stack(xpos)                 # (nb, 3, B)
    ximat = jnp.stack(xmat)                  # (nb, 3, 3, B)
    xipos = xpos_a + jnp.sum(ximat * body_ipos[:, None, :, :], axis=2)
    return FleetKin(xpos=xpos_a, ximat=ximat, xipos=xipos,
                    cdof=jnp.stack(cdof_rows), origin=origin)


# ---------------------------------------------------------------------------
# dynamics (batch-last mirror of engine.compute_dynamics)
# ---------------------------------------------------------------------------

class FleetDyn(NamedTuple):
    kin: FleetKin
    body_vel: jnp.ndarray   # (nb, 6, B)
    cdof_dot: jnp.ndarray   # (nv, 6, B)
    M: jnp.ndarray          # (nv, nv, B)
    Minv: jnp.ndarray       # (nv, nv, B) -- (M + h D)^-1
    qfrc_bias: jnp.ndarray  # (nv, B)


def _dynamics_bt(model: PhysModel, params_bt: PhysParams, qpos: jnp.ndarray,
                 qvel: jnp.ndarray) -> FleetDyn:
    nb, nv = model.nbody, model.nv
    st = _Structure.of(model)
    kin = _fk_bt(model, params_bt.body_ipos, qpos)
    A = st.ancestor_mask                    # (nb, nv) const
    B = qpos.shape[-1]

    wdof = kin.cdof * qvel[:, None, :]      # (nv, 6, B)
    body_vel = _mm_left(A, wdof)            # (nb, 6, B) -- MXU

    strict = st.crba_mask - np.eye(nv, dtype=st.crba_mask.dtype)
    v_pre = _mm_left(strict, wdof)          # (nv, 6, B) -- MXU
    cdof_dot = _cross_motion_bt(v_pre, kin.cdof)

    # spatial inertias about origin: R I0 R^T, skew-square closed form
    I0 = jnp.asarray(model.body_inertia)    # (nb, 3, 3) const
    R = kin.ximat                           # (nb, 3, 3, B)
    # unrolled over the 3-length contraction (the jnp.sum form materialized
    # a rank-5 (nb, 3, 3, 3, B) intermediate twice)
    # T[., i, j, :] = sum_k R[., i, k, :] * I0[., k, j]
    T = sum(R[:, :, k, None, :] * I0[:, None, k, :, None] for k in range(3))
    # I_world[., i, j, :] = sum_k T[., i, k, :] * R[., j, k, :]
    I_world = sum(T[:, :, k, None, :] * R[:, None, :, k, :]
                  for k in range(3))

    c = kin.xipos                           # (nb, 3, B)
    ccT = c[:, :, None, :] * c[:, None, :, :]
    cc = jnp.sum(c * c, axis=1)             # (nb, B)
    eye3 = jnp.eye(3)[None, :, :, None]
    CC = ccT - cc[:, None, None, :] * eye3
    # skew(c): (nb, 3, 3, B)
    z = jnp.zeros_like(c[:, 0, :])
    C = jnp.stack([
        jnp.stack([z, -c[:, 2], c[:, 1]], axis=1),
        jnp.stack([c[:, 2], z, -c[:, 0]], axis=1),
        jnp.stack([-c[:, 1], c[:, 0], z], axis=1),
    ], axis=1)
    mass = params_bt.body_mass              # (nb, B)
    m4 = mass[:, None, None, :]
    upper_left = I_world - m4 * CC
    mC = m4 * C
    mI = m4 * jnp.broadcast_to(eye3, (nb, 3, 3, B))
    inertias = jnp.concatenate([
        jnp.concatenate([upper_left, mC], axis=2),
        jnp.concatenate([-mC, mI], axis=2),
    ], axis=1)                              # (nb, 6, 6, B)

    # RNEA bias (qacc = 0, gravity as base acceleration)
    grav = np.asarray(model.gravity)
    a0 = np.concatenate([np.zeros(3), -grav])
    body_acc = (jnp.asarray(a0)[None, :, None]
                + _mm_left(A, cdof_dot * qvel[:, None, :]))   # (nb, 6, B)
    # 6-wide matvecs as unrolled FMA chains: the jnp.sum form materializes
    # the (nb, 6, 6, B) product (3.8 MB/substep at fleet 1024) per matvec
    Iv = sum(inertias[:, :, j, :] * body_vel[:, None, j, :]
             for j in range(6))
    body_frc = (sum(inertias[:, :, j, :] * body_acc[:, None, j, :]
                    for j in range(6))
                + _cross_force_bt(body_vel, Iv))              # (nb, 6, B)

    F_sub = _mm_left(A.T, body_frc)         # (nv, 6, B) -- MXU
    qfrc_bias = sum(kin.cdof[:, j, :] * F_sub[:, j, :] for j in range(6))

    # CRBA: composite inertias per dof
    Ic_dof = _mm_left(A.T, inertias.reshape(nb, -1)).reshape(
        nv, 6, 6, B)                        # -- MXU
    H = sum(Ic_dof[:, :, j, :] * kin.cdof[:, None, j, :] for j in range(6))
    # M_full: the jnp.sum form materialized a (nv, nv, 6, B) intermediate
    # (25 MB/substep at fleet 1024)
    M_full = sum(H[:, None, j, :] * kin.cdof[None, :, j, :]
                 for j in range(6))
    Ml = M_full * st.crba_mask[:, :, None]
    diag_idx = np.arange(nv)
    Mdiag = Ml[diag_idx, diag_idx]          # (nv, B)
    M = Ml + jnp.swapaxes(Ml, 0, 1)
    M = M.at[diag_idx, diag_idx].set(Mdiag + np.asarray(model.dof_armature)
                                     [:, None])

    Minv = _spd_inverse_bt(
        M.at[diag_idx, diag_idx].add(model.timestep * params_bt.dof_damping))

    return FleetDyn(kin=kin, body_vel=body_vel, cdof_dot=cdof_dot, M=M,
                    Minv=Minv, qfrc_bias=qfrc_bias)


# ---------------------------------------------------------------------------
# constraint forces
# ---------------------------------------------------------------------------

def _hfield_lookup_bt(params_bt: PhysParams, xy: jnp.ndarray):
    """xy (nc, 2, B); hfield (HFIELD_RES, HFIELD_RES, B). Mirrors
    engine.hfield_lookup."""
    n = HFIELD_RES
    cell = 2.0 * params_bt.hfield_radius / (n - 1)       # (B,)
    u = (xy - params_bt.floor_pos[None, 0:2, :]) / cell[None, None, :] \
        + (n - 1) / 2.0
    u = jnp.clip(u, 0.0, n - 1.001)
    i0 = jnp.floor(u).astype(jnp.int32)                  # (nc, 2, B)
    f = u - i0
    bidx = jnp.arange(xy.shape[-1])[None, :]             # (1, B)
    ix, iy = i0[:, 0, :], i0[:, 1, :]                    # (nc, B)
    h00 = params_bt.hfield[ix, iy, bidx]
    h10 = params_bt.hfield[ix + 1, iy, bidx]
    h01 = params_bt.hfield[ix, iy + 1, bidx]
    h11 = params_bt.hfield[ix + 1, iy + 1, bidx]
    fx, fy = f[:, 0, :], f[:, 1, :]
    h = (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
         + h01 * (1 - fx) * fy + h11 * fx * fy)
    dhdx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) / cell[None, :]
    dhdy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) / cell[None, :]
    return h, dhdx, dhdy


class FleetContact(NamedTuple):
    force: jnp.ndarray      # (nc, 3, B)
    depth: jnp.ndarray      # (nc, B)
    pos: jnp.ndarray        # (nc, 3, B)
    vel: jnp.ndarray        # (nc, 3, B)


def _constraint_forces_bt(model: PhysModel, params_bt: PhysParams,
                          dyn: FleetDyn
                          ) -> Tuple[jnp.ndarray, FleetContact]:
    kin = dyn.kin
    nv = model.nv
    st = _Structure.of(model)
    B = kin.origin.shape[-1]
    tau_c = model.solref_timeconst
    zeta = model.solref_dampratio
    k_unit = 1.0 / (tau_c * tau_c * zeta * zeta)
    b_unit = 2.0 / tau_c

    qfrc = jnp.zeros((nv, B))

    ez = np.array([0.0, 0.0, 1.0])
    n_w = _quat_rotate_bt(params_bt.floor_quat,
                          jnp.broadcast_to(jnp.asarray(ez)[:, None], (3, B)))
    floor_p = params_bt.floor_pos - kin.origin            # (3, B)

    if not st.ncon:
        empty = FleetContact(force=jnp.zeros((0, 3, B)),
                             depth=jnp.zeros((0, B)),
                             pos=jnp.zeros((0, 3, B)),
                             vel=jnp.zeros((0, 3, B)))
        return qfrc, empty

    cb = st.con_body                                      # (nc,) const
    xmat_c = kin.ximat[cb]                                # (nc, 3, 3, B)
    off = np.asarray(st.con_offset)                       # (nc, 3) const
    p = kin.xpos[cb] + jnp.sum(
        xmat_c * jnp.asarray(off)[:, None, :, None], axis=2)   # (nc, 3, B)
    radius = jnp.asarray(st.con_radius)[:, None]          # (nc, 1)

    depth_plane = radius - jnp.sum((p - floor_p[None]) * n_w[None], axis=1)
    p_world = p + kin.origin[None]
    if model.enable_hfield:
        h, dhdx, dhdy = _hfield_lookup_bt(params_bt, p_world[:, 0:2, :])
        n_h = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)], axis=1)
        n_h = n_h / jnp.sqrt(jnp.sum(n_h * n_h, axis=1, keepdims=True))
        depth_h = (radius + (params_bt.floor_pos[2][None] + h)
                   - p_world[:, 2, :])
        active = (params_bt.hfield_active > 0.5)[None]
        depth = jnp.where(active, depth_h, depth_plane)
        n_c = jnp.where(active[:, None, :], n_h,
                        jnp.broadcast_to(n_w[None], n_h.shape))
    else:
        depth = depth_plane
        n_c = jnp.broadcast_to(n_w[None], (st.ncon, 3, B))

    bv = dyn.body_vel[cb]                                 # (nc, 6, B)
    v_p = bv[:, 3:, :] + _cross_bt(bv[:, :3, :], p)       # (nc, 3, B)

    # --- spatial Delassus formulation ---
    # The contact jacobian factors as J_c = Phi_c S_b with
    # Phi_c = [-skew(p_c) | I3] (point transform, env-cheap) and
    # S_b = ancestry-masked cdof (shared by every sphere on body b). The
    # per-env Minv contraction therefore only has to run once per contact
    # BODY (Cassie: 2 feet), as a 6x6 spatial inverse-inertia
    #   Lambda_b = S_b Ainv S_b^T,
    # and each sphere's 3x3 Delassus block is the cheap congruence
    #   G_c = Phi_c Lambda_b Phi_c^T.
    # (The naive J M^-1 J^T einsum was 64% of the whole substep: a
    # (nc*3, nv)x(nv, nv) per-env contraction that XLA lowers to tiny
    # batched matmuls.)
    ubodies = sorted(set(int(b) for b in cb))
    slot = np.asarray([ubodies.index(int(b)) for b in cb])   # (nc,)
    lam_blocks = []
    for ub in ubodies:
        # static ancestry sparsity: only ~half the dofs reach a foot; the
        # contraction unrolls over those rows as plain FMA chains (einsum
        # with the batch on the minor axis lowers to tiny batched matmuls)
        rows = np.nonzero(st.ancestor_mask[ub])[0]
        # T[x, w, :] = sum_{v in rows} cdof[v, x, :] Minv[v, w, :]
        T = sum(kin.cdof[v, :, None, :] * dyn.Minv[v, None, :, :]
                for v in rows)                            # (6, nv, B)
        # Lambda[x, y, :] = sum_{w in rows} T[x, w, :] cdof[w, y, :]
        lam_blocks.append(sum(T[:, w, None, :] * kin.cdof[w, None, :, :]
                              for w in rows))             # (6, 6, B)
    Lam = jnp.stack(lam_blocks)                           # (nu, 6, 6, B)
    Lc = Lam[slot]                                        # (nc, 6, 6, B)
    Laa = Lc[:, :3, :3]                                   # (nc, 3, 3, B)
    Lal = Lc[:, :3, 3:]
    Lll = Lc[:, 3:, 3:]

    def _skew_apply(pv, X):
        """rows: (skew(p) X)[i, j] = (p x X[:, j])_i for X (nc, 3, 3, B)."""
        return jnp.stack([_cross_bt(pv, X[:, :, j, :])
                          for j in range(3)], axis=2)

    # G = P Laa P^T + P Lal + (P Lal)^T' + Lll with P = -skew(p)
    PLaa = -_skew_apply(p, Laa)                           # P @ Laa
    PLaaPT = -_skew_apply(p, jnp.swapaxes(PLaa, 1, 2))
    PLaaPT = jnp.swapaxes(PLaaPT, 1, 2)
    PLal = -_skew_apply(p, Lal)
    G = PLaaPT + PLal + jnp.swapaxes(PLal, 1, 2) + Lll    # (nc, 3, 3, B)

    Gn = sum(G[:, :, j, :] * n_c[:, None, j, :] for j in range(3))
    g_n = sum(n_c[:, i, :] * Gn[:, i, :] for i in range(3))   # (nc, B)
    m_n = 1.0 / jnp.maximum(g_n, 1e-8)
    vn = jnp.sum(v_p * n_c, axis=1)                       # (nc, B)
    fn = jnp.maximum(0.0, m_n * (k_unit * depth - b_unit * vn))
    fn = jnp.where(depth > 0, fn, 0.0)

    vt = v_p - vn[:, None, :] * n_c
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=1)) + 1e-9
    trG = G[:, 0, 0] + G[:, 1, 1] + G[:, 2, 2]
    m_t = 1.0 / jnp.maximum((trG - g_n) / 2.0, 1e-8)
    f_stick = m_t * vt_norm / (2.0 * model.timestep)
    ft_mag = jnp.minimum(params_bt.friction[None] * fn, f_stick)
    ft = -(ft_mag / vt_norm)[:, None, :] * vt

    f = fn[:, None, :] * n_c + ft                         # (nc, 3, B)

    # qfrc = J^T f = S_b^T (Phi^T f) with Phi^T f = [p x f; f]: accumulate
    # the total contact wrench per body, project through the masked cdof
    wrench = jnp.concatenate([_cross_bt(p, f), f], axis=1)   # (nc, 6, B)
    for u, ub in enumerate(ubodies):
        Wu = jnp.sum(jnp.where((slot == u)[:, None, None], wrench, 0.0),
                     axis=0)                              # (6, B)
        maskb = st.ancestor_mask[ub]
        qfrc = qfrc + jnp.asarray(maskb)[:, None] * jnp.sum(
            kin.cdof * Wu[None], axis=1)
    return qfrc, FleetContact(force=f, depth=depth, pos=p_world, vel=v_p)


def _joint_limit_forces_bt(model: PhysModel, dyn: FleetDyn,
                           qpos: jnp.ndarray, qvel: jnp.ndarray
                           ) -> jnp.ndarray:
    st = _Structure.of(model)
    B = qpos.shape[-1]
    if len(st.lim_dof) == 0:
        return jnp.zeros((model.nv, B))
    tau_c = model.solref_timeconst
    zeta = model.solref_dampratio
    k_unit = 1.0 / (tau_c * tau_c * zeta * zeta)
    b_unit = 2.0 / tau_c

    dof = st.lim_dof
    q = qpos[st.lim_qadr]                                 # (nl, B)
    qd = qvel[dof]
    # diagonal of Minv at the limited dofs, gathered through a FLAT index.
    # The natural composition Minv[arange(nv), arange(nv)][dof] miscompiled
    # on XLA:TPU when fully fused into the downstream scatter: the fused
    # gather read a ~1e-7 off-diagonal instead of the 25.1 diagonal,
    # m_eff exploded to ~4.5e6 and Walker2d NaN'd under TD3's random
    # warmup within 7 steps (same graph with any intermediate materialized
    # computes correctly; debugged r4, minimal repro preserved in the
    # commit message).
    nv = model.nv
    flat_idx = np.asarray(dof, dtype=np.int32) * (nv + 1)
    diag_dof = dyn.Minv.reshape(nv * nv, -1)[flat_idx]    # (nl, B)
    m_eff = 1.0 / jnp.maximum(diag_dof, 1e-8)
    below = jnp.asarray(st.lim_lo)[:, None] - q
    above = q - jnp.asarray(st.lim_hi)[:, None]
    f_lo = jnp.where(below > 0, m_eff * (k_unit * below - b_unit * qd), 0.0)
    f_hi = jnp.where(above > 0, m_eff * (k_unit * above + b_unit * qd), 0.0)
    f = jnp.maximum(f_lo, 0.0) - jnp.maximum(f_hi, 0.0)
    return jnp.zeros((model.nv, B)).at[dof].add(f)


def _equality_jacobian_bt(model: PhysModel, dyn: FleetDyn
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """J_eq (3*neq, nv, B), err (3*neq, B)."""
    st = _Structure.of(model)
    kin = dyn.kin
    rows, errs = [], []
    for eq in model.equalities:
        b1, b2 = eq.body1, eq.body2
        p1 = kin.xpos[b1] + _matvec_c(kin.ximat[b1], np.asarray(eq.anchor1))
        p2 = kin.xpos[b2] + _matvec_c(kin.ximat[b2], np.asarray(eq.anchor2))
        errs.append(p1 - p2)
        # point jacobian (nv, 3, B) for each body, masked
        c1 = (_cross_bt(kin.cdof[:, :3, :], p1[None]) + kin.cdof[:, 3:, :]) \
            * jnp.asarray(st.ancestor_mask[b1])[:, None, None]
        c2 = (_cross_bt(kin.cdof[:, :3, :], p2[None]) + kin.cdof[:, 3:, :]) \
            * jnp.asarray(st.ancestor_mask[b2])[:, None, None]
        d = c1 - c2                                       # (nv, 3, B)
        rows.append(jnp.moveaxis(d, 1, 0))                # (3, nv, B)
    return jnp.concatenate(rows, axis=0), jnp.concatenate(errs, axis=0)


def _passive_forces_bt(model: PhysModel, qpos: jnp.ndarray) -> jnp.ndarray:
    st = _Structure.of(model)
    return -jnp.asarray(st.spring_k)[:, None] * qpos[st.spring_qadr]


def _actuator_forces_bt(model: PhysModel, ctrl: jnp.ndarray) -> jnp.ndarray:
    """ctrl (nu, B) -> qfrc (nv, B)."""
    B = ctrl.shape[-1]
    if model.nu == 0:
        return jnp.zeros((model.nv, B))
    st = _Structure.of(model)
    u = jnp.clip(ctrl, jnp.asarray(st.act_lo)[:, None],
                 jnp.asarray(st.act_hi)[:, None])
    return jnp.zeros((model.nv, B)).at[st.act_dof].add(
        jnp.asarray(st.act_gear)[:, None] * u)


def _external_wrench_bt(model: PhysModel, dyn: FleetDyn,
                        wrench: jnp.ndarray) -> jnp.ndarray:
    """wrench (6, B) [torque, force] at the root body origin."""
    st = _Structure.of(model)
    kin = dyn.kin
    tau, F = wrench[:3], wrench[3:]
    w = jnp.concatenate([tau + _cross_bt(kin.xpos[0], F), F], axis=0)
    qfrc = jnp.sum(kin.cdof * w[None], axis=1) \
        * jnp.asarray(st.ancestor_mask[0])[:, None]
    return qfrc


def _integrate_qpos_bt(model: PhysModel, qpos: jnp.ndarray,
                       qvel: jnp.ndarray, h: float) -> jnp.ndarray:
    st = _Structure.of(model)
    new_qpos = qpos.at[st.lin_qadr].add(h * qvel[st.lin_dof])
    for qadr, dofadr in st.balls:
        q = qpos[qadr:qadr + 4]
        w = qvel[dofadr:dofadr + 3]
        new_qpos = new_qpos.at[qadr:qadr + 4].set(_quat_integrate_bt(q, w, h))
    return new_qpos


# ---------------------------------------------------------------------------
# the fleet substep
# ---------------------------------------------------------------------------

def fleet_step(model: PhysModel, params_bt: PhysParams, qpos: jnp.ndarray,
               qvel: jnp.ndarray, ctrl: jnp.ndarray):
    """Batch-last mirror of engine.step. All inputs/outputs carry a trailing
    fleet axis B: qpos (nq, B), qvel (nv, B), ctrl (nu, B); params_bt leaves
    are engine PhysParams shapes + (B,)."""
    st = _Structure.of(model)
    B = qpos.shape[-1]
    dyn = _dynamics_bt(model, params_bt, qpos, qvel)

    qfrc_con, contact = _constraint_forces_bt(model, params_bt, dyn)
    qfrc_lim = _joint_limit_forces_bt(model, dyn, qpos, qvel)
    qfrc_spring = _passive_forces_bt(model, qpos)
    qfrc_act = _actuator_forces_bt(model, ctrl)
    qfrc_ext = _external_wrench_bt(model, dyn, params_bt.ext_force)

    qfrc = (qfrc_act + qfrc_spring + qfrc_con + qfrc_lim + qfrc_ext
            - dyn.qfrc_bias)
    h = model.timestep
    D = params_bt.dof_damping                              # (nv, B)
    Ainv = dyn.Minv
    nv = model.nv

    def matvec(Mbt, x):
        """(nv, nv, B) @ (nv, B): fused multiply-reduce (einsum with the
        batch minor lowers to per-env batched matmuls)."""
        return jnp.sum(Mbt * x[None, :, :], axis=1)

    qacc_free = matvec(Ainv, qfrc - D * qvel)
    v_pred = qvel + h * qacc_free

    if model.equalities:
        J_eq, err = _equality_jacobian_bt(model, dyn)      # (e, nv, B)
        e = J_eq.shape[0]
        # T[k, w, :] = sum_v J_eq[k, v, :] Ainv[v, w, :] -- unrolled FMA
        # chain over the (static) union of equality-body ancestor dofs
        eq_rows = np.nonzero(np.any(
            np.stack([_Structure.of(model).ancestor_mask[eq.body1]
                      + _Structure.of(model).ancestor_mask[eq.body2]
                      for eq in model.equalities]), axis=0))[0]
        T = sum(J_eq[:, v, None, :] * Ainv[v, None, :, :] for v in eq_rows)
        G = sum(T[:, None, w, :] * J_eq[None, :, w, :] for w in eq_rows)
        # flat-index diagonal gather (paired arange gathers composed with
        # downstream ops miscompiled on XLA:TPU -- see
        # _joint_limit_forces_bt)
        gdiag = G.reshape(e * e, -1)[np.arange(e) * (e + 1)]   # (e, B)
        d = jax.lax.rsqrt(gdiag + 1e-12)
        Gs = d[:, None, :] * G * d[None, :, :]
        Gs = Gs.at[np.arange(e), np.arange(e)].add(1e-6)
        rhs = -(sum(J_eq[:, v, :] * v_pred[None, v, :] for v in eq_rows)
                + (BAUMGARTE_BETA / h) * err)
        lam = d * _chol_solve_bt(Gs, d * rhs)
        jt_lam = sum(J_eq[k, :, :] * lam[k][None, :] for k in range(e))
        new_qvel = v_pred + matvec(Ainv, jt_lam)
    else:
        new_qvel = v_pred

    qacc = (new_qvel - qvel) / h
    new_qpos = _integrate_qpos_bt(model, qpos, new_qvel, h)

    if model.nu:
        act_torque = jnp.asarray(st.act_gear)[:, None] * jnp.clip(
            ctrl, jnp.asarray(st.act_lo)[:, None],
            jnp.asarray(st.act_hi)[:, None])
    else:
        act_torque = jnp.zeros((0, B))

    return dyn, contact, new_qpos, new_qvel, qacc, act_torque


def fleet_step_batch_first(model: PhysModel, params_b: PhysParams,
                           qpos_b: jnp.ndarray, qvel_b: jnp.ndarray,
                           ctrl_b: jnp.ndarray) -> StepOut:
    """Adapter for the custom_vmap rule in engine.step: takes batch-FIRST
    (B, ...) arrays (vmap's canonical layout), runs the batch-last fleet
    step, and returns a batch-first StepOut identical in structure to
    vmap(engine.step)."""
    to_bt = lambda x: jnp.moveaxis(x, 0, -1)
    params_bt = jax.tree_util.tree_map(to_bt, params_b)
    dyn, contact, qpos, qvel, qacc, act_torque = fleet_step(
        model, params_bt, to_bt(qpos_b), to_bt(qvel_b), to_bt(ctrl_b))

    kin = dyn.kin
    xquat_bt = _mat2quat_bt(kin.ximat)
    to_bf = lambda x: jnp.moveaxis(x, -1, 0)
    kin_bf = Kinematics(
        xpos=to_bf(kin.xpos), xquat=to_bf(xquat_bt), ximat=to_bf(kin.ximat),
        xipos=to_bf(kin.xipos), cdof=to_bf(kin.cdof), origin=to_bf(kin.origin))
    contact_bf = ContactInfo(
        force=to_bf(contact.force), depth=to_bf(contact.depth),
        pos=to_bf(contact.pos), vel=to_bf(contact.vel))
    return StepOut(qpos=to_bf(qpos), qvel=to_bf(qvel), qacc=to_bf(qacc),
                   contact=contact_bf, kin=kin_bf,
                   actuator_torque=to_bf(act_torque))
