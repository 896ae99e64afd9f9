"""Pallas TPU kernel: whole-fleet forward kinematics in one program.

The XLA lowering of the batch-last FK (fleet._fk_bt) fragments the 26-body
chain into ~100 small kernels (stack/slice boundaries defeat fusion); at
fleet 1024 that ran at 114 us/substep against a ~2 us roofline for the
~1.5k (B,)-vector ops involved. Here the entire position pass -- body-frame
rotations, Rodrigues joint rotations, ball-quaternion rotations, per-dof
spatial axes -- executes inside ONE Pallas program per batch block, with
all intermediates living in registers/VMEM as (Bb,) lane vectors.

The kernel is generated from the same PhysModel/_Structure metadata as the
reference implementation, for any model (Cassie, Walker2d); numerics mirror
fleet._fk_bt exactly (same op order). Parity is pinned by
tests/test_fleet_parity.py, which routes every vmapped engine.step through
this kernel on TPU.

Reference parity anchor: mj_kinematics inside libcassiemujoco.so
(reference include/cassiemujoco.h:41-158); see engine.forward_kinematics.
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from apex_tpu.physics.spec import JointType, PhysModel


def _fk_kernel(model: PhysModel, st, qpos_ref, ipos_ref, xpos_ref, xmat_ref,
               xipos_ref, cdof_ref):
    """qpos_ref (nq, Bb); ipos_ref (nb*3, Bb); outputs flattened rows:
    xpos (nb*3, Bb), xmat (nb*9, Bb), xipos (nb*3, Bb), cdof (nv*6, Bb).
    All positions are origin-shifted by the root translation, matching
    fleet._fk_bt."""
    nb, nv = model.nbody, model.nv

    def row(ref, r):
        return ref[r]

    origin = [qpos_ref[k] for k in range(3)] if nv >= 3 else \
        [jnp.zeros_like(qpos_ref[0])] * 3

    # per-body state held in python lists of (Bb,) values (registers)
    xpos: List = [None] * nb
    xmat: List = [None] * nb

    def mat_mul_c(R, C):
        out = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                t = None
                for k in range(3):
                    c = float(C[k, j])
                    if c == 0.0:
                        continue
                    term = R[i][k] if c == 1.0 else R[i][k] * c
                    t = term if t is None else t + term
                out[i][j] = jnp.zeros_like(qpos_ref[0]) if t is None else t
        return out

    def matvec_c(R, v):
        out = [None] * 3
        for i in range(3):
            t = None
            for k in range(3):
                c = float(v[k])
                if c == 0.0:
                    continue
                term = R[i][k] if c == 1.0 else R[i][k] * c
                t = term if t is None else t + term
            out[i] = jnp.zeros_like(qpos_ref[0]) if t is None else t
        return out

    def cross(a, b):
        return [a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0]]

    for i in range(nb):
        p = model.body_parent[i]
        if p == -1:
            bp = model.body_pos[i]
            pos = [float(bp[k]) - origin[k] for k in range(3)]
            C = st.body_rot[i]
            one = jnp.ones_like(qpos_ref[0])
            R = [[float(C[a, b]) * one for b in range(3)] for a in range(3)]
        else:
            bp = model.body_pos[i]
            pos = list(xpos[p])
            for k in range(3):
                if bp[k] != 0.0:
                    for a in range(3):
                        pos[a] = pos[a] + xmat[p][a][k] * float(bp[k])
            if st.body_rot_identity[i]:
                R = [r[:] for r in xmat[p]]
            else:
                R = mat_mul_c(xmat[p], st.body_rot[i])

        for jidx in model.body_joints[i]:
            j = model.joints[jidx]
            if j.jtype == JointType.SLIDE:
                axis_w = matvec_c(R, np.asarray(j.axis))
                t = qpos_ref[j.qposadr] - j.ref
                pos = [pos[k] + axis_w[k] * t for k in range(3)]
                base = j.dofadr * 6
                for k in range(3):
                    cdof_ref[base + k] = jnp.zeros_like(t)
                    cdof_ref[base + 3 + k] = axis_w[k]
            elif j.jtype == JointType.HINGE:
                axis_w = matvec_c(R, np.asarray(j.axis))
                angle = qpos_ref[j.qposadr] - j.ref
                K, KK = st.joint_K[jidx]
                RK = mat_mul_c(R, K)
                RKK = mat_mul_c(R, KK)
                s = jnp.sin(angle)
                c1 = 1.0 - jnp.cos(angle)
                R = [[R[a][b] + s * RK[a][b] + c1 * RKK[a][b]
                      for b in range(3)] for a in range(3)]
                neg = [-pos[0], -pos[1], -pos[2]]
                lin = cross(axis_w, neg)
                base = j.dofadr * 6
                for k in range(3):
                    cdof_ref[base + k] = axis_w[k]
                    cdof_ref[base + 3 + k] = lin[k]
            else:  # BALL
                q = [qpos_ref[j.qposadr + k] for k in range(4)]
                nrm = jax.lax.rsqrt(q[0] * q[0] + q[1] * q[1]
                                    + q[2] * q[2] + q[3] * q[3])
                w, x, y, z = [qk * nrm for qk in q]
                Rq = [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                     2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                     2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x),
                     1 - 2 * (x * x + y * y)],
                ]
                R = [[sum(R[a][k] * Rq[k][b] for k in range(3))
                      for b in range(3)] for a in range(3)]
                neg = [-pos[0], -pos[1], -pos[2]]
                for k in range(3):
                    axis_w = [R[0][k], R[1][k], R[2][k]]
                    lin = cross(axis_w, neg)
                    base = (j.dofadr + k) * 6
                    for kk in range(3):
                        cdof_ref[base + kk] = axis_w[kk]
                        cdof_ref[base + 3 + kk] = lin[kk]

        xpos[i], xmat[i] = pos, R
        for k in range(3):
            xpos_ref[i * 3 + k] = pos[k]
        for a in range(3):
            for b in range(3):
                xmat_ref[i * 9 + a * 3 + b] = R[a][b]
        # xipos = xpos + R @ ipos (ipos is per-env dynamic: dyn-rand)
        ip = [ipos_ref[i * 3 + k] for k in range(3)]
        for a in range(3):
            xipos_ref[i * 3 + a] = pos[a] + (R[a][0] * ip[0]
                                             + R[a][1] * ip[1]
                                             + R[a][2] * ip[2])


def pallas_fk(model: PhysModel, body_ipos: jnp.ndarray, qpos: jnp.ndarray,
              block_b: int = 1024, interpret: bool = False):
    """body_ipos (nb, 3, B), qpos (nq, B) -> (xpos (nb,3,B),
    ximat (nb,3,3,B), xipos (nb,3,B), cdof (nv,6,B), origin (3,B))."""
    from apex_tpu.physics.engine import _Structure

    st = _Structure.of(model)
    nb, nv, nq = model.nbody, model.nv, model.nq
    B = qpos.shape[-1]
    block = min(block_b, B)
    pad = (-B) % block
    if pad:
        qpos = jnp.concatenate(
            [qpos, jnp.broadcast_to(qpos[:, :1], (nq, pad))], axis=-1)
        body_ipos = jnp.concatenate(
            [body_ipos, jnp.broadcast_to(body_ipos[:, :, :1],
                                         (nb, 3, pad))], axis=-1)
    Bp = qpos.shape[-1]
    ipos_flat = body_ipos.reshape(nb * 3, Bp)

    out_shapes = (
        jax.ShapeDtypeStruct((nb * 3, Bp), qpos.dtype),   # xpos
        jax.ShapeDtypeStruct((nb * 9, Bp), qpos.dtype),   # xmat
        jax.ShapeDtypeStruct((nb * 3, Bp), qpos.dtype),   # xipos
        jax.ShapeDtypeStruct((nv * 6, Bp), qpos.dtype),   # cdof
    )
    spec = lambda rows: pl.BlockSpec((rows, block), lambda i: (0, i))
    xpos_f, xmat_f, xipos_f, cdof_f = pl.pallas_call(
        functools.partial(_fk_kernel, model, st),
        out_shape=out_shapes,
        grid=(Bp // block,),
        in_specs=[spec(nq), spec(nb * 3)],
        out_specs=(spec(nb * 3), spec(nb * 9), spec(nb * 3), spec(nv * 6)),
        interpret=interpret,
    )(qpos, ipos_flat)

    origin = jax.lax.stop_gradient(qpos[0:3, :B]) if nv >= 3 \
        else jnp.zeros((3, B), qpos.dtype)
    return (xpos_f[:, :B].reshape(nb, 3, B),
            xmat_f[:, :B].reshape(nb, 3, 3, B),
            xipos_f[:, :B].reshape(nb, 3, B),
            cdof_f[:, :B].reshape(nv, 6, B),
            origin)
