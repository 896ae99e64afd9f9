"""Quaternion and rotation utilities (pure JAX, wxyz convention).

Behavioral parity with reference cassie/quaternion_function.py:4-72 (numpy,
w-positive euler2quat) but written batched/jit-friendly: every function works on
arrays with arbitrary leading batch dimensions and is differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion. Reference: quaternion_function.py:4-7."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1*q2 (wxyz). Reference: quaternion_function.py:9-15."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + w2 * x1 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (active rotation, world = R(q) @ body).

    Matches reference rotate_by_quaternion(vector, quaternion)
    (quaternion_function.py:17-25) which computes q * (0,v) * q^-1.
    Uses the expanded 15-mul form rather than two quaternion products.
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2*w*(u x v) + 2*(u x (u x v))
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of q (world -> body)."""
    return quat_rotate(quat_inverse(q), v)


def euler2quat(z=0.0, y=0.0, x=0.0):
    """ZYX euler (radians) -> wxyz quaternion with w >= 0.

    Reference: quaternion_function.py:54-72 (w-positive convention).
    """
    z, y, x = jnp.asarray(z) / 2.0, jnp.asarray(y) / 2.0, jnp.asarray(x) / 2.0
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    q = jnp.stack(
        [
            cx * cy * cz - sx * sy * sz,
            cx * sy * sz + cy * cz * sx,
            cx * cz * sy - sx * cy * sz,
            cx * cy * sz + sx * cz * sy,
        ],
        axis=-1,
    )
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quat2euler(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion -> (roll_x, pitch_y, yaw_z) radians.

    Reference: quaternion_function.py:27-52.
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    t0 = 2.0 * (w * x + y * z)
    t1 = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(t0, t1)
    t2 = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(t2)
    t3 = 2.0 * (w * z + x * y)
    t4 = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(t3, t4)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat2mat(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion -> 3x3 rotation matrix (world_from_body)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat2quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> wxyz quaternion (w >= 0), branch-free.

    Uses the max-trace stable formulation evaluated on all four candidates and
    selected with `where`, so it is jit/vmap safe.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate encodings, each stable in a different region.
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12)) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)
    s1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, s1 / 4.0, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)
    s2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, s2 / 4.0,
                    (m12 + m21) / s2], axis=-1)
    s3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    s3 / 4.0], axis=-1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by angular velocity omega (body frame) over dt.

    Exponential-map update: q' = q * exp(0.5*dt*omega). Exact for constant
    omega; norm-preserving (up to fp error) unlike the Euler qdot update.
    """
    angle = jnp.linalg.norm(omega, axis=-1, keepdims=True) * dt
    half = 0.5 * angle
    # sinc-based axis term, safe at omega ~ 0
    small = angle < 1e-8
    k = jnp.where(small, 0.5 * dt, jnp.sin(half) * dt / jnp.where(small, 1.0, angle))
    dq = jnp.concatenate([jnp.cos(half), omega * k], axis=-1)
    out = quat_mul(q, dq)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def axis_angle_to_quat(axis: jnp.ndarray, angle) -> jnp.ndarray:
    """Unit axis + angle -> wxyz quaternion."""
    angle = jnp.asarray(angle)
    half = angle / 2.0
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )
