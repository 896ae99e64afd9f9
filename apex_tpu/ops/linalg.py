"""Small-matrix SPD linear algebra, unrolled for TPU.

XLA lowers jnp.linalg.inv/solve to pivoted LU custom calls that execute
(near-)sequentially per matrix and scale miserably when vmapped over an env
fleet -- the physics engine's per-substep (nv, nv) solves dominated wall
time and faulted at large batches. These routines unroll Cholesky + the two
triangular substitutions over the *static* dimension (nv <= 32), producing
pure elementwise/vector ops that batch perfectly on the VPU with a few
hundred fused instructions.

All matrices are assumed symmetric positive definite (mass matrices,
regularized Delassus operators).
"""
from __future__ import annotations

import jax.numpy as jnp


def cholesky_unrolled(A: jnp.ndarray, pivot_floor: float = 1e-12
                      ) -> jnp.ndarray:
    """Lower-triangular L with A = L L^T. A: (..., n, n), n static.

    pivot_floor clamps the squared pivot. For Jacobi-normalized systems
    (unit diagonal) pass ~1e-4: a smaller pivot means a numerically
    singular direction, and letting it through cascades 1/d factors that
    overflow f32 (observed as Inf constraint impulses)."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        # d_j = sqrt(A_jj - sum_k L_jk^2)
        s = A[..., j, j] - jnp.sum(L[..., j, :j] * L[..., j, :j], axis=-1)
        d = jnp.sqrt(jnp.maximum(s, pivot_floor))
        L = L.at[..., j, j].set(d)
        if j + 1 < n:
            # column below the diagonal, one vectorized update
            r = (A[..., j + 1:, j]
                 - jnp.einsum("...ik,...k->...i", L[..., j + 1:, :j],
                              L[..., j, :j]))
            L = L.at[..., j + 1:, j].set(r / d[..., None])
    return L


def tri_solve_lower(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L X = B with L lower-triangular. B: (..., n, m) or (..., n)."""
    vec = B.ndim == L.ndim - 1
    if vec:
        B = B[..., None]
    n = L.shape[-1]
    X = jnp.zeros_like(B)
    for i in range(n):
        r = B[..., i, :] - jnp.einsum("...k,...km->...m", L[..., i, :i],
                                      X[..., :i, :])
        X = X.at[..., i, :].set(r / L[..., i, i][..., None])
    return X[..., 0] if vec else X


def tri_solve_upper_t(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T X = B with L lower-triangular (i.e. upper system)."""
    vec = B.ndim == L.ndim - 1
    if vec:
        B = B[..., None]
    n = L.shape[-1]
    X = jnp.zeros_like(B)
    for i in reversed(range(n)):
        r = B[..., i, :] - jnp.einsum("...k,...km->...m",
                                      L[..., i + 1:, i], X[..., i + 1:, :])
        X = X.at[..., i, :].set(r / L[..., i, i][..., None])
    return X[..., 0] if vec else X


def spd_solve(A: jnp.ndarray, b: jnp.ndarray,
              pivot_floor: float = 1e-12) -> jnp.ndarray:
    """x = A^-1 b for SPD A via unrolled Cholesky."""
    L = cholesky_unrolled(A, pivot_floor=pivot_floor)
    return tri_solve_upper_t(L, tri_solve_lower(L, b))


def spd_inverse(A: jnp.ndarray) -> jnp.ndarray:
    """A^-1 for SPD A via unrolled Cholesky against the identity."""
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return spd_solve(A, eye)


def _on_tpu() -> bool:
    try:
        import jax

        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def make_batched_spd_inverse():
    """spd_inverse with a custom vmap rule: the physics engine is written
    per-env and vmapped over the fleet; under vmap this routes the whole
    batch through ONE fused Pallas kernel (ops/pallas_linalg.py) instead of
    ~100 sequential XLA fusions per call -- the env fleet is kernel-launch
    bound without it. Falls back to the unrolled form on CPU (tests)."""
    import jax

    @jax.custom_batching.custom_vmap
    def f(A):
        return spd_inverse(A)

    @f.def_vmap
    def _rule(axis_size, in_batched, A):
        (a_batched,) = in_batched
        if not a_batched:
            return spd_inverse(A), False
        if _on_tpu() and A.ndim == 3:
            from apex_tpu.ops.pallas_linalg import (
                default_block, pallas_spd_inverse)

            block = default_block(A.shape[-1], A.shape[0])
            return pallas_spd_inverse(A, block_b=block), True
        return spd_inverse(A), True

    return f


batched_spd_inverse = make_batched_spd_inverse()


def make_batched_spd_solve():
    """spd_solve with a custom vmap rule: under vmap on TPU the batch is
    solved via the fused Pallas inverse kernel (x = A^-1 b); unrolled
    elsewhere."""
    import jax

    @jax.custom_batching.custom_vmap
    def f(A, b):
        return spd_solve(A, b)

    @f.def_vmap
    def _rule(axis_size, in_batched, A, b):
        a_b, b_b = in_batched
        if not (a_b or b_b):
            return spd_solve(A, b), False
        if not a_b:
            # mixed: materialize the batch so ranks line up for spd_solve
            A = jnp.broadcast_to(A, (axis_size,) + A.shape)
        elif not b_b:
            b = jnp.broadcast_to(b, (axis_size,) + b.shape)
        if _on_tpu() and A.ndim == 3 and b.ndim == 2:
            from apex_tpu.ops.pallas_linalg import (
                default_block, pallas_spd_inverse)

            Ai = pallas_spd_inverse(
                A, block_b=default_block(A.shape[-1], A.shape[0]))
            return jnp.einsum("bij,bj->bi", Ai, b), True
        return spd_solve(A, b), True

    return f


batched_spd_solve = make_batched_spd_solve()
