"""Pallas TPU kernel: batched small-SPD Cholesky inverse.

The unrolled jnp Cholesky (ops/linalg.py) is numerically ideal but emits
~100 sequential XLA fusions per call; inside the 2 kHz physics substep these
kernel launches dominate wall time (the env fleet saturates at ~6.5k
env-steps/s). This kernel performs the factorization and both triangular
solves for a whole block of environments inside ONE Pallas program, keeping
the sequential dependency at register latency.

Layout: A (B, N, N) SPD -> Ainv (B, N, N), grid over B in blocks; the inner
loops over N are unrolled at trace time with masked row/column updates (no
dynamic-width slices). N is small and static (nv <= 32).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _spd_inverse_kernel(n: int, a_ref, out_ref):
    """All three sweeps run as fori_loops with masked dynamic slices: a
    Python-unrolled version keeps O(n) live (Bb, n, n) temporaries on the
    Mosaic stack and blows the 16 MB scoped-vmem limit (observed 33.6 MB at
    Bb=32, n=32); the rolled form bounds live vmem to a few buffers."""
    A = a_ref[:]                      # (Bb, n, n)
    dtype = A.dtype

    col = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)   # row index i
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)   # col index k
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)      # (1, n)

    # dynamic row/column extraction as masked reductions (Mosaic has no
    # dynamic_slice lowering on VMEM values)
    def _row(M, i):
        """M[:, i, :] (dynamic i) -> (Bb, n)."""
        return jnp.sum(M * (col == i).astype(dtype), axis=1)

    def _col(M, j):
        """M[:, :, j] (dynamic j) -> (Bb, n)."""
        return jnp.sum(M * (row == j).astype(dtype), axis=2)

    # ---- Cholesky: L lower-triangular, built column by column ----
    def chol_step(j, L):
        # s_i = A[i, j] - sum_k<j L[i, k] L[j, k]   for all i at once
        mask_k = (row < j).astype(dtype)                      # (1, 1, n)
        Lj = _row(L, j)[:, None, :]                           # (Bb, 1, n)
        s = _col(A, j) - jnp.sum(L * Lj * mask_k, axis=2)     # (Bb, n)
        sj = jnp.sum(s * (idx == j).astype(dtype), axis=1)    # (Bb,)
        d = jax.lax.rsqrt(jnp.maximum(sj, 1e-12))
        colj = jnp.where(idx >= j, s * d[:, None], 0.0)       # rows i >= j
        return L + colj[:, :, None] * (row == j).astype(dtype)

    L = jax.lax.fori_loop(0, n, chol_step, jnp.zeros_like(A))

    diag = jnp.sum(L * (col == row).astype(dtype), axis=2)    # (Bb, n)

    # ---- forward solve L Y = I ----
    def fwd_step(i, Y):
        w = jnp.where(idx < i, _row(L, i), 0.0)               # (Bb, n)
        # r_m = I[i, m] - sum_k<i L[i, k] Y[k, m]
        r = (idx == i).astype(dtype) - jnp.sum(Y * w[:, :, None], axis=1)
        dii = jnp.sum(diag * (idx == i).astype(dtype), axis=1)
        r = r / dii[:, None]
        return Y + r[:, None, :] * (col == i).astype(dtype)

    Y = jax.lax.fori_loop(0, n, fwd_step, jnp.zeros_like(A))

    # ---- backward solve L^T X = Y (iterate i = n-1 .. 0) ----
    def bwd_step(t, X):
        i = n - 1 - t
        w = jnp.where(idx > i, _col(L, i), 0.0)               # (Bb, n)
        r = _row(Y, i) - jnp.sum(X * w[:, :, None], axis=1)
        dii = jnp.sum(diag * (idx == i).astype(dtype), axis=1)
        r = r / dii[:, None]
        return X + r[:, None, :] * (col == i).astype(dtype)

    X = jax.lax.fori_loop(0, n, bwd_step, jnp.zeros_like(A))

    out_ref[:] = X


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def pallas_spd_inverse(A: jnp.ndarray, block_b: int = 128,
                       interpret: bool = False) -> jnp.ndarray:
    """A (B, N, N) SPD -> A^-1, one pallas program per block of B."""
    B, n, _ = A.shape
    pad = (-B) % block_b
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
        A = jnp.concatenate([A, eye], axis=0)
    Bp = A.shape[0]

    out = pl.pallas_call(
        functools.partial(_spd_inverse_kernel, n),
        out_shape=jax.ShapeDtypeStruct((Bp, n, n), A.dtype),
        grid=(Bp // block_b,),
        in_specs=[pl.BlockSpec((block_b, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_b, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A)
    return out[:B]
