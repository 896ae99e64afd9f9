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
    A = a_ref[:]                      # (Bb, n, n)
    Bb = A.shape[0]
    dtype = A.dtype

    col = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)   # row index i
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)   # col index k

    # ---- Cholesky: L lower-triangular, built column by column ----
    L = jnp.zeros_like(A)
    for j in range(n):
        # s_i = A[i, j] - sum_k<j L[i, k] L[j, k]   for all i at once
        mask_k = (row < j).astype(dtype)                      # (1, 1, n)
        Lj = L[:, j:j + 1, :]                                 # (Bb, 1, n)
        s = A[:, :, j] - jnp.sum(L * Lj * mask_k, axis=2)     # (Bb, n)
        d = jax.lax.rsqrt(jnp.maximum(s[:, j], 1e-12))        # (Bb,)
        colj = s * d[:, None]                                 # (Bb, n)
        # keep only rows i >= j
        keep = (jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) >= j)
        colj = jnp.where(keep, colj, 0.0)
        L = L + colj[:, :, None] * (row == j).astype(dtype)

    # ---- forward solve L Y = I ----
    Y = jnp.zeros_like(A)
    eye = (col == row).astype(dtype)                          # (1, n, n)
    for i in range(n):
        mask_k = (row < i).astype(dtype)
        Li = L[:, i:i + 1, :]                                 # (Bb, 1, n)
        # r_m = I[i, m] - sum_k<i L[i, k] Y[k, m]
        r = eye[:, i, :] - jnp.sum(Y * (Li * mask_k).transpose(0, 2, 1),
                                   axis=1)                    # (Bb, n)
        r = r / L[:, i, i][:, None]
        Y = Y + r[:, None, :] * (col == i).astype(dtype)

    # ---- backward solve L^T X = Y ----
    X = jnp.zeros_like(A)
    for i in range(n - 1, -1, -1):
        mask_k = (row > i).astype(dtype)                      # k > i
        Lci = L[:, :, i:i + 1]                                # (Bb, n, 1) col i
        r = Y[:, i, :] - jnp.sum(X * (Lci[:, :, 0] *
                                      mask_k[0, 0, :])[:, :, None], axis=1)
        r = r / L[:, i, i][:, None]
        X = X + r[:, None, :] * (col == i).astype(dtype)

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
