"""Pallas TPU kernel: batched small-SPD Cholesky inverse.

The unrolled jnp Cholesky (ops/linalg.py) is numerically ideal but emits
~100 sequential XLA fusions per call; inside the 2 kHz physics substep these
dominate wall time. This kernel performs the factorization, the forward
triangular solve and the inverse assembly for a whole block of environments
inside ONE Pallas program.

Algorithm (per block, batch-last layout (n, n, Bb) so the batch rides the
128 lanes):
  * right-looking Cholesky: iteration j reads row j of the trailing Schur
    complement S (a leading-dim dynamic ref load), scales it to column
    l_j of L, and applies the rank-1 update S -= l_j l_j^T. Because l_j is
    zeroed above j, the update never needs a mask.
  * forward solve fused with inverse assembly: with Y = L^-1 computed
    row-by-row (y_i = d_i * R[i]; R -= l_col_i y_i^T), the inverse is
    A^-1 = Y^T Y = sum_i y_i y_i^T, accumulated into the output as each
    row is produced.
All loop state lives in VMEM scratch refs indexed dynamically on the
leading (untiled) dimension -- O(1) live temporaries, ~4 full (n, n, Bb)
passes per iteration. An earlier value-carried formulation (masked row
extraction per iteration) ran at 4.5 ms per (1024, 32, 32) call; this one
is bounded by ~0.5 GB of VMEM traffic per call (~100 us scale).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _spd_inverse_kernel(n: int, at_ref, out_ref, s_ref, l_ref, y_ref,
                        dinv_ref):
    """at_ref: (n, n, Bb) with at[j, i, b] = A[b, i, j] (symmetric, so
    row j = column j). out_ref: (n, n, Bb) with out[i, m, b] = Ainv[b, i, m].
    Scratch: s_ref/l_ref (n, n, Bb), y_ref (n, n, Bb), dinv_ref (n, Bb)."""
    dtype = at_ref.dtype
    row_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)     # (n, 1)

    s_ref[...] = at_ref[...]

    # ---- right-looking Cholesky: l_ref[j] = column j of L ----
    def chol_step(j, _):
        s = s_ref[j]                                           # (n, Bb)
        sj = jnp.sum(jnp.where(row_i == j, s, 0.0), axis=0)    # (Bb,)
        d = jax.lax.rsqrt(jnp.maximum(sj, 1e-12))
        col = jnp.where(row_i >= j, s * d[None, :], 0.0)       # (n, Bb)
        l_ref[j] = col
        dinv_ref[j] = d
        # trailing update; col is zero above j so no mask is needed
        s_ref[...] = s_ref[...] - col[:, None, :] * col[None, :, :]
        return ()

    jax.lax.fori_loop(0, n, chol_step, (), unroll=False)

    # ---- forward solve Y = L^-1 (rows y_i) fused with Ainv = sum y_i y_i^T
    # y_ref doubles as the right-hand-side residual R (init = I).
    eye = (row_i == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
           ).astype(dtype)                                     # (n, n) f32
    y_ref[...] = jnp.broadcast_to(eye[:, :, None],
                                  (n, n, at_ref.shape[2]))
    out_ref[...] = jnp.zeros_like(out_ref)

    def solve_step(i, _):
        y = y_ref[i] * dinv_ref[i][None, :]                    # (n, Bb)
        lcol = l_ref[i]                                        # (n, Bb)
        # R -= l_col_i y_i^T ; rows <= i are never read again
        y_ref[...] = y_ref[...] - lcol[:, None, :] * y[None, :, :]
        out_ref[...] = out_ref[...] + y[:, None, :] * y[None, :, :]
        return ()

    jax.lax.fori_loop(0, n, solve_step, (), unroll=False)


def default_block(n: int, batch: int) -> int:
    """Block size over the batch dimension: 128 measured fastest at n=32
    (353 us vs 444 us at 256 for 1024 inverses) and keeps the 5 block-sized
    vmem buffers small next to the staged call operands."""
    return min(batch, 128)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def pallas_spd_inverse_bt(At: jnp.ndarray, block_b: int = 128,
                          interpret: bool = False) -> jnp.ndarray:
    """Batch-LAST entry: At (n, n, B) with At[j, i, b] = A[b, i, j]
    (symmetric input, so At can simply be the (n, n, B) fleet mass matrix).
    Returns Ainv_bt (n, n, B) with Ainv_bt[i, m, b] = A[b]^-1[i, m] -- the
    kernel's native layout, zero transposes (used by physics/fleet.py)."""
    n, _, B = At.shape
    pad = (-B) % block_b
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=At.dtype)[:, :, None],
                               (n, n, pad))
        At = jnp.concatenate([At, eye], axis=-1)
    Bp = At.shape[-1]

    # The TPU toolchain stages each custom call's full operands + result in
    # scoped vmem (16 MB): at n=32/f32 that caps one call at ~1024 matrices
    # in + out (observed OOM at 2048, pass at 1024). Chunk oversized batches
    # through lax.map of <=8 MB calls.
    max_chunk = max(block_b, (8 * 2 ** 20) // (2 * 4 * n * n) // block_b
                    * block_b)
    if Bp > max_chunk:
        pad2 = (-Bp) % max_chunk
        if pad2:
            eye = jnp.broadcast_to(jnp.eye(n, dtype=At.dtype)[:, :, None],
                                   (n, n, pad2))
            At = jnp.concatenate([At, eye], axis=-1)
        chunks = jnp.moveaxis(
            At.reshape(n, n, At.shape[-1] // max_chunk, max_chunk), 2, 0)
        out = jax.lax.map(
            lambda c: pallas_spd_inverse_bt(c, block_b, interpret), chunks)
        return jnp.moveaxis(out, 0, 2).reshape(n, n, -1)[:, :, :B]

    # NB: no memory_space on the top-level specs — annotating VMEM pins the
    # WHOLE operand/result in scoped vmem; default placement keeps them in
    # HBM with per-grid-step block DMA.
    out_t = pl.pallas_call(
        functools.partial(_spd_inverse_kernel, n),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), At.dtype),
        grid=(Bp // block_b,),
        in_specs=[pl.BlockSpec((n, n, block_b), lambda i: (0, 0, i))],
        out_specs=pl.BlockSpec((n, n, block_b), lambda i: (0, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((n, n, block_b), At.dtype),   # S (Schur complement)
            pltpu.VMEM((n, n, block_b), At.dtype),   # L columns
            pltpu.VMEM((n, n, block_b), At.dtype),   # Y rows / residual R
            pltpu.VMEM((n, block_b), At.dtype),      # 1/diag(L)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(At)
    return out_t[:, :, :B]


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def pallas_spd_inverse(A: jnp.ndarray, block_b: int = 128,
                       interpret: bool = False) -> jnp.ndarray:
    """A (B, N, N) SPD -> A^-1, one pallas program per block of B."""
    B, n, _ = A.shape
    # batch-last layout: at[j, i, b] = A[b, i, j]
    At = jnp.transpose(A, (2, 1, 0))
    out_t = pallas_spd_inverse_bt(At, block_b=block_b, interpret=interpret)
    # out_t[i, m, b] -> (b, i, m)
    return jnp.transpose(out_t, (2, 0, 1))
