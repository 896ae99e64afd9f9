"""PCHIP (monotone cubic Hermite) interpolation in pure JAX.

The reference builds its periodic-gait reward clocks from
scipy.interpolate.PchipInterpolator over 24 knot points
(cassie/phase_function.py:120-124). Those splines are evaluated per policy
step with a *dynamic* knot vector (knots depend on the per-episode
swing/stance durations), so a precomputed table is not enough -- this module
implements the Fritsch-Carlson derivative rule + cubic Hermite evaluation
with static shapes so spline construction and evaluation both live inside
jitted env steps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pchip_derivatives(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Knot derivatives by the Fritsch-Carlson / scipy `pchip` rule.

    x: (n,) strictly increasing knots; y: (..., n) values. Returns (..., n).
    Interior: weighted harmonic mean of adjacent secants, zero when secants
    change sign or vanish. Ends: one-sided three-point rule with monotonicity
    clamping (matches scipy's `_edge_case`).
    """
    h = jnp.diff(x)                      # (n-1,)
    m = jnp.diff(y, axis=-1) / h         # secants (..., n-1)

    hk, hk1 = h[:-1], h[1:]
    mk, mk1 = m[..., :-1], m[..., 1:]
    w1 = 2 * hk1 + hk
    w2 = hk1 + 2 * hk
    whmean = (w1 / mk + w2 / mk1) / (w1 + w2)
    interior = jnp.where(
        (jnp.sign(mk) * jnp.sign(mk1)) > 0, 1.0 / whmean, 0.0)

    def edge(h0, h1, m0, m1):
        d = ((2 * h0 + h1) * m0 - h0 * m1) / (h0 + h1)
        d = jnp.where(jnp.sign(d) != jnp.sign(m0), 0.0, d)
        d = jnp.where(
            (jnp.sign(m0) != jnp.sign(m1)) & (jnp.abs(d) > 3 * jnp.abs(m0)),
            3 * m0, d)
        return d

    d0 = edge(h[0], h[1], m[..., 0], m[..., 1])
    dn = edge(h[-1], h[-2], m[..., -1], m[..., -2])
    return jnp.concatenate(
        [d0[..., None], interior, dn[..., None]], axis=-1)


def pchip_eval(x: jnp.ndarray, y: jnp.ndarray, d: jnp.ndarray,
               t: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the Hermite cubic defined by (x, y, d) at scalar/array t.

    x: (n,); y, d: (..., n); t: any shape broadcastable. Clamps to the knot
    span (the reference only ever evaluates inside it).
    """
    n = x.shape[0]
    t = jnp.clip(t, x[0], x[-1])
    idx = jnp.clip(jnp.searchsorted(x, t, side="right") - 1, 0, n - 2)
    x0 = x[idx]
    h = x[idx + 1] - x0
    s = (t - x0) / h
    y0, y1 = y[..., idx], y[..., idx + 1]
    d0, d1 = d[..., idx], d[..., idx + 1]
    s2, s3 = s * s, s * s * s
    h00 = 2 * s3 - 3 * s2 + 1
    h10 = s3 - 2 * s2 + s
    h01 = -2 * s3 + 3 * s2
    h11 = s3 - s2
    return h00 * y0 + h10 * h * d0 + h01 * y1 + h11 * h * d1


def pchip(x: jnp.ndarray, y: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """One-shot: build + evaluate."""
    return pchip_eval(x, y, pchip_derivatives(x, y), t)
