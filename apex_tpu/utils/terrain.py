"""Terrain heightfield generators.

Rebuild of the reference's noise-terrain generator
(cassie/cassiemujoco/terrains/utils/noise_generator.py, 37 LoC: random
noise smoothed into a heightfield) as jittable generators producing
(HFIELD_RES, HFIELD_RES) grids for PhysParams.hfield.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from apex_tpu.physics.engine import HFIELD_RES


def noise_hfield(rng, amplitude: float = 0.05, smoothness: int = 3,
                 res: int = HFIELD_RES) -> jnp.ndarray:
    """Smoothed uniform noise terrain, zero-mean, +-amplitude."""
    h = jax.random.uniform(rng, (res, res), minval=-1.0, maxval=1.0)
    kernel = jnp.ones((smoothness, smoothness)) / (smoothness ** 2)
    for _ in range(2):
        h = jax.scipy.signal.convolve2d(h, kernel, mode="same")
    h = h - h.mean()
    scale = jnp.maximum(jnp.abs(h).max(), 1e-6)
    return amplitude * h / scale


def slope_hfield(pitch: float = 0.03, roll: float = 0.0,
                 radius: float = 10.0, res: int = HFIELD_RES) -> jnp.ndarray:
    """Planar incline expressed as a heightfield (tilt-terrain variants)."""
    xs = jnp.linspace(-radius, radius, res)
    X, Y = jnp.meshgrid(xs, xs, indexing="ij")
    return X * jnp.tan(pitch) + Y * jnp.tan(roll)


def steps_hfield(rng, step_height: float = 0.05, cells: int = 4,
                 res: int = HFIELD_RES) -> jnp.ndarray:
    """Random terraced steps (drop-step / stair variants)."""
    coarse = jax.random.uniform(rng, (cells, cells), minval=-1.0, maxval=1.0)
    h = jax.image.resize(coarse, (res, res), method="nearest")
    return step_height * h
