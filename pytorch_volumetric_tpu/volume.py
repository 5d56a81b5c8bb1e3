"""AABB membership test (reference volume.py:4-10)."""

from __future__ import annotations

import jax.numpy as jnp


def is_inside(points, range_per_dim) -> jnp.ndarray:
    """Whether each of ``points [N, d]`` lies inside ``range_per_dim [d, 2]``
    (min, max per row). Returns ``[N]`` bool.

    Input dtypes are preserved (the reference compares in the caller's
    dtype, volume.py:4-10): a forced f32 cast would flip strict containment
    for f64 points within f32-epsilon of a bound.  Under JAX's default
    32-bit mode f64 inputs still become f32; enable jax_enable_x64 for
    full-precision containment."""
    points = jnp.asarray(points)
    rng = jnp.asarray(range_per_dim)
    # let comparison promotion handle mixed dtypes (int points vs float
    # range must promote, not truncate the bounds)
    return jnp.all((rng[:, 0] <= points) & (points <= rng[:, 1]), axis=-1)
