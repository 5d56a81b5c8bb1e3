"""AABB membership test (reference volume.py:4-10)."""

from __future__ import annotations

import jax.numpy as jnp

from pytorch_volumetric_tpu.utils.batching import as_float_array


def is_inside(points, range_per_dim) -> jnp.ndarray:
    """Whether each of ``points [N, d]`` lies inside ``range_per_dim [d, 2]``
    (min, max per row). Returns ``[N]`` bool."""
    points = as_float_array(points)
    rng = as_float_array(range_per_dim)
    return jnp.all((rng[:, 0] <= points) & (points <= rng[:, 1]), axis=-1)
