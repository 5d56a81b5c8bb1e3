"""Batch-shape plumbing helpers.

TPU-native replacement for ``arm_pytorch_utilities.tensor_utils.
handle_batch_input`` (used by the reference at sdf.py:122): instead of a
decorator mutating torch tensors, we expose explicit flatten/unflatten helpers
that keep everything shape-static for XLA.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np


def as_float_array(x, dtype=jnp.float32) -> jnp.ndarray:
    """Coerce lists / numpy / torch tensors / jax arrays to a jnp array."""
    if hasattr(x, "detach") and hasattr(x, "cpu"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return jnp.asarray(x, dtype=dtype)


def flatten_batch(x: jnp.ndarray, event_ndim: int = 1
                  ) -> Tuple[jnp.ndarray, Callable[[jnp.ndarray], jnp.ndarray]]:
    """Flatten all leading dims of ``x`` except the last ``event_ndim``.

    Returns the flattened array and an ``unflatten(y)`` that restores the
    leading batch shape on an output whose own event dims may differ.
    """
    batch_shape = x.shape[: x.ndim - event_ndim]
    event_shape = x.shape[x.ndim - event_ndim:]
    flat = x.reshape((-1,) + event_shape) if batch_shape else x.reshape((1,) + event_shape)

    def unflatten(y: jnp.ndarray, batch_shape=batch_shape) -> jnp.ndarray:
        out_event = y.shape[1:]
        if batch_shape:
            return y.reshape(batch_shape + out_event)
        return y.reshape(out_event)

    return flat, unflatten


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def pad_to(x: jnp.ndarray, size: int, axis: int = 0, value=0.0) -> jnp.ndarray:
    """Pad ``x`` along ``axis`` up to ``size`` with ``value`` (static shapes)."""
    cur = x.shape[axis]
    if cur == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, size - cur)
    return jnp.pad(x, pad, constant_values=value)


def np_pad_to(x: np.ndarray, size: int, axis: int = 0, value=0.0) -> np.ndarray:
    cur = x.shape[axis]
    if cur == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, size - cur)
    return np.pad(x, pad, constant_values=value)
