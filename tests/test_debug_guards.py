"""In-graph checkify guards (utils/debug): the device-side analog of the
reference's host-side ``debug_check_sdf`` sanitizer (reference sdf.py:573-590)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu.utils.debug import checked_query


def test_clean_query_passes():
    sdf = pv.SphereSDF(0.5)
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3)),
                      dtype=jnp.float32)
    v, g = checked_query(sdf)(pts)
    v0, g0 = sdf.raw_query(pts)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g0))


def test_nonfinite_input_raises():
    sdf = pv.SphereSDF(0.5)
    pts = jnp.asarray([[jnp.nan, 0.0, 0.0]], dtype=jnp.float32)
    with pytest.raises(checkify.JaxRuntimeError, match="non-finite query"):
        checked_query(sdf)(pts)


def test_bad_gradient_caught():
    def bad_raw(pts):
        v = jnp.linalg.norm(pts, axis=-1)
        return v, pts * 10.0  # not a unit direction

    with pytest.raises(checkify.JaxRuntimeError, match="gradient norm"):
        checked_query(bad_raw)(jnp.ones((4, 3), dtype=jnp.float32))


def test_no_throw_mode_jits():
    sdf = pv.SphereSDF(0.5)
    fn = jax.jit(checked_query(sdf, throw=False))
    err, (v, g) = fn(jnp.ones((8, 3), dtype=jnp.float32))
    assert err.get() is None
    assert v.shape == (8,)
