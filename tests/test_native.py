"""Native C++ host runtime (BVH closest point, fast winding, OBJ parser)
cross-validated against the XLA triangle sweep and pure-Python mesh I/O."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pytorch_volumetric_tpu import mesh as mesh_mod
from pytorch_volumetric_tpu import native
from pytorch_volumetric_tpu.ops.point_triangle import mesh_closest_query

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def capsule():
    return mesh_mod.capsule_mesh(radius=0.1, height=0.25, segments=12, rings=4)


def _triangles(m):
    return np.asarray(m.vertices)[np.asarray(m.faces)].astype(np.float32)


def test_native_matches_xla_sweep(capsule, rng):
    tris = _triangles(capsule)
    scene = native.NativeScene(tris)
    pts = rng.uniform(-0.3, 0.3, (512, 3)).astype(np.float32)

    d_n, cp_n, fid_n, w_n = scene.closest_query(pts)

    Fp = -(-len(tris) // 128) * 128
    tri_pad = np.full((Fp, 3, 3), mesh_mod.PAD_COORD, dtype=np.float32)
    tri_pad[:len(tris)] = tris
    d_x, cp_x, fid_x, w_x = mesh_closest_query(jnp.asarray(pts),
                                               jnp.asarray(tri_pad))

    np.testing.assert_allclose(d_n, np.asarray(d_x), atol=1e-5)
    np.testing.assert_allclose(cp_n, np.asarray(cp_x), atol=1e-4)
    # winding number: both ~1 inside, ~0 outside (thresholded agreement)
    np.testing.assert_array_equal(w_n > 0.5, np.asarray(w_x) > 0.5)


def test_native_winding_sign(capsule, rng):
    tris = _triangles(capsule)
    scene = native.NativeScene(tris)
    inside = np.zeros((8, 3), dtype=np.float32)
    inside[:, 2] = np.linspace(-0.1, 0.1, 8)
    outside = rng.uniform(0.5, 1.0, (8, 3)).astype(np.float32)
    _, _, _, w_in = scene.closest_query(inside)
    _, _, _, w_out = scene.closest_query(outside)
    assert np.all(w_in > 0.5)
    assert np.all(w_out < 0.5)


def test_native_obj_parser_roundtrip(capsule, tmp_path):
    path = os.path.join(str(tmp_path), "cap.obj")
    mesh_mod.save_obj(capsule, path)
    out = native.parse_obj_native(path)
    assert out is not None
    v, f = out
    np.testing.assert_allclose(v, np.asarray(capsule.vertices), atol=1e-6)
    np.testing.assert_array_equal(f, np.asarray(capsule.faces))


def test_native_large_batch_consistency(capsule, rng):
    # BVH traversal order must not affect results across batch sizes
    tris = _triangles(capsule)
    scene = native.NativeScene(tris)
    pts = rng.uniform(-0.4, 0.4, (2048, 3)).astype(np.float32)
    d_all, cp_all, _, w_all = scene.closest_query(pts)
    d_one, cp_one, _, w_one = scene.closest_query(pts[:7])
    np.testing.assert_array_equal(d_all[:7], d_one)
    np.testing.assert_array_equal(cp_all[:7], cp_one)
    np.testing.assert_array_equal(w_all[:7], w_one)


def test_empty_mesh_rejected():
    import pytest
    from pytorch_volumetric_tpu import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    with pytest.raises(ValueError):
        native.NativeScene(np.zeros((0, 3, 3), dtype=np.float32))
