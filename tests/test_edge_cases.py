"""Degenerate and boundary inputs: open meshes, tiny grids, single-child
unions, empty batches — the library should degrade predictably, not crash."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu import mesh as mesh_mod


@pytest.fixture
def box_factory(tmp_path):
    m = mesh_mod.box_mesh((0.2, 0.2, 0.2))
    path = os.path.join(str(tmp_path), "box.obj")
    mesh_mod.save_obj(m, path)
    return pv.MeshObjectFactory(path)


def test_open_mesh_single_triangle(tmp_path):
    # a lone triangle is an open surface: winding ~0 everywhere -> everything
    # classified outside, distance = unsigned point-triangle distance
    m = mesh_mod.TriangleMesh(
        np.array([[0.0, 0, 0], [1.0, 0, 0], [0.0, 1.0, 0]]),
        np.array([[0, 1, 2]], dtype=np.int32))
    path = os.path.join(str(tmp_path), "tri.obj")
    mesh_mod.save_obj(m, path)
    sdf = pv.MeshSDF(pv.MeshObjectFactory(path))
    pts = jnp.asarray([[0.2, 0.2, 0.5], [0.2, 0.2, -0.5], [2.0, 2.0, 0.0]],
                      dtype=jnp.float32)
    v, g = sdf(pts)
    np.testing.assert_allclose(np.asarray(v)[:2], [0.5, 0.5], atol=1e-5)
    assert float(v[2]) > 0
    assert np.all(np.isfinite(np.asarray(g)))


def test_cached_sdf_tiny_grid(box_factory, tmp_path, caplog):
    # grid coarser than the warning threshold still works
    sdf = pv.MeshSDF(box_factory)
    cached = pv.CachedSDF("tiny", 0.1, np.array([[-0.2, 0.2]] * 3), sdf,
                          cache_path=str(tmp_path / "c.npz"))
    v, g = cached(jnp.asarray([[0.0, 0.0, 0.0], [0.3, 0.0, 0.0]],
                              dtype=jnp.float32))
    assert float(v[0]) < 0 < float(v[1])


def test_composed_single_child(box_factory, tmp_path):
    sdf = pv.MeshSDF(box_factory)
    comp = pv.ComposedSDF([sdf], pv.Translate(0.1, 0.0, 0.0))
    pts = jnp.asarray(np.random.default_rng(0).uniform(-0.3, 0.3, (16, 3)),
                      dtype=jnp.float32)
    v1, g1 = comp(pts)
    v2, g2 = sdf(pts + jnp.asarray([0.1, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_query_single_point(box_factory):
    sdf = pv.MeshSDF(box_factory)
    v, g = sdf(jnp.zeros((1, 3)))
    assert v.shape == (1,) and g.shape == (1, 3)
    assert float(v[0]) < 0  # box center is inside


def test_voxel_grid_boundary_writes():
    grid = pv.VoxelGrid(0.1, [(0.0, 1.0)] * 3)
    corners = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    grid[corners] = jnp.asarray([1.0, 2.0])
    vals = grid[corners]
    np.testing.assert_allclose(np.asarray(vals), [1.0, 2.0])


def test_inverted_mesh_sign_parity(tmp_path):
    # orientation-independent |winding| inside test (reference ray parity):
    # an inside-out box must still report negative SDF inside
    m = mesh_mod.box_mesh((0.2, 0.2, 0.2))
    inverted = mesh_mod.TriangleMesh(m.vertices, m.faces[:, ::-1])
    assert inverted.signed_volume() < 0
    path = os.path.join(str(tmp_path), "inv.obj")
    mesh_mod.save_obj(inverted, path)
    sdf = pv.MeshSDF(pv.MeshObjectFactory(path))
    v, _ = sdf(jnp.zeros((1, 3)))
    assert float(v[0]) < 0
