"""SDF-layer tests mirroring the reference's assertion content
(reference tests/test_sdf.py) plus differentiability contracts, headless and
deterministic on procedural assets."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu import mesh as m


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("assets")
    paths = {}
    for name, mesh in [("wrench", m.wrench_mesh()),
                       ("sphere", m.icosphere_mesh(0.25, 3)),
                       ("box", m.box_mesh((0.3, 0.2, 0.1)))]:
        p = str(d / f"{name}.obj")
        m.save_obj(mesh, p)
        paths[name] = p
    return paths


def test_gradients_at_surface_pts(assets, tmp_path):
    obj = pv.MeshObjectFactory(assets["wrench"])
    sdf = pv.MeshSDF(obj)

    pts, normals, _ = pv.sample_mesh_points(
        obj, name="wrench", num_points=1000,
        dbpath=str(tmp_path / "model_points_cache.npz"))

    sdf_vals, sdf_grads = sdf(pts)
    # reference contract: |sdf| ~ 0 at surface samples, atol 1e-4
    assert np.allclose(np.abs(np.asarray(sdf_vals)), 0, atol=1e-4)

    # batch query: same values, batched shape
    batch_pts = pts.reshape(10, 100, -1)
    batch_vals, batch_grads = sdf(batch_pts)
    assert batch_vals.shape == (10, 100)
    assert batch_grads.shape == (10, 100, 3)
    assert np.allclose(np.asarray(batch_vals).reshape(-1), np.asarray(sdf_vals))

    # gradient at surface ~ surface normal
    cos = np.sum(np.asarray(sdf_grads) * np.asarray(normals), axis=-1)
    assert cos.min() > 0.99


def test_sphere_sdf():
    s = pv.SphereSDF(0.5)
    pts = jnp.array([[1.0, 0, 0], [0.25, 0, 0], [0, 0, 0.5]])
    val, grad = s(pts)
    assert np.allclose(val, [0.5, -0.25, 0.0], atol=1e-6)
    assert np.allclose(grad[0], [1, 0, 0], atol=1e-6)
    bb = s.surface_bounding_box(padding=0.1)
    assert np.allclose(bb, [[-0.6, 0.6]] * 3)


def test_mesh_sdf_differentiable(assets):
    obj = pv.MeshObjectFactory(assets["sphere"])
    sdf = pv.MeshSDF(obj)

    def loss(p):
        v, _ = sdf.raw_query(p)
        return jnp.sum(v)

    pts = jnp.array([[0.4, 0.0, 0.0], [0.0, -0.4, 0.1]])
    g = jax.grad(loss)(pts)
    _, analytic = sdf(pts)
    assert np.allclose(np.asarray(g), np.asarray(analytic), atol=1e-5)


def test_compose_sdf(assets):
    obj = pv.MeshObjectFactory(assets["box"])
    sdf1 = pv.MeshSDF(obj)
    sdf2 = pv.MeshSDF(obj)
    tsf1 = pv.Translate(0.1, 0, 0)
    tsf2 = pv.Translate(-0.2, 0, 0.2)
    sdf = pv.ComposedSDF([sdf1, sdf2], tsf1.stack(tsf2))

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (200, 3)).astype(np.float32))
    vals, grads = sdf(pts)
    assert vals.shape == (200,)
    assert grads.shape == (200, 3)

    # union == min over the two children, each seeing obj->child transformed pts
    v1, _ = sdf1(pts + jnp.array([0.1, 0, 0]))
    v2, _ = sdf2(pts + jnp.array([-0.2, 0, 0.2]))
    assert np.allclose(np.asarray(vals), np.minimum(np.asarray(v1), np.asarray(v2)),
                       atol=1e-6)


def test_composed_surface_bounding_box(assets):
    obj = pv.MeshObjectFactory(assets["box"])
    sdf = pv.ComposedSDF([pv.MeshSDF(obj), pv.MeshSDF(obj)],
                         pv.Translate(0.1, 0, 0).stack(pv.Translate(-0.2, 0, 0.2)))
    bb = np.asarray(sdf.surface_bounding_box())
    assert bb.shape == (3, 2)
    # children live at T_i^{-1} in the object frame: centers (-0.1,0,0), (0.2,0,-0.2)
    assert np.allclose(bb[0], [-0.25, 0.35], atol=1e-6)
    assert np.allclose(bb[2], [-0.25, 0.05], atol=1e-6)


def test_cached_sdf_matches_gt(assets, tmp_path):
    obj = pv.MeshObjectFactory(assets["box"])
    gt = pv.MeshSDF(obj)
    res = 0.01
    cache_path = str(tmp_path / "sdf_cache.npz")
    cached = pv.CachedSDF("box", res, obj.bounding_box(padding=0.1), gt,
                          cache_path=cache_path, debug_check_sdf=True)
    rng = np.random.default_rng(1)
    # in-bounds points (debug_check_sdf asserts error < resolution internally)
    pts = jnp.asarray(rng.uniform(-0.2, 0.2, (300, 3)).astype(np.float32))
    val, grad = cached(pts)
    val_gt, _ = gt(pts)
    assert np.abs(np.asarray(val) - np.asarray(val_gt)).max() < res

    # out-of-bounds -> AABB distance under-approximation
    far = jnp.asarray(rng.uniform(0.5, 1.0, (100, 3)).astype(np.float32))
    val_far, grad_far = cached(far)
    val_far_gt, _ = gt(far)
    assert np.all(np.asarray(val_far) < np.asarray(val_far_gt) + 1e-6)
    assert np.all(np.asarray(val_far) > 0)

    # second instantiation hits the disk cache (no gt_sdf needed)
    cached2 = pv.CachedSDF("box", res, obj.bounding_box(padding=0.1), gt,
                           cache_path=cache_path)
    val2, _ = cached2(pts)
    assert np.allclose(np.asarray(val), np.asarray(val2))


def test_cached_sdf_trilinear_smoother(assets, tmp_path):
    obj = pv.MeshObjectFactory(assets["sphere"])
    gt = pv.MeshSDF(obj)
    cache_path = str(tmp_path / "sdf_cache.npz")
    kw = dict(cache_path=cache_path)
    nearest = pv.CachedSDF("sph", 0.02, obj.bounding_box(padding=0.1), gt, **kw)
    trilin = pv.CachedSDF("sph", 0.02, obj.bounding_box(padding=0.1), gt,
                          interpolation="trilinear", **kw)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (500, 3)).astype(np.float32))
    vn, _ = nearest(pts)
    vt, _ = trilin(pts)
    gt_val, _ = gt(pts)
    err_n = np.abs(np.asarray(vn) - np.asarray(gt_val))
    err_t = np.abs(np.asarray(vt) - np.asarray(gt_val))
    assert err_t.mean() < err_n.mean()  # trilinear strictly more accurate on average


def test_cached_sdf_differentiable(assets, tmp_path):
    obj = pv.MeshObjectFactory(assets["box"])
    gt = pv.MeshSDF(obj)
    cached = pv.CachedSDF("box", 0.01, obj.bounding_box(padding=0.1), gt,
                          cache_path=str(tmp_path / "c.npz"))

    def loss(p):
        v, _ = cached.raw_query(p)
        return jnp.sum(v)

    pts = jnp.array([[0.2, 0.05, 0.0]])
    g = jax.grad(loss)(pts)
    _, analytic = cached(pts)
    assert np.allclose(np.asarray(g), np.asarray(analytic), atol=1e-6)


def test_outside_surface(assets, tmp_path):
    obj = pv.MeshObjectFactory(assets["sphere"])
    gt = pv.MeshSDF(obj)
    cached = pv.CachedSDF("sph", 0.02, obj.bounding_box(padding=0.1), gt,
                          cache_path=str(tmp_path / "c.npz"))
    pts = jnp.array([[0.0, 0.0, 0.0], [0.4, 0.0, 0.0], [5.0, 0.0, 0.0]])
    out = cached.outside_surface(pts)
    assert np.array_equal(np.asarray(out), [False, True, True])
    out_mesh = gt.outside_surface(pts)
    assert np.array_equal(np.asarray(out_mesh), [False, True, True])


def test_get_filtered_points(assets):
    obj = pv.MeshObjectFactory(assets["sphere"])
    sdf = pv.MeshSDF(obj)
    from pytorch_volumetric_tpu.voxel import VoxelGrid
    grid = VoxelGrid(0.05, obj.bounding_box(padding=0.05))
    interior = sdf.get_filtered_points(lambda v: v < 0, grid)
    # all returned voxel centers are really inside
    v, _ = sdf(interior)
    assert np.all(np.asarray(v) < 0.05)
    assert interior.shape[0] > 0


def test_sample_mesh_points_cache_roundtrip(assets, tmp_path):
    obj = pv.MeshObjectFactory(assets["box"])
    db = str(tmp_path / "pts.npz")
    p1, n1, _ = pv.sample_mesh_points(obj, num_points=50, seed=3, name="box", dbpath=db)
    # cache hit without a factory
    p2, n2, _ = pv.sample_mesh_points(None, num_points=50, seed=3, name="box", dbpath=db)
    assert np.allclose(p1, p2)
    assert np.allclose(n1, n2)
    # missing entry without factory raises
    with pytest.raises(RuntimeError):
        pv.sample_mesh_points(None, num_points=51, seed=3, name="box", dbpath=db)


def test_factory_pickle(assets):
    import pickle
    obj = pv.MeshObjectFactory(assets["wrench"])
    obj2 = pickle.loads(pickle.dumps(obj))
    assert obj2.name == obj.name
    pts = jnp.array([[0.0, 0.0, 0.0]])
    r1 = obj.object_frame_closest_point(pts)
    r2 = obj2.object_frame_closest_point(pts)
    assert np.allclose(r1.distance, r2.distance)


def test_get_voxel_view_and_gtless_restart(assets, tmp_path):
    """get_voxel_view rasterizes the SDF with a gt fallback for out-of-range
    reads (reference sdf.py:248-264, 604-614); a CachedSDF restored WITHOUT
    its ground truth still answers out-of-range reads via the AABB
    under-approximation, and refuses a custom-grid re-rasterization with a
    descriptive error."""
    obj = pv.MeshObjectFactory(assets["box"])
    gt = pv.MeshSDF(obj)
    cache_path = str(tmp_path / "c.npz")
    cached = pv.CachedSDF("box", 0.02, obj.bounding_box(padding=0.05), gt,
                          cache_path=cache_path)

    # default view is the cache's own grid; values match queries
    view = cached.get_voxel_view()
    pts = jnp.array([[0.0, 0.0, 0.0], [0.1, 0.05, 0.0]])
    assert np.allclose(np.asarray(view[pts]), np.asarray(cached(pts)[0]))

    # MeshSDF rasterized onto a custom grid (the ABC's path)
    from pytorch_volumetric_tpu.voxel import VoxelGrid
    gv = gt.get_voxel_view(VoxelGrid(0.05, obj.bounding_box(padding=0.02)))
    assert np.allclose(float(gv[jnp.zeros((1, 3))][0]),
                       float(gt(jnp.zeros((1, 3)))[0][0]), atol=0.05)

    # warm restart without gt: in-grid identical, out-of-grid AABB fallback
    restored = pv.CachedSDF("box", 0.02, obj.bounding_box(padding=0.05), None,
                            cache_path=cache_path)
    assert np.array_equal(np.asarray(restored(pts)[0]),
                          np.asarray(cached(pts)[0]))
    far = jnp.array([[0.9, 0.9, 0.9]])
    assert np.isfinite(float(restored.get_voxel_view()[far][0]))
    with pytest.raises(RuntimeError):
        restored.get_voxel_view(VoxelGrid(0.05, obj.bounding_box(padding=0.2)))
