import jax
import jax.numpy as jnp
import numpy as np

from pytorch_volumetric_tpu import mesh as m
from pytorch_volumetric_tpu.ops import point_triangle as pt


def analytic_box_sdf(pts, extents):
    """Exact SDF of an axis-aligned box centered at origin."""
    half = np.asarray(extents) / 2.0
    q = np.abs(pts) - half
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    return outside + inside


def test_single_triangle_regions():
    # triangle in z=0 plane
    tri = jnp.asarray(np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], dtype=np.float32))
    pts = jnp.array([
        [0.25, 0.25, 1.0],   # above interior -> dist 1
        [-1.0, -1.0, 0.0],   # closest to vertex a -> dist sqrt(2)
        [2.0, 0.0, 0.0],     # closest to vertex b -> dist 1
        [0.5, -1.0, 0.0],    # closest to edge AB -> dist 1
        [1.0, 1.0, 0.0],     # closest to edge BC -> dist sqrt(2)/2
    ], dtype=jnp.float32)
    dist, closest, fid, wind = pt.mesh_closest_query(pts, tri)
    expect = np.array([1.0, np.sqrt(2), 1.0, 1.0, np.sqrt(2) / 2])
    assert np.allclose(dist, expect, atol=1e-6)
    assert np.allclose(closest[0], [0.25, 0.25, 0.0], atol=1e-6)
    assert np.allclose(closest[3], [0.5, 0.0, 0.0], atol=1e-6)


def test_box_mesh_signed_query_matches_analytic():
    extents = (0.4, 0.6, 0.8)
    box = m.box_mesh(extents)
    scene = m.MeshScene.from_mesh(box)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.8, 0.8, size=(500, 3)).astype(np.float32)
    closest, sdf, grad, normal = pt.signed_closest_query(
        jnp.asarray(pts), scene.tri, scene.normals)
    expect = analytic_box_sdf(pts, extents)
    assert np.allclose(np.asarray(sdf), expect, atol=1e-5), (
        np.abs(np.asarray(sdf) - expect).max())
    # gradient is unit length
    gn = np.linalg.norm(np.asarray(grad), axis=-1)
    assert np.allclose(gn, 1.0, atol=1e-4)


def test_icosphere_sdf_close_to_analytic():
    r = 0.5
    sph = m.icosphere_mesh(radius=r, subdivisions=3)
    scene = m.MeshScene.from_mesh(sph)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1.0, 1.0, size=(400, 3)).astype(np.float32)
    _, sdf, grad, _ = pt.signed_closest_query(jnp.asarray(pts), scene.tri, scene.normals)
    analytic = np.linalg.norm(pts, axis=-1) - r
    # icosphere subdiv=3 chord error is ~r*(1-cos(theta/2)) ~ 1e-3
    assert np.abs(np.asarray(sdf) - analytic).max() < 5e-3
    # sign correct for points not too close to surface
    far = np.abs(analytic) > 1e-2
    assert np.all(np.sign(np.asarray(sdf)[far]) == np.sign(analytic[far]))
    # gradient points radially for outside points
    out = analytic > 0.05
    dirs = pts[out] / np.linalg.norm(pts[out], axis=-1, keepdims=True)
    cos = np.sum(np.asarray(grad)[out] * dirs, axis=-1)
    assert cos.min() > 0.99


def test_winding_number_inside_outside():
    box = m.box_mesh((1.0, 1.0, 1.0))
    scene = m.MeshScene.from_mesh(box)
    pts = jnp.array([[0.0, 0.0, 0.0], [0.4, 0.4, 0.4], [0.6, 0.0, 0.0],
                     [2.0, 2.0, 2.0]], dtype=jnp.float32)
    _, _, _, wind = pt.mesh_closest_query(pts, scene.tri)
    w = np.asarray(wind)
    assert w[0] > 0.99 and w[1] > 0.99       # inside -> ~1
    assert abs(w[2]) < 0.01 and abs(w[3]) < 0.01  # outside -> ~0


def test_point_chunking_consistency():
    sph = m.icosphere_mesh(radius=0.3, subdivisions=2)
    scene = m.MeshScene.from_mesh(sph)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, size=(300, 3)).astype(np.float32))
    d1, c1, f1, w1 = pt.mesh_closest_query(pts, scene.tri, point_chunk=64)
    d2, c2, f2, w2 = pt.mesh_closest_query(pts, scene.tri, point_chunk=4096)
    assert np.allclose(d1, d2, atol=1e-7)
    assert np.allclose(w1, w2, atol=1e-5)
    assert np.allclose(c1, c2, atol=1e-6)


def test_mesh_io_roundtrip(tmp_path):
    wrench = m.wrench_mesh()
    p = str(tmp_path / "wrench.obj")
    m.save_obj(wrench, p)
    loaded = m.read_triangle_mesh(p)
    assert np.allclose(loaded.vertices, wrench.vertices, atol=1e-7)
    assert np.array_equal(loaded.faces, wrench.faces)


def test_primitive_meshes_closed():
    """All procedural primitives must be watertight (winding number valid):
    every edge appears exactly twice with opposite orientation."""
    for mesh in [m.box_mesh((1, 2, 3)), m.icosphere_mesh(0.5, 1),
                 m.cylinder_mesh(0.5, 1.0, 12), m.capsule_mesh(0.2, 0.6, 12, 4),
                 m.torus_mesh(1.0, 0.3, 12, 8), m.wrench_mesh()]:
        edges = {}
        for (a, b, c) in mesh.faces:
            for e in [(a, b), (b, c), (c, a)]:
                edges[e] = edges.get(e, 0) + 1
        for (a, b), count in edges.items():
            assert count == 1, f"duplicated directed edge in {mesh}"
            assert edges.get((b, a), 0) == 1, f"unmatched edge {(a,b)} in {mesh}"


def test_uniform_sampling():
    box = m.box_mesh((1.0, 1.0, 1.0))
    pts, normals, fid = box.sample_points_uniformly(2000, seed=0, return_normals=True)
    # all samples on the surface of the box
    d = analytic_box_sdf(pts, (1.0, 1.0, 1.0))
    assert np.abs(d).max() < 1e-9
    # roughly uniform across 6 faces
    on_top = np.abs(pts[:, 2] - 0.5) < 1e-9
    assert 0.1 < on_top.mean() < 0.25
