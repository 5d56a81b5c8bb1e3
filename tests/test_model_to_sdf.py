"""RobotSDF integration tests, mirroring the reference's
tests/test_model_to_sdf.py assertion content on procedural assets, plus
joint-gradient contracts for the fused functional path."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu import mesh as m
from pytorch_volumetric_tpu.utils.robots import make_serial_arm, make_free_object_urdf


@pytest.fixture(scope="module")
def arm_sdf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("arm"))
    urdf_path, end_link = make_serial_arm(d, num_joints=3, link_length=0.2)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    s = pv.RobotSDF(chain, path_prefix=d,
                    link_sdf_cls=pv.cache_link_sdf_factory(
                        resolution=0.02, padding=0.2,
                        cache_path=f"{d}/sdf_cache.npz"))
    return s


def test_batch_over_configurations(arm_sdf):
    """Batched-configs result == per-config loop (reference
    tests/test_model_to_sdf.py:206-212, allclose / atol 1e-6)."""
    s = arm_sdf
    rng = np.random.default_rng(0)
    th0 = jnp.array([0.0, -math.pi / 4.0, math.pi / 4.0])
    N = 10
    th = jnp.concatenate([th0[None],
                          th0 + jnp.asarray(rng.normal(0, 0.1, (N - 1, 3)),
                                            dtype=jnp.float32)])
    s.set_joint_configuration(th)

    coords, pts = pv.get_coordinates_and_points_in_grid(
        0.02, np.array([[-0.5, 0.5], [0.02, 0.02], [-0.2, 0.8]]))

    all_sdf_val, all_sdf_grad = s(pts)
    assert all_sdf_val.shape == (N, pts.shape[0])

    for i in range(N):
        s.set_joint_configuration(th[i])
        sdf_val, sdf_grad = s(pts)
        assert np.allclose(sdf_val, all_sdf_val[i], atol=1e-6)
        assert np.allclose(sdf_grad, all_sdf_grad[i], atol=1e-6)


def test_functional_query_matches_stateful(arm_sdf):
    s = arm_sdf
    rng = np.random.default_rng(1)
    th = jnp.asarray(rng.uniform(-1, 1, (4, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (50, 3)).astype(np.float32))
    v_fn, g_fn = s.query(th, pts)
    s.set_joint_configuration(th)
    v_st, g_st = s(pts)
    assert np.allclose(np.asarray(v_fn), np.asarray(v_st), atol=1e-6)
    assert np.allclose(np.asarray(g_fn), np.asarray(g_st), atol=1e-6)


def test_joint_gradients(arm_sdf):
    """d(sdf)/d(q) via the fused path, checked against finite differences."""
    s = arm_sdf
    pts = jnp.array([[0.25, 0.0, 0.45], [0.0, 0.3, 0.2]])

    def loss(q):
        v, _ = s.query(q, pts)
        return jnp.sum(v)

    q0 = jnp.array([0.3, -0.5, 0.7])
    g = jax.grad(loss)(q0)
    assert bool(jnp.isfinite(g).all())
    eps = 1e-3
    for j in range(3):
        dq = jnp.zeros(3).at[j].set(eps)
        fd = (loss(q0 + dq) - loss(q0 - dq)) / (2 * eps)
        # cached-SDF gradients are piecewise constant; tolerate quantization
        assert abs(float(g[j]) - float(fd)) < 0.05, (j, float(g[j]), float(fd))


def test_single_link_robot(tmp_path):
    """Reference tests/test_model_to_sdf.py:263-326: free 6-DOF mesh 'robot',
    shape contracts and near-surface values."""
    d = str(tmp_path)
    m.save_obj(m.wrench_mesh(), f"{d}/wrench.obj")
    urdf_path, obj_name = make_free_object_urdf(d, "wrench.obj")
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), obj_name)
    sdf = pv.RobotSDF(chain, path_prefix=d,
                      link_sdf_cls=pv.cache_link_sdf_factory(
                          resolution=0.002, padding=0.05,
                          cache_path=f"{d}/sdf_cache.npz"))
    th = jnp.zeros(6)
    sdf.set_joint_configuration(th.reshape(1, -1))
    query_range = sdf.surface_bounding_box(padding=0.05)[0]
    coords, pts = pv.get_coordinates_and_points_in_grid(0.002, np.asarray(query_range))

    sdf_val, sdf_grad = sdf(pts)
    # batch of 1 config leads the output shape
    assert sdf_val.shape == (1, pts.shape[0])
    sdf_val = sdf_val[0]
    near_surface = np.abs(np.asarray(sdf_val)) < 0.001
    surf_pts = np.asarray(pts)[near_surface]
    assert surf_pts.shape[0] > 1000

    # multiple identical configurations -> identical bounding boxes
    B = 5
    th_b = jnp.tile(th[None], (B, 1))
    sdf.set_joint_configuration(th_b)
    query_range = sdf.surface_bounding_box(padding=0.05)
    assert query_range.shape == (B, 3, 2)
    for i in range(1, B):
        assert np.allclose(query_range[0], query_range[i])

    # flat query with batched configs
    BB, N = 10, 100
    assert surf_pts.shape[0] > BB * N
    test_pts = jnp.asarray(surf_pts[:BB * N])
    sdf_vals, sdf_grads = sdf(test_pts)
    assert sdf_vals.shape == (B, BB * N)
    assert sdf_grads.shape == (B, BB * N, 3)
    assert np.allclose(np.abs(np.asarray(sdf_vals)), 0, atol=1e-3)

    # batched query with batched configs
    batch_pts = test_pts.reshape(BB, N, 3)
    batch_vals, batch_grads = sdf(batch_pts)
    assert batch_vals.shape == (B, BB, N)
    assert batch_grads.shape == (B, BB, N, 3)
    assert np.allclose(np.asarray(batch_vals), np.asarray(sdf_vals).reshape(B, BB, N))


def test_posed_free_object_matches_transformed_query(tmp_path):
    """Setting the 6-DOF virtual pose equals querying the object SDF with
    inverse-transformed points."""
    d = str(tmp_path)
    m.save_obj(m.icosphere_mesh(0.2, 2), f"{d}/sph.obj")
    urdf_path, obj_name = make_free_object_urdf(d, "sph.obj", object_name="ball")
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), obj_name)
    sdf = pv.RobotSDF(chain, path_prefix=d)  # MeshSDF links
    trans = jnp.array([0.3, -0.1, 0.2])
    sdf.set_joint_configuration(jnp.concatenate([trans, jnp.zeros(3)]))
    pts = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, (100, 3)),
                      dtype=jnp.float32)
    v, _ = sdf(pts)
    # sphere translated by trans: sdf(p) = |p - trans| - r
    expected = np.linalg.norm(np.asarray(pts - trans), axis=-1) - 0.2
    assert np.abs(np.asarray(v) - expected).max() < 5e-3


def test_link_bounding_boxes(arm_sdf):
    s = arm_sdf
    s.set_joint_configuration(jnp.zeros(3))
    bbs = s.link_bounding_boxes()
    assert np.asarray(bbs).shape == (4, 8, 3)  # 4 links (base + 3), 8 corners
    # base link corners near the origin pedestal
    base_bb = np.asarray(bbs)[0]
    assert base_bb[:, 2].min() >= -0.01
    assert base_bb[:, 2].max() <= 0.25


def test_aabb_to_ordered_end_points():
    bb = np.array([[0.0, 1.0], [0.0, 2.0], [0.0, 3.0]])
    pts8 = pv.aabb_to_ordered_end_points(bb)
    assert pts8.shape == (8, 3)
    assert {tuple(p) for p in pts8.tolist()} == {
        (x, y, z) for x in (0.0, 1.0) for y in (0.0, 2.0) for z in (0.0, 3.0)}
    pts16 = pv.aabb_to_ordered_end_points(bb, arrange_in_sequential_order=True)
    assert pts16.shape == (16, 3)


def test_empty_configuration_batch(arm_sdf):
    """A (0, M) configuration batch (e.g. emptied by upstream filtering)
    yields well-formed empty results, not a reshape error."""
    s = arm_sdf
    pts = jnp.zeros((8, 3))
    v, g = s.query(jnp.zeros((0, 3)), pts)
    assert v.shape == (0, 8)
    assert g.shape == (0, 8, 3)
