"""Chamfer / PlausibleDiversity tests mirroring the reference's
tests/test_chamfer.py assertion content: exact transform -> 0 chamfer, mesh
chamfer underestimates point-cloud chamfer within 5%, PD properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_volumetric_tpu as pv
import pytorch_volumetric_tpu.transforms as tfm
from pytorch_volumetric_tpu import mesh as m
from pytorch_volumetric_tpu.chamfer import (
    batch_chamfer_dist, pairwise_distance, pairwise_distance_chamfer,
    PlausibleDiversity,
)


@pytest.fixture(scope="module", params=["wrench", "sphere"])
def obj(request, tmp_path_factory):
    d = tmp_path_factory.mktemp("assets")
    mesh = m.wrench_mesh() if request.param == "wrench" else m.icosphere_mesh(0.12, 2)
    p = str(d / f"{request.param}.obj")
    m.save_obj(mesh, p)
    return pv.MeshObjectFactory(p), str(d)


def test_chamfer_distance(obj):
    factory, d = obj
    B = 100
    N = 500
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)

    pts, normals, _ = pv.sample_mesh_points(factory, name=factory.name, num_points=N,
                                            dbpath=f"{d}/mp.npz")

    gt_tf = tfm.Transform3d(pos=jax.random.normal(k1, (3,)),
                            rot=tfm.random_rotation(k2))
    pts_world = gt_tf.transform_points(pts)

    # exact inverse transform -> chamfer ~ 0 (reference test_chamfer.py:36-38)
    world_to_object = jnp.tile(gt_tf.inverse().get_matrix(), (B, 1, 1))
    err = batch_chamfer_dist(world_to_object, pts_world, factory)
    assert err.shape == (B,)
    assert np.allclose(np.asarray(err), 0, atol=1e-4)

    # perturbed transforms: mesh chamfer underestimates the point-cloud chamfer
    # but within 5% (reference test_chamfer.py:49-66)
    perturbed_tf = gt_tf.sample_perturbations(
        B, radian_sigma=0.1, translation_sigma=0.1, key=k3)
    world_to_object_perturbed = perturbed_tf.inverse().get_matrix()
    err = batch_chamfer_dist(world_to_object_perturbed, pts_world, factory,
                             scale=1) * N
    perturbed_pts = perturbed_tf.transform_points(pts)

    # manual point-cloud chamfer with cdist
    all_dists = np.linalg.norm(
        np.asarray(pts_world)[None, :, None, :] -
        np.asarray(perturbed_pts)[:, None, :, :], axis=-1)
    gt_dist_manual = (all_dists.min(axis=2) ** 2).sum(axis=1)
    err_np = np.asarray(err)
    assert np.all(err_np < gt_dist_manual + 1e-5)
    # tightness within 5% only holds for irregular meshes: for (near-)symmetric
    # shapes like a sphere, tangential perturbations slide the surface onto
    # itself (mesh chamfer ~ 0) while the point-cloud chamfer stays > 0
    if "wrench" in factory.name:
        assert np.all(gt_dist_manual - err_np < 0.05 * gt_dist_manual)


def test_chamfer_with_sdf_approximation(obj):
    factory, d = obj
    sdf = pv.MeshSDF(factory)
    pts, _, _ = pv.sample_mesh_points(factory, name=factory.name, num_points=200,
                                      dbpath=f"{d}/mp.npz")
    key = jax.random.PRNGKey(0)
    gt_tf = tfm.Transform3d(pos=jax.random.normal(key, (3,)) * 0.1,
                            rot=tfm.random_rotation(key))
    pts_world = gt_tf.transform_points(pts)
    w2o = gt_tf.inverse().get_matrix()[None]
    err_factory = batch_chamfer_dist(w2o, pts_world, obj_factory=factory)
    err_sdf = batch_chamfer_dist(w2o, pts_world, obj_sdf=sdf)
    assert np.allclose(np.asarray(err_factory), np.asarray(err_sdf), atol=1e-4)


def test_pairwise_distance():
    key = jax.random.PRNGKey(1)
    mats = tfm.make_tf(pos=jax.random.normal(key, (5, 3)),
                       rot=tfm.random_rotations(key, 5))
    D = pairwise_distance(tfm.Transform3d(matrix=mats))
    assert D.shape == (5, 5)
    assert np.allclose(np.diag(np.asarray(D)), 0, atol=1e-5)
    assert np.allclose(np.asarray(D), np.asarray(D).T, atol=1e-5)


def test_pairwise_distance_chamfer(obj):
    factory, d = obj
    key = jax.random.PRNGKey(2)
    base = tfm.Transform3d(pos=jax.random.normal(key, (3,)) * 0.05,
                           rot=tfm.random_rotation(key))
    tfs = base.sample_perturbations(4, radian_sigma=0.05, translation_sigma=0.02,
                                    key=key)
    pts, _, _ = pv.sample_mesh_points(factory, name=factory.name, num_points=100,
                                      dbpath=f"{d}/mp.npz")
    D = pairwise_distance_chamfer(tfs, obj_factory=factory, model_points_eval=pts)
    assert D.shape == (4, 4)
    # diagonal is T_i^-1 T_i = identity -> ~0
    assert np.allclose(np.diag(np.asarray(D)), 0, atol=1e-3)


def test_plausible_diversity(obj):
    """Reference test_chamfer.py:104-130 properties."""
    factory, d = obj
    B = 10
    tol = 1e-4
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)

    gt_tf = tfm.Transform3d(pos=jax.random.normal(k1, (3,)),
                            rot=tfm.random_rotation(k2))
    gt_tf = gt_tf.sample_perturbations(B, radian_sigma=0.05, translation_sigma=0.01,
                                       key=k3)

    pts, _, _ = pv.sample_mesh_points(factory, name=factory.name, num_points=300,
                                      dbpath=f"{d}/mp.npz")
    pd = PlausibleDiversity(factory, model_points_eval=pts)

    # PD of a set against itself is 0
    ret = pd(gt_tf.inverse().get_matrix(), gt_tf.get_matrix())
    assert float(ret.plausibility) < tol
    assert float(ret.coverage) < tol

    # subset: plausibility stays 0, coverage error grows
    partial = tfm.Transform3d(matrix=gt_tf.get_matrix()[:B // 2])
    ret = pd(partial.inverse().get_matrix(), gt_tf.get_matrix(), bidirectional=True)
    assert float(ret.plausibility) < tol
    assert float(ret.coverage) > tol

    # reversed direction has the opposite effect and is symmetric
    ret_other = pd(gt_tf.inverse().get_matrix(), partial.get_matrix(),
                   bidirectional=True)
    assert float(ret_other.plausibility) > tol
    assert float(ret_other.coverage) < tol
    assert np.allclose(float(ret.plausibility), float(ret_other.coverage), rtol=0.06)
    assert np.allclose(float(ret.coverage), float(ret_other.plausibility), rtol=0.06)
