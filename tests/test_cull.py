"""Culled coherent union == dense coherent union, bit for bit.

The culled path (``cull=`` on query_coherent / compose_query_coherent)
gathers brick rows only for (child, tile) pairs with an in-bounds point,
compacted to a static capacity, with an in-graph dense fallback when the
budget overflows.  Either branch must reproduce the dense coherent path
exactly — which itself is pinned bit-identical to the generic path
(test_coherent_query.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu.sdf import (
    compose_query_coherent, coherent_packed_bricks, coherent_fast_tables)
from pytorch_volumetric_tpu.transforms import transform_points
from pytorch_volumetric_tpu.utils.robots import make_serial_arm

exact = jax.default_backend() == "cpu"


def assert_same(a, b, **kw):
    a, b = np.asarray(a), np.asarray(b)
    if exact:
        np.testing.assert_array_equal(a, b, **kw)
    else:  # ~1 ulp FMA-contraction differences between compiled programs
        np.testing.assert_allclose(a, b, atol=1e-5, **kw)


@pytest.fixture(scope="module")
def robot(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("arm"))
    urdf_path, end_link = make_serial_arm(d, num_joints=3, segments=8, rings=2)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    return pv.RobotSDF(
        chain, path_prefix=d,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=0.04, padding=0.3,
            cache_path=str(tmp_path_factory.mktemp("c") / "cache.npz")))


def _configs(n=3, m=3):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(-1, 1, (n, m)).astype(np.float32))


# wide range so most (link, tile) pairs are genuinely out of bounds — the
# situation the culled path exists for
RANGE = np.array([[-0.8, 0.5], [-0.2, 0.25], [-0.4, 0.8]])


@pytest.mark.parametrize("cull", [0.9, 0.25, 1e-9])
def test_cull_matches_dense(robot, cull):
    """Generous budget (culled branch), tight budget, and a guaranteed
    overflow (1e-9 -> capacity 1 -> in-graph dense fallback) all reproduce
    the dense path's values and gradients exactly."""
    q = _configs()
    robot.set_joint_configuration(q)
    pts_t, take, seg = pv.get_coherent_tile_points(
        0.02, RANGE, cache_resolution=0.04)
    assert robot.sdf.check_coherent_contract(pts_t, seg=seg)
    v_d, g_d = robot.sdf.query_coherent(pts_t, seg=seg)
    v_c, g_c = robot.sdf.query_coherent(pts_t, seg=seg, cull=cull)
    assert_same(v_c, v_d)
    assert_same(g_c, g_d)
    v_vo = robot.sdf.query_coherent(pts_t, seg=seg, cull=cull,
                                    values_only=True)
    assert_same(v_vo, v_d)


def test_cull_culls_something(robot):
    """Sanity: on the wide range most (link, tile) pairs really are OOB, so
    a 50% budget runs the culled branch (not just the fallback).  Verified
    against the host-side count of valid pairs."""
    q = _configs()
    robot.set_joint_configuration(q)
    pts_t, _, seg = pv.get_coherent_tile_points(
        0.02, RANGE, cache_resolution=0.04)
    m = robot.sdf.obj_frame_to_link_frame.get_matrix()
    S, B, F = len(robot.sdf.sdfs), 3, pts_t.shape[0]
    pts_all = np.asarray(transform_points(m, pts_t)).reshape(S, B, F, 3)
    n_valid = n_total = 0
    for i, s in enumerate(robot.sdf.sdfs):
        lo = np.asarray(s.voxels.lo, dtype=np.float32)
        res = np.asarray(s.voxels.res, dtype=np.float32)
        n = np.asarray(s.voxels.shape)
        k = np.round((pts_all[i] - lo) / res)
        valid = np.all((k >= 0) & (k < n), axis=-1)
        sv = np.any(valid.reshape(B, F // seg, seg), axis=2)
        n_valid += int(sv.sum())
        n_total += sv.size
    frac = n_valid / n_total
    assert frac < 0.5, f"test range too tight: {frac:.2f} pairs in bounds"
    # a budget just above the true fraction still matches exactly
    v_d, g_d = robot.sdf.query_coherent(pts_t, seg=seg)
    v_c, g_c = robot.sdf.query_coherent(pts_t, seg=seg,
                                        cull=min(1.0, frac * 1.05 + 1e-3))
    assert_same(v_c, v_d)
    assert_same(g_c, g_d)


def test_cull_gradients_through_fk(robot):
    """grad w.r.t. joint configuration through the culled path equals the
    dense coherent path's (same straight-through VJP, same winners)."""
    q = _configs()
    pts_t, _, seg = pv.get_coherent_tile_points(
        0.02, RANGE, cache_resolution=0.04)
    children = tuple(robot.sdf.sdfs)
    ft = coherent_fast_tables(children)
    packed = coherent_packed_bricks(children)

    def loss(qq, cull, pk):
        m, m_inv = robot._link_transforms(qq)
        v, g = compose_query_coherent(children, m, m_inv, qq.shape[0], pts_t,
                                      fast_tables=ft, seg=seg,
                                      cull=cull, packed_bricks=pk)
        return v.sum() + g.sum()

    g_dense = jax.grad(loss)(q, None, None)
    g_cull = jax.grad(loss)(q, 0.6, packed)
    assert_same(g_cull, g_dense)
    # overflow fallback branch is differentiable too
    g_over = jax.grad(loss)(q, 1e-9, packed)
    assert_same(g_over, g_dense)


def test_cull_mixed_children(tmp_path):
    """Union mixing a cached fast child with an analytic (generic) child:
    cull applies to the fast child only and the combined result matches."""
    d = str(tmp_path)
    sphere = pv.SphereSDF(0.3)
    cached = pv.CachedSDF("sph", 0.05, np.array([[-0.5, 0.5]] * 3), sphere,
                          cache_path=f"{d}/c.npz")
    box = pv.BoxSDF((0.2, 0.2, 0.4))
    tsf = pv.Transform3d(pos=jnp.asarray([[0.3, 0.0, 0.0],
                                          [0.0, 0.25, 0.0]]))
    comp = pv.ComposedSDF([cached, box], tsf.stack(tsf))
    pts_t, take, seg = pv.get_coherent_tile_points(
        0.025, np.array([[-0.9, 0.9], [-0.1, 0.1], [-0.9, 0.9]]),
        cache_resolution=0.05)
    assert comp.check_coherent_contract(pts_t, seg=seg)
    v_d, g_d = comp.query_coherent(pts_t, seg=seg)
    v_c, g_c = comp.query_coherent(pts_t, seg=seg, cull=0.5)
    assert_same(v_c, v_d)
    assert_same(g_c, g_d)


def test_query_grid_cull(robot):
    """RobotSDF.query_grid(cull=...) reproduces the dense grid sweep
    exactly, values+grads and values_only."""
    q = _configs()
    v_d, g_d = robot.query_grid(q, RANGE, 0.02)
    v_c, g_c = robot.query_grid(q, RANGE, 0.02, cull=0.3)
    assert_same(v_c, v_d)
    assert_same(g_c, g_d)
    v_vo = robot.query_grid(q, RANGE, 0.02, cull=0.3, values_only=True)
    assert_same(v_vo, v_d)


def test_cull_all_generic_children_noop():
    """cull on a union with no coherent-fast children is a no-op (generic
    sub-path only), not an error."""
    sdfs = [pv.SphereSDF(0.3), pv.BoxSDF((0.2, 0.3, 0.4))]
    tf = pv.Transform3d(matrix=jnp.broadcast_to(jnp.eye(4), (2, 4, 4)))
    comp = pv.ComposedSDF(sdfs, tf)
    pts, _ = pv.get_coherent_grid_points(
        0.05, np.array([[-0.4, 0.4], [0.0, 0.0], [-0.4, 0.4]]))
    v_d, g_d = comp.query_coherent(pts)
    v_c, g_c = comp.query_coherent(pts, cull=0.5)
    assert_same(v_c, v_d)
    assert_same(g_c, g_d)
