"""Segmented brick-gather fast path == generic gather path, bit for bit.

The coherent path (ComposedSDF.query_coherent / compose_query_coherent)
amortizes one 4x4x4-voxel brick gather over 4 consecutive query points; it
must reproduce the generic per-point nearest-voxel path exactly, including
out-of-bounds AABB fallbacks and gradients through FK.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu.sdf import compose_query, compose_query_coherent
from pytorch_volumetric_tpu.utils.robots import make_serial_arm


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


def test_coherent_equals_generic_on_grid(robot):
    # query grid at half the cache resolution -> coherence contract holds;
    # range chosen to cover in-bounds, out-of-bounds, and straddling points
    q = _configs()
    robot.set_joint_configuration(q)
    query_range = np.array([[-0.6, 0.3], [0.01, 0.01], [-0.3, 0.7]])
    pts_c, take = pv.get_coherent_grid_points(0.02, query_range)
    _, pts_g = pv.get_coordinates_and_points_in_grid(0.02, query_range)
    assert pts_c.shape[0] % 4 == 0
    np.testing.assert_allclose(np.asarray(pts_c)[take], np.asarray(pts_g))

    v_gen, g_gen = robot.sdf(pts_g)
    v_coh, g_coh = robot.sdf.query_coherent(pts_c)
    if jax.default_backend() == "cpu":
        # bit-identical on CPU; on real TPU the two compiled programs differ
        # by FMA contraction order (~1 ulp)
        np.testing.assert_array_equal(np.asarray(v_coh)[:, take],
                                      np.asarray(v_gen))
        np.testing.assert_array_equal(np.asarray(g_coh)[:, take],
                                      np.asarray(g_gen))
    else:
        np.testing.assert_allclose(np.asarray(v_coh)[:, take],
                                   np.asarray(v_gen), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_coh)[:, take],
                                   np.asarray(g_gen), atol=1e-5)


def test_coherent_gradients_match_generic(robot):
    q = _configs()
    query_range = np.array([[-0.4, 0.2], [0.0, 0.0], [-0.1, 0.5]])
    pts, _ = pv.get_coherent_grid_points(0.02, query_range)
    children = tuple(s.raw_query for s in robot.sdf.sdfs)
    children_sdfs = tuple(robot.sdf.sdfs)

    def loss_generic(qq):
        m, m_inv = robot._link_transforms(qq)
        v, g = compose_query(children, m, m_inv, qq.shape[0], pts)
        return v.sum() + g.sum()

    def loss_coherent(qq):
        m, m_inv = robot._link_transforms(qq)
        v, g = compose_query_coherent(children_sdfs, m, m_inv, qq.shape[0], pts)
        return v.sum() + g.sum()

    g1 = jax.grad(loss_generic)(q)
    g2 = jax.grad(loss_coherent)(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_coherent_mixed_children():
    # union of a cached sphere and an analytic box: the analytic child goes
    # through the generic sub-path inside compose_query_coherent
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        sphere = pv.SphereSDF(0.3)
        cached = pv.CachedSDF("sph", 0.05, np.array([[-0.5, 0.5]] * 3), sphere,
                              cache_path=f"{d}/c.npz")
        from pytorch_volumetric_tpu.sdf import BoxSDF
        box = BoxSDF((0.2, 0.2, 0.4))
        tsf = pv.Transform3d(pos=jnp.asarray([[0.3, 0.0, 0.0],
                                              [0.0, 0.25, 0.0]]))
        comp = pv.ComposedSDF([cached, box], tsf.stack(tsf))
        pts, take = pv.get_coherent_grid_points(
            0.02, np.array([[-0.7, 0.7], [0.0, 0.0], [-0.7, 0.7]]))
        _, pts_g = pv.get_coordinates_and_points_in_grid(
            0.02, np.array([[-0.7, 0.7], [0.0, 0.0], [-0.7, 0.7]]))
        v_gen, g_gen = comp(pts_g)
        v_coh, g_coh = comp.query_coherent(pts)
        np.testing.assert_allclose(np.asarray(v_coh)[:, take],
                                   np.asarray(v_gen), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_coh)[:, take],
                                   np.asarray(g_gen), atol=1e-6)


def test_debug_check_contract(robot):
    q = _configs()
    robot.set_joint_configuration(q)
    pts, _ = pv.get_coherent_grid_points(
        0.02, np.array([[-0.3, 0.1], [0.0, 0.0], [-0.1, 0.3]]))
    assert robot.sdf.check_coherent_contract(pts)
    v, g = robot.sdf.query_coherent(pts, debug_check=True)
    assert np.all(np.isfinite(np.asarray(v)))

    # scattered random points violate the contract
    bad = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, (64, 3)),
                      dtype=jnp.float32)
    assert not robot.sdf.check_coherent_contract(bad)
    with pytest.raises(ValueError):
        robot.sdf.query_coherent(bad, debug_check=True)


def test_robot_query_grid(robot):
    q = _configs()
    query_range = np.array([[-0.4, 0.2], [0.0, 0.0], [-0.1, 0.5]])
    v, g = robot.query_grid(q, query_range, 0.02)
    # same values as the generic fused path on the same grid
    _, pts_g = pv.get_coordinates_and_points_in_grid(0.02, query_range)
    v_ref, g_ref = robot.query(q, pts_g)
    grid_shape = v.shape[1:]
    assert v.shape == (3,) + grid_shape and g.shape == v.shape + (3,)
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(np.asarray(v).reshape(3, -1),
                                      np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(g).reshape(3, -1, 3),
                                      np.asarray(g_ref))
    else:  # ~1 ulp FMA-contraction differences between compiled programs
        np.testing.assert_allclose(np.asarray(v).reshape(3, -1),
                                   np.asarray(v_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g).reshape(3, -1, 3),
                                   np.asarray(g_ref), atol=1e-5)
    # differentiable w.r.t. joint configuration
    gq = jax.grad(lambda qq: robot.query_grid(qq, query_range, 0.02)[0].sum())(q)
    assert np.all(np.isfinite(np.asarray(gq)))


def test_coherent_fuzz_random_geometry(tmp_path):
    # random primitive geometries, odd grid dims, ranges hitting grid edges:
    # the brick tables must reproduce the generic path bit-for-bit everywhere
    rng = np.random.default_rng(7)
    for trial in range(4):
        sdfs, tf_rows = [], []
        n_children = int(rng.integers(2, 5))
        res = float(rng.choice([0.03, 0.045, 0.06]))
        for c in range(n_children):
            r = float(rng.uniform(0.08, 0.25))
            gt = pv.SphereSDF(r)
            # deliberately non-round ranges -> odd voxel counts per dim
            span = rng.uniform(0.25, 0.6, 3)
            rpd = np.stack([-span, span + rng.uniform(0, res, 3)], axis=1)
            sdfs.append(pv.CachedSDF(f"s{trial}_{c}", res, rpd, gt,
                                     cache_path=str(tmp_path / "c.npz")))
            tf_rows.append(np.asarray(
                pv.Transform3d(pos=rng.uniform(-0.3, 0.3, 3).astype(np.float32))
                .get_matrix())[0])
        B = 2
        mats = np.stack([m for m in tf_rows for _ in range(B)])
        comp = pv.ComposedSDF(sdfs, pv.Transform3d(matrix=jnp.asarray(mats)))
        assert comp.tsf_batch == (B,)  # inferred link-major batch
        qres = res / 2
        qr = np.array([[-0.5, 0.45], [0.0, 0.0], [-0.45, 0.5]])
        pts_c, take = pv.get_coherent_grid_points(qres, qr)
        _, pts_g = pv.get_coordinates_and_points_in_grid(qres, qr)
        assert comp.check_coherent_contract(pts_c), f"trial {trial}"
        v_g, g_g = comp(pts_g)
        v_c, g_c = comp.query_coherent(pts_c)
        np.testing.assert_array_equal(np.asarray(v_c)[:, take], np.asarray(v_g),
                                      err_msg=f"trial {trial}")
        np.testing.assert_array_equal(np.asarray(g_c)[:, take], np.asarray(g_g),
                                      err_msg=f"trial {trial}")


def test_query_grid_falls_back_when_incoherent(robot):
    # sweep resolution equal to the cache resolution violates the brick
    # contract; query_grid must take the generic path and stay correct
    q = _configs()
    query_range = np.array([[-0.3, 0.1], [0.0, 0.0], [-0.1, 0.3]])
    v, g = robot.query_grid(q, query_range, 0.04)  # == cache res 0.04
    _, pts_g = pv.get_coordinates_and_points_in_grid(0.04, query_range)
    v_ref, g_ref = robot.query(q, pts_g)
    np.testing.assert_array_equal(np.asarray(v).reshape(3, -1),
                                  np.asarray(v_ref))


def test_query_coherent_multidim_batch(robot):
    rng2 = np.random.default_rng(1)
    q = jnp.asarray(rng2.uniform(-1, 1, (2, 2, 3)).astype(np.float32))
    try:
        robot.set_joint_configuration(q)
        pts, take = pv.get_coherent_grid_points(
            0.02, np.array([[-0.3, 0.1], [0.0, 0.0], [-0.1, 0.3]]))
        v_c, g_c = robot.sdf.query_coherent(pts)
        v_g, g_g = robot.sdf(pts)
        assert v_c.shape == v_g.shape == (2, 2, pts.shape[0])
        if jax.default_backend() == "cpu":
            np.testing.assert_array_equal(np.asarray(v_c), np.asarray(v_g))
        else:  # ~1 ulp FMA-contraction differences between compiled programs
            np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_g),
                                       atol=1e-6)
    finally:
        robot.set_joint_configuration(_configs())  # restore for other tests


def test_values_only_matches_full_path(robot):
    """values_only=True returns exactly the full path's values while
    skipping every gradient-side carry (the ~2x inference fast path)."""
    q = _configs()
    robot.set_joint_configuration(q)
    pts_c, _ = pv.get_coherent_grid_points(
        0.02, np.array([[-0.5, 0.2], [0.01, 0.01], [-0.2, 0.5]]))
    v_full, _ = robot.sdf.query_coherent(pts_c)
    v_only = robot.sdf.query_coherent(pts_c, values_only=True)
    np.testing.assert_array_equal(np.asarray(v_only), np.asarray(v_full))
    # gradients through the values-only path are stopped, not garbage
    g = jax.grad(lambda p: robot.sdf.query_coherent(
        p, values_only=True).sum())(pts_c)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_values_only_all_generic_children():
    sdfs = [pv.SphereSDF(0.3), pv.BoxSDF((0.2, 0.3, 0.4))]
    tf = pv.Transform3d(matrix=jnp.broadcast_to(jnp.eye(4), (2, 4, 4)))
    comp = pv.ComposedSDF(sdfs, tf)
    pts, _ = pv.get_coherent_grid_points(
        0.05, np.array([[-0.4, 0.4], [0.0, 0.0], [-0.4, 0.4]]))
    v_full, _ = comp.query_coherent(pts)
    v_only = comp.query_coherent(pts, values_only=True)
    np.testing.assert_array_equal(np.asarray(v_only), np.asarray(v_full))


def test_query_grid_values_only(robot):
    q = _configs()
    query_range = np.array([[-0.4, 0.2], [0.0, 0.0], [-0.1, 0.5]])
    v_full, _ = robot.query_grid(q, query_range, 0.02)
    v_only = robot.query_grid(q, query_range, 0.02, values_only=True)
    np.testing.assert_array_equal(np.asarray(v_only), np.asarray(v_full))
    # generic fallback (too-coarse sweep) honors the flag as well
    v_gen = robot.query_grid(q, query_range, 0.03, values_only=True)
    assert v_gen.shape[0] == 3


def test_mixed_fast_generic_tie_break(tmp_path):
    """A union mixing a generic child (analytic box, index 0) with a cached
    fast child (same box) produces massive exact value ties (the cached OOB
    AABB fallback equals the analytic box distance); the coherent path must
    pick the same winner — and therefore the same gradient — as the generic
    path's first-wins index order."""
    from pytorch_volumetric_tpu import mesh as m
    from pytorch_volumetric_tpu.transforms import Transform3d

    d = str(tmp_path)
    p = f"{d}/b.obj"
    m.save_obj(m.box_mesh((0.2, 0.2, 0.2)), p)
    fac = pv.MeshObjectFactory(p)
    cached = pv.CachedSDF("b", 0.08, fac.bounding_box(padding=0.1),
                          pv.MeshSDF(fac), cache_path=f"{d}/c.npz")
    prim = pv.BoxSDF((0.2, 0.2, 0.2))
    eye2 = lambda: Transform3d(matrix=jnp.tile(jnp.eye(4)[None], (2, 1, 1)))
    comp_c = pv.ComposedSDF([prim, cached], eye2())
    comp_g = pv.ComposedSDF([prim, cached], eye2())
    pc, _ = pv.get_coherent_grid_points(
        0.04, np.array([[-0.4, 0.4]] * 3))
    assert comp_c.check_coherent_contract(pc)
    v_c, g_c = comp_c.query_coherent(pc)
    v_g, g_g = comp_g(pc)
    # ties must actually occur for this test to mean anything
    v_p, _ = prim.raw_query(pc)
    v_1, _ = cached.raw_query(pc)
    assert int(np.sum(np.asarray(v_p) == np.asarray(v_1))) > 100
    if jax.default_backend() == "cpu":
        # tie-break order is only observable when the two paths compute the
        # candidate values bit-identically — guaranteed on CPU
        assert np.array_equal(np.asarray(v_c), np.asarray(v_g))
        assert np.array_equal(np.asarray(g_c), np.asarray(g_g))
    else:
        # on real TPU the two compiled programs differ by FMA contraction
        # order (~1 ulp), so exact ties can differ between paths and the
        # winner — hence the gradient — may legitimately flip at tie points
        # where both children's gradients are valid subgradients.  Values
        # must still agree to float tolerance, and gradients must agree at
        # every point where the children are NOT exactly tied (only genuine
        # tie points are exempt from the winner-order contract).
        np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_g),
                                   atol=1e-6)
        untied = np.asarray(v_p) != np.asarray(v_1)
        assert int(untied.sum()) > 100  # the mask must leave real coverage
        np.testing.assert_allclose(np.asarray(g_c)[untied],
                                   np.asarray(g_g)[untied], atol=1e-5)


def test_tile_points_construction():
    """get_coherent_tile_points: seg picks the provably-safe tile (4 in 1D,
    12 in 2D, 27 in 3D at the standard 2x ratio; larger at bigger ratios),
    and pts[take_idx] reproduces raster order."""
    r1 = np.array([[0.0, 0.0], [0.0, 0.0], [-0.1, 0.2]])
    r2 = np.array([[-0.3, 0.3], [0.0, 0.0], [-0.1, 0.2]])
    r3 = np.array([[-0.1, 0.1], [-0.1, 0.15], [-0.1, 0.2]])
    for rng_pd, want_seg in ((r1, 4), (r2, 12), (r3, 27)):
        pts, take, seg = pv.get_coherent_tile_points(0.02, rng_pd)
        assert seg == want_seg
        assert pts.shape[0] % seg == 0
        _, pts_g = pv.get_coordinates_and_points_in_grid(0.02, rng_pd)
        np.testing.assert_allclose(np.asarray(pts)[take], np.asarray(pts_g))
    # larger cache/query ratio allows a bigger tile
    _, _, seg4 = pv.get_coherent_tile_points(0.01, r3, cache_resolution=0.04)
    assert seg4 > 27


def test_tile_query_equals_generic(robot):
    """Tiled coherent path (seg=12 on a 2D slice, 27 on a 3D block) is
    bit-identical to the generic path on CPU, under arbitrary rotated link
    transforms at the standard 2x cache/query ratio."""
    q = _configs()
    robot.set_joint_configuration(q)
    for rng_pd in (np.array([[-0.6, 0.3], [0.01, 0.01], [-0.3, 0.7]]),
                   np.array([[-0.3, 0.2], [-0.15, 0.2], [-0.1, 0.5]])):
        pts_t, take, seg = pv.get_coherent_tile_points(
            0.02, rng_pd, cache_resolution=0.04)
        assert seg in (12, 27)
        # the safety proof says the contract holds for ANY rigid transform
        assert robot.sdf.check_coherent_contract(pts_t, seg=seg)
        _, pts_g = pv.get_coordinates_and_points_in_grid(0.02, rng_pd)
        v_gen, g_gen = robot.sdf(pts_g)
        v_t, g_t = robot.sdf.query_coherent(pts_t, seg=seg, debug_check=True)
        if jax.default_backend() == "cpu":
            np.testing.assert_array_equal(np.asarray(v_t)[:, take],
                                          np.asarray(v_gen))
            np.testing.assert_array_equal(np.asarray(g_t)[:, take],
                                          np.asarray(g_gen))
        else:
            np.testing.assert_allclose(np.asarray(v_t)[:, take],
                                       np.asarray(v_gen), atol=1e-6)
            np.testing.assert_allclose(np.asarray(g_t)[:, take],
                                       np.asarray(g_gen), atol=1e-5)
        # values_only variant agrees too
        v_vo = robot.sdf.query_coherent(pts_t, seg=seg, values_only=True)
        np.testing.assert_array_equal(np.asarray(v_vo), np.asarray(v_t))


def test_tile_contract_rejects_oversized_tiles(robot):
    """A tile too large for the brick (seg grouping that spans > 2 voxels
    after clipping) must fail check_coherent_contract instead of silently
    corrupting: build tiles as if the cache were 2x coarser than it is."""
    q = _configs()
    robot.set_joint_configuration(q)
    rng_pd = np.array([[-0.3, 0.2], [-0.15, 0.2], [-0.1, 0.5]])
    # pretend cache res is 0.08 -> chooser picks a tile whose span breaks
    # the REAL 0.04 grid's brick containment
    pts_t, take, seg = pv.get_coherent_tile_points(
        0.02, rng_pd, cache_resolution=0.08)
    assert seg > 27
    assert not robot.sdf.check_coherent_contract(pts_t, seg=seg)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="coherence contract"):
        robot.sdf.query_coherent(pts_t, seg=seg, debug_check=True)


def test_composed_get_voxel_view_uses_tiles(robot):
    """ComposedSDF.get_voxel_view's tiled rasterization returns exactly the
    generic path's values (unbatched transforms)."""
    from pytorch_volumetric_tpu.voxel import VoxelGrid

    q = _configs(1, 3)[0]
    robot.set_joint_configuration(q)
    s = robot.sdf
    vg = VoxelGrid(0.02, np.array([[-0.3, 0.2], [-0.1, 0.1], [-0.1, 0.4]]))
    view = s.get_voxel_view(vg)
    pts = vg.get_voxel_center_points()
    v_ref, _ = s(pts)
    shape = [len(c) for c in vg.coords]
    np.testing.assert_array_equal(np.asarray(view.raw_data),
                                  np.asarray(v_ref).reshape(shape))
    # the out-of-grid fallback callable still answers
    far = jnp.array([[5.0, 5.0, 5.0]])
    assert float(view.invalid_value(far)[0]) > 1.0


def test_tile_shape_degenerate_ratio_falls_back():
    """A degenerate cache/query ratio (rho ~ 0) degrades to seg=1 instead of
    crashing, and tiny ratios below 2 shrink the tile."""
    pts, take, seg = pv.get_coherent_tile_points(
        0.02, np.array([[-0.1, 0.1]] * 3), cache_resolution=0.0)
    assert seg == 1
    _, pts_g = pv.get_coordinates_and_points_in_grid(
        0.02, np.array([[-0.1, 0.1]] * 3))
    np.testing.assert_allclose(np.asarray(pts)[take], np.asarray(pts_g))


def test_single_child_grad_bricks(tmp_path):
    """Single-cached-child unions take the winner-row-free 4-channel brick
    layout (_coherent_single_lookup): bricks4 is built for exactly one fast
    child, the results stay bit-identical to the generic path (values AND
    gradients, in- and out-of-bounds, under a rotated transform), and
    gradients flow through the custom VJP like the union path's."""
    from pytorch_volumetric_tpu import transforms as tfm
    from pytorch_volumetric_tpu.sdf import coherent_fast_tables

    sphere = pv.SphereSDF(0.3)
    cached = pv.CachedSDF("sph1", 0.05, np.array([[-0.5, 0.5]] * 3), sphere,
                          cache_path=str(tmp_path / "c.npz"))
    # rotated + translated child frame: tile keys stay inside one brick for
    # any rigid transform (the coherence contract), and rotation exercises
    # the R_back gradient rotation of the single-child branch
    R = np.asarray(tfm.euler_angles_to_matrix(
        jnp.asarray([0.3, -0.5, 0.9]), "XYZ"))
    mats = np.stack([np.asarray(tfm.make_tf(pos=[0.15, -0.05, 0.1], rot=R)),
                     np.asarray(tfm.make_tf(pos=[-0.2, 0.1, 0.0], rot=R.T))])
    comp = pv.ComposedSDF([cached], pv.Transform3d(matrix=jnp.asarray(mats)))

    ft = coherent_fast_tables(comp.sdfs)
    assert len(ft) == 1 and ft[0].bricks4 is not None
    assert ft[0].bricks4.shape == (ft[0].bricks.shape[0], 256)

    # covers in-bounds, out-of-bounds, and straddling points
    qr = np.array([[-0.8, 0.8], [0.0, 0.0], [-0.8, 0.8]])
    pts_c, take = pv.get_coherent_grid_points(0.02, qr)
    _, pts_g = pv.get_coordinates_and_points_in_grid(0.02, qr)
    v_gen, g_gen = comp(pts_g)
    v_coh, g_coh = comp.query_coherent(pts_c)
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(np.asarray(v_coh)[:, take],
                                      np.asarray(v_gen))
        np.testing.assert_array_equal(np.asarray(g_coh)[:, take],
                                      np.asarray(g_gen))
    else:
        np.testing.assert_allclose(np.asarray(v_coh)[:, take],
                                   np.asarray(v_gen), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_coh)[:, take],
                                   np.asarray(g_gen), atol=1e-5)

    # tile layout (seg > 4) through the same branch
    pts_t, take_t, seg_t = pv.get_coherent_tile_points(
        0.02, qr, cache_resolution=0.05)
    assert seg_t > 4
    v_t, g_t = comp.query_coherent(pts_t, seg=seg_t)
    np.testing.assert_allclose(np.asarray(v_t)[:, take_t],
                               np.asarray(v_gen), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_t)[:, take_t],
                               np.asarray(g_gen), atol=1e-6)

    # gradients w.r.t. the transform (through the straight-through VJP)
    # match the generic path's
    def loss_coh(m):
        c2 = pv.ComposedSDF([cached], pv.Transform3d(matrix=m))
        v, g = c2.query_coherent(pts_c)
        return v.sum() + g.sum()

    def loss_gen(m):
        c2 = pv.ComposedSDF([cached], pv.Transform3d(matrix=m))
        v, g = c2(pts_c)
        return v.sum() + g.sum()

    m0 = jnp.asarray(mats)
    g1 = jax.grad(loss_gen)(m0)
    g2 = jax.grad(loss_coh)(m0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_single_trilinear_coherent(tmp_path):
    """Single TRILINEAR cached child: query_coherent routes through the
    5x5x5 brick fast path (_coherent_single_trilinear_lookup) and matches
    the generic trilinear path exactly — smooth values AND interpolated
    gradients, in/out of bounds, under a rotated transform — with
    gradients flowing through the straight-through custom VJP."""
    from pytorch_volumetric_tpu import transforms as tfm
    from pytorch_volumetric_tpu.sdf import coherent_fast_tables

    sphere = pv.SphereSDF(0.3)
    cached = pv.CachedSDF("sph_t", 0.05, np.array([[-0.5, 0.5]] * 3), sphere,
                          interpolation="trilinear",
                          cache_path=str(tmp_path / "c.npz"))
    R = np.asarray(tfm.euler_angles_to_matrix(
        jnp.asarray([0.3, -0.5, 0.9]), "XYZ"))
    mats = np.stack([np.asarray(tfm.make_tf(pos=[0.15, -0.05, 0.1], rot=R)),
                     np.asarray(tfm.make_tf(pos=[-0.2, 0.1, 0.0], rot=R.T))])
    comp = pv.ComposedSDF([cached], pv.Transform3d(matrix=jnp.asarray(mats)))

    ft = coherent_fast_tables(comp.sdfs)
    assert len(ft) == 1 and ft[0].bricks5 is not None
    assert ft[0].bricks5.shape[1] == 512
    # a trilinear-only child never reads the 4x4x4 value bricks; building
    # them would waste 8x grid memory and a dead jit argument
    assert ft[0].bricks is None

    # covers in-bounds, out-of-bounds, and straddling points; both the
    # 4-point line layout and the larger tile layout
    qr = np.array([[-0.8, 0.8], [0.0, 0.0], [-0.8, 0.8]])
    pts_c, take = pv.get_coherent_grid_points(0.02, qr)
    _, pts_g = pv.get_coordinates_and_points_in_grid(0.02, qr)
    assert comp.check_coherent_contract(pts_c)
    v_gen, g_gen = comp(pts_g)
    v_coh, g_coh = comp.query_coherent(pts_c)
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(np.asarray(v_coh)[:, take],
                                      np.asarray(v_gen))
        np.testing.assert_array_equal(np.asarray(g_coh)[:, take],
                                      np.asarray(g_gen))
    else:
        np.testing.assert_allclose(np.asarray(v_coh)[:, take],
                                   np.asarray(v_gen), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_coh)[:, take],
                                   np.asarray(g_gen), atol=1e-5)
    # values_only returns the identical values
    v_o = comp.query_coherent(pts_c, values_only=True)
    np.testing.assert_array_equal(np.asarray(v_o), np.asarray(v_coh))

    # tile layout (seg > 4) through the same branch
    pts_t, take_t, seg_t = pv.get_coherent_tile_points(
        0.02, qr, cache_resolution=0.05)
    assert seg_t > 4
    assert comp.check_coherent_contract(pts_t, seg=seg_t)
    v_t, g_t = comp.query_coherent(pts_t, seg=seg_t)
    np.testing.assert_allclose(np.asarray(v_t)[:, take_t],
                               np.asarray(v_gen), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_t)[:, take_t],
                               np.asarray(g_gen), atol=1e-6)

    # transform gradients through the straight-through VJP match generic
    def loss_coh(m):
        c2 = pv.ComposedSDF([cached], pv.Transform3d(matrix=m))
        v, g = c2.query_coherent(pts_c)
        return v.sum() + g.sum()

    def loss_gen(m):
        c2 = pv.ComposedSDF([cached], pv.Transform3d(matrix=m))
        v, g = c2(pts_c)
        return v.sum() + g.sum()

    m0 = jnp.asarray(mats)
    g1 = jax.grad(loss_gen)(m0)
    g2 = jax.grad(loss_coh)(m0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_query_grid_single_trilinear_link(tmp_path):
    """RobotSDF.query_grid on a free object with a TRILINEAR link cache
    routes through the coherent trilinear brick path
    (coherent_min_cache_resolution counts the single trilinear child) and
    matches the generic per-point query exactly."""
    from pytorch_volumetric_tpu import mesh as m
    from pytorch_volumetric_tpu.utils.robots import make_free_object_urdf

    d = str(tmp_path)
    m.save_obj(m.icosphere_mesh(0.12, 1), f"{d}/ball.obj")
    urdf, name = make_free_object_urdf(d, f"{d}/ball.obj",
                                       object_name="ball")
    chain = pv.build_serial_chain_from_urdf(open(urdf).read(), name)
    robot = pv.RobotSDF(chain, path_prefix=d,
                        link_sdf_cls=pv.cache_link_sdf_factory(
                            resolution=0.04, padding=0.2,
                            cache_path=f"{d}/c.npz",
                            interpolation="trilinear"))
    from pytorch_volumetric_tpu.sdf import coherent_min_cache_resolution
    assert coherent_min_cache_resolution(robot.sdf.sdfs) == 0.04
    q = jnp.asarray(np.random.default_rng(0).uniform(-0.15, 0.15, (3, 6)),
                    dtype=jnp.float32)
    qr = np.array([[-0.25, 0.25], [-0.2, 0.2], [-0.2, 0.2]])
    v, g = robot.query_grid(q, qr, 0.02)
    _, pts_g = pv.get_coordinates_and_points_in_grid(0.02, qr)
    v_ref, g_ref = robot.query(q, pts_g)
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(
            np.asarray(v).reshape(3, -1), np.asarray(v_ref))
        np.testing.assert_array_equal(
            np.asarray(g).reshape(3, -1, 3), np.asarray(g_ref))
    else:
        np.testing.assert_allclose(np.asarray(v).reshape(3, -1),
                                   np.asarray(v_ref), atol=1e-6)


def test_multi_child_trilinear_stays_generic(tmp_path):
    """A trilinear child inside a MULTI-child union keeps the generic
    per-point sub-path (no bricks5 build) and the union still matches the
    generic composition exactly."""
    from pytorch_volumetric_tpu.sdf import coherent_fast_tables

    sphere = pv.SphereSDF(0.3)
    tri = pv.CachedSDF("m_t", 0.05, np.array([[-0.5, 0.5]] * 3), sphere,
                       interpolation="trilinear",
                       cache_path=str(tmp_path / "c.npz"))
    near = pv.CachedSDF("m_n", 0.05, np.array([[-0.45, 0.45]] * 3), sphere,
                        cache_path=str(tmp_path / "c.npz"))
    eye2 = lambda: pv.Transform3d(
        matrix=jnp.tile(jnp.eye(4)[None], (2, 1, 1)))
    comp = pv.ComposedSDF([tri, near], eye2())
    ft = coherent_fast_tables(comp.sdfs)
    assert len(ft) == 1  # only the nearest child takes the fast path
    assert ft[0].bricks5 is None
    pts_c, _ = pv.get_coherent_grid_points(
        0.02, np.array([[-0.6, 0.6], [0.0, 0.0], [-0.6, 0.6]]))
    v_c, g_c = comp.query_coherent(pts_c)
    v_g, g_g = pv.ComposedSDF([tri, near], eye2())(pts_c)
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(np.asarray(v_c), np.asarray(v_g))
    else:
        np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_g),
                                   atol=1e-6)


def test_multi_child_tables_skip_grad_bricks(robot):
    """Multi-child unions must NOT pay the 32x-memory bricks4 build (the
    4-channel layout measured 26% slower there — value bricks + winner rows
    stay the union layout)."""
    from pytorch_volumetric_tpu.sdf import coherent_fast_tables
    ft = coherent_fast_tables(robot.sdf.sdfs)
    assert len(ft) > 1
    assert all(t.bricks4 is None for t in ft)


def _junction_union(tmp_path, n_children=3, radius=0.012,
                    interpolation="nearest"):
    """A union of small cached spheres whose centers sit on a circle of
    ``radius`` in the x-y plane: a query tile containing the circle's center
    sees every angular Voronoi sector at once — forcing tiles with many
    distinct winning children (the per-tile winner path's residual lane)."""
    import pytorch_volumetric_tpu.transforms as tfm
    from pytorch_volumetric_tpu.sdf import ComposedSDF

    children = []
    mats = []
    for i in range(n_children):
        gt = pv.SphereSDF(0.02)
        c = pv.CachedSDF(f"j{i}", 0.04, np.array([[-0.5, 0.5]] * 3), gt,
                         interpolation=interpolation,
                         cache_path=str(tmp_path / f"j{i}.npz"))
        children.append(c)
        ang = 2 * np.pi * i / n_children
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = -radius * np.cos(ang)
        m[1, 3] = -radius * np.sin(ang)
        mats.append(m)
    tsf = tfm.Transform3d(matrix=np.stack(mats))
    return ComposedSDF(children, tsf)


def test_tile_winner_residual_path(tmp_path):
    """Tiles with >= 3 distinct winners take the compacted per-point residual
    lane and stay bit-identical to the generic path (CPU)."""
    sdf = _junction_union(tmp_path, n_children=6)
    # 27-point 3D tiles at ratio 2 span 0.04; tiles near the circle center
    # see 4-6 angular Voronoi sectors (>= 4 exercises the residual lane
    # under the 3-candidate design)
    # x/y ranges offset so one tile's 3x3 (x, y) footprint STRADDLES the
    # circle center (a center on a tile corner shows each tile only one
    # quadrant ~ 2-3 sectors)
    qr = np.array([[-0.07, 0.05], [-0.07, 0.05], [-0.04, 0.04]])
    pts_t, take, seg = pv.get_coherent_tile_points(0.02, qr,
                                                   cache_resolution=0.04)
    assert sdf.check_coherent_contract(pts_t, seg=seg)
    _, pts_g = pv.get_coordinates_and_points_in_grid(0.02, qr)

    # confirm the workload actually exercises >= 3-winner tiles
    v_each = np.stack([np.asarray(c(np.asarray(
        pv.transforms.transform_points(sdf.obj_frame_to_link_frame.get_matrix()[i],
                                       pts_t)))[0]) for i, c in enumerate(sdf.sdfs)])
    winners = v_each.argmin(axis=0).reshape(-1, seg)
    n_distinct = np.array([len(set(w)) for w in winners])
    assert (n_distinct >= 4).any(), "fixture no longer forces middle tiles"

    v_gen, g_gen = sdf(pts_g)
    v_coh, g_coh = sdf.query_coherent(pts_t, seg=seg)
    assert np.isfinite(np.asarray(g_coh)).all()
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(np.asarray(v_coh)[take], np.asarray(v_gen))
        np.testing.assert_array_equal(np.asarray(g_coh)[take], np.asarray(g_gen))
    else:
        np.testing.assert_allclose(np.asarray(v_coh)[take], np.asarray(v_gen),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_coh)[take], np.asarray(g_gen),
                                   atol=1e-5)


def test_tile_winner_residual_overflow_is_loud(tmp_path):
    """Middle tiles beyond the static residual capacity must yield NaN
    gradients (exact or LOUD), never silently wrong values."""
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            compose_query_coherent)

    sdf = _junction_union(tmp_path, n_children=6)
    # x/y ranges offset so one tile's 3x3 (x, y) footprint STRADDLES the
    # circle center (a center on a tile corner shows each tile only one
    # quadrant ~ 2-3 sectors)
    qr = np.array([[-0.07, 0.05], [-0.07, 0.05], [-0.04, 0.04]])
    pts_t, take, seg = pv.get_coherent_tile_points(0.02, qr,
                                                   cache_resolution=0.04)
    children = tuple(sdf.sdfs)
    ft = coherent_fast_tables(children)
    m = sdf.obj_frame_to_link_frame.get_matrix()
    m_inv = sdf.link_frame_to_obj_frame

    v_ref, g_ref = compose_query_coherent(children, m, m_inv, 1, pts_t,
                                          fast_tables=ft, seg=seg)
    assert np.isfinite(np.asarray(g_ref)).all()

    # near-zero capacity: some middle tiles overflow -> NaN-poisoned grads
    v_of, g_of = compose_query_coherent(children, m, m_inv, 1, pts_t,
                                        fast_tables=ft, seg=seg,
                                        residual_frac=1e-9)
    # values are unaffected (winner selection never uses the residual lane)
    np.testing.assert_array_equal(np.asarray(v_of), np.asarray(v_ref))
    g_of = np.asarray(g_of)
    assert np.isnan(g_of).any(), "overflow should NaN-poison gradients"
    # non-poisoned points still match exactly
    ok = np.isfinite(g_of).all(axis=-1)
    np.testing.assert_array_equal(g_of[ok], np.asarray(g_ref)[ok])


def test_tile_winner_backward_matches_generic(robot):
    """Joint-angle gradients THROUGH the per-tile winner path (value and
    gradient outputs both contributing) match the generic path."""
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            compose_query,
                                            compose_query_coherent)

    q = _configs()
    children = tuple(robot.sdf.sdfs)
    ft = coherent_fast_tables(children)
    assert len(ft) > 1 and all(t.gbricks is not None for t in ft)
    qr = np.array([[-0.5, 0.3], [0.01, 0.01], [-0.3, 0.5]])
    pts_t, take, seg = pv.get_coherent_tile_points(0.02, qr,
                                                   cache_resolution=0.04)

    def loss_tile(qq):
        m, m_inv = robot._link_transforms(qq)
        v, g = compose_query_coherent(children, m, m_inv, qq.shape[0], pts_t,
                                      fast_tables=ft, seg=seg)
        return v.sum() + g.sum()

    raws = tuple(s.raw_query for s in children)

    def loss_gen(qq):
        m, m_inv = robot._link_transforms(qq)
        v, g = compose_query(raws, m, m_inv, qq.shape[0], pts_t)
        return v.sum() + g.sum()

    g_tile = jax.grad(loss_tile)(q)
    g_gen = jax.grad(loss_gen)(q)
    np.testing.assert_allclose(np.asarray(g_tile), np.asarray(g_gen),
                               rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def tri_robot(tmp_path_factory):
    """3-link arm with TRILINEAR cached links (the multi-child trilinear
    union fast path, r5)."""
    d = str(tmp_path_factory.mktemp("tri_arm"))
    urdf_path, end_link = make_serial_arm(d, num_joints=3, segments=8,
                                          rings=2)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    return pv.RobotSDF(
        chain, path_prefix=d,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=0.04, padding=0.3, interpolation="trilinear",
            cache_path=str(tmp_path_factory.mktemp("tc") / "cache.npz")))


def test_multi_trilinear_union_fast_path(tri_robot):
    """A union of trilinear cached links takes the 5x5x5 tile union
    (tbricks/tgbricks tables) and matches the generic path bit-for-bit on
    CPU, for both line (seg=4) and tile (seg=12/27) layouts."""
    from pytorch_volumetric_tpu.sdf import coherent_fast_tables

    ft = coherent_fast_tables(tri_robot.sdf.sdfs)
    assert len(ft) == len(tri_robot.sdf.sdfs)
    assert all(t.tbricks is not None and t.tgbricks is not None for t in ft)
    assert all(t.bricks is None for t in ft)  # no 4x4x4 build for tri links

    q = _configs()
    tri_robot.set_joint_configuration(q)
    for rng_pd in (np.array([[-0.6, 0.3], [0.01, 0.01], [-0.3, 0.7]]),
                   np.array([[-0.3, 0.2], [-0.15, 0.2], [-0.1, 0.5]])):
        pts_t, take, seg = pv.get_coherent_tile_points(
            0.02, rng_pd, cache_resolution=0.04)
        assert tri_robot.sdf.check_coherent_contract(pts_t, seg=seg)
        _, pts_g = pv.get_coordinates_and_points_in_grid(0.02, rng_pd)
        v_gen, g_gen = tri_robot.sdf(pts_g)
        v_t, g_t = tri_robot.sdf.query_coherent(pts_t, seg=seg,
                                                debug_check=True)
        assert np.isfinite(np.asarray(g_t)).all()
        if jax.default_backend() == "cpu":
            np.testing.assert_array_equal(np.asarray(v_t)[:, take],
                                          np.asarray(v_gen))
            np.testing.assert_array_equal(np.asarray(g_t)[:, take],
                                          np.asarray(g_gen))
        else:
            np.testing.assert_allclose(np.asarray(v_t)[:, take],
                                       np.asarray(v_gen), atol=1e-6)
            np.testing.assert_allclose(np.asarray(g_t)[:, take],
                                       np.asarray(g_gen), atol=1e-5)
        # values_only variant agrees
        v_vo = tri_robot.sdf.query_coherent(pts_t, seg=seg, values_only=True)
        np.testing.assert_array_equal(np.asarray(v_vo), np.asarray(v_t))


def test_multi_trilinear_query_grid(tri_robot):
    """RobotSDF.query_grid routes trilinear-link robots through the tile
    union (coherent_min_cache_resolution counts them now)."""
    q = _configs()
    query_range = np.array([[-0.4, 0.2], [0.0, 0.0], [-0.1, 0.5]])
    v, g = tri_robot.query_grid(q, query_range, 0.02)
    _, pts_g = pv.get_coordinates_and_points_in_grid(0.02, query_range)
    v_ref, g_ref = tri_robot.query(q, pts_g)
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(np.asarray(v).reshape(3, -1),
                                      np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(g).reshape(3, -1, 3),
                                      np.asarray(g_ref))
    else:
        np.testing.assert_allclose(np.asarray(v).reshape(3, -1),
                                   np.asarray(v_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g).reshape(3, -1, 3),
                                   np.asarray(g_ref), atol=1e-5)


def test_multi_trilinear_residual_and_overflow(tmp_path):
    """>= 4-winner tiles in a trilinear union take the exact per-point
    8-corner residual lane; capacity overflow NaN-poisons loudly."""
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            compose_query_coherent)

    sdf = _junction_union(tmp_path, n_children=6, interpolation="trilinear")
    qr = np.array([[-0.07, 0.05], [-0.07, 0.05], [-0.04, 0.04]])
    pts_t, take, seg = pv.get_coherent_tile_points(0.02, qr,
                                                   cache_resolution=0.04)
    assert sdf.check_coherent_contract(pts_t, seg=seg)
    _, pts_g = pv.get_coordinates_and_points_in_grid(0.02, qr)
    v_gen, g_gen = sdf(pts_g)
    v_coh, g_coh = sdf.query_coherent(pts_t, seg=seg)
    assert np.isfinite(np.asarray(g_coh)).all()
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(np.asarray(v_coh)[take],
                                      np.asarray(v_gen))
        np.testing.assert_array_equal(np.asarray(g_coh)[take],
                                      np.asarray(g_gen))
    else:
        np.testing.assert_allclose(np.asarray(v_coh)[take],
                                   np.asarray(v_gen), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_coh)[take],
                                   np.asarray(g_gen), atol=1e-5)

    # near-zero capacity -> NaN-poisoned gradients, untouched values
    # (compare two EAGER compose calls: eager vs jit differ by FMA
    # contraction ~1 ulp, so the jitted query_coherent result above is not
    # the right bitwise reference here)
    children = tuple(sdf.sdfs)
    ft = coherent_fast_tables(children)
    m = sdf.obj_frame_to_link_frame.get_matrix()
    m_inv = sdf.link_frame_to_obj_frame
    v_ref, g_ref = compose_query_coherent(children, m, m_inv, 1, pts_t,
                                          fast_tables=ft, seg=seg)
    v_of, g_of = compose_query_coherent(children, m, m_inv, 1, pts_t,
                                        fast_tables=ft, seg=seg,
                                        residual_frac=1e-9)
    np.testing.assert_array_equal(np.asarray(v_of), np.asarray(v_ref))
    g_of = np.asarray(g_of)[0]
    assert np.isnan(g_of).any()
    ok = np.isfinite(g_of).all(axis=-1)
    np.testing.assert_array_equal(g_of[ok], np.asarray(g_ref)[0][ok])


def test_multi_trilinear_backward_matches_generic(tri_robot):
    """Joint-angle gradients through the trilinear tile union match the
    generic trilinear path."""
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            coherent_generic_aux,
                                            compose_query,
                                            compose_query_coherent)

    q = _configs()
    children = tuple(tri_robot.sdf.sdfs)
    ft = coherent_fast_tables(children)
    ga = coherent_generic_aux(children)
    assert ga == ()  # every child takes the trilinear union
    qr = np.array([[-0.5, 0.3], [0.01, 0.01], [-0.3, 0.5]])
    pts_t, take, seg = pv.get_coherent_tile_points(0.02, qr,
                                                   cache_resolution=0.04)

    def loss_tile(qq):
        m, m_inv = tri_robot._link_transforms(qq)
        v, g = compose_query_coherent(children, m, m_inv, qq.shape[0],
                                      pts_t, fast_tables=ft, seg=seg)
        return v.sum() + g.sum()

    raws = tuple(s.raw_query for s in children)

    def loss_gen(qq):
        m, m_inv = tri_robot._link_transforms(qq)
        v, g = compose_query(raws, m, m_inv, qq.shape[0], pts_t)
        return v.sum() + g.sum()

    g_tile = jax.grad(loss_tile)(q)
    g_gen = jax.grad(loss_gen)(q)
    np.testing.assert_allclose(np.asarray(g_tile), np.asarray(g_gen),
                               rtol=2e-4, atol=2e-4)
