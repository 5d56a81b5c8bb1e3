"""Reference-asset parity regression suite.

Loads the reference's *actual* test assets (read-only from
``/root/reference/tests``) and replicates every numeric assertion the
reference's own tests make on them:

- surface-sample |sdf| <= 1e-4 + batch-query equality
  (reference tests/test_sdf.py:10-29)
- batched-configs result == per-config loop
  (reference tests/test_model_to_sdf.py:206-212)
- free-6DOF single-link robot shape + near-surface contracts
  (reference tests/test_model_to_sdf.py:263-326)
- CachedSDF online debug checks (reference sdf.py:573-590)
- a documented verdict on the shared-face ComposedSDF artifact
  (reference tests/pv_sdf_debug/test_export_composed_sdf.py:18-42,
  reference README.md:59-60)

Skipped wholesale if the reference checkout is not present.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu import mesh as m

REF = "/root/reference/tests"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference assets not available")

MESHES = [
    # (relative path, expected faces)
    ("probe.obj", 338),                                      # SolidWorks export
    ("offset_wrench_nogrip.obj", 1263),                      # SolidWorks export
    ("YcbPowerDrill/textured_simple_reoriented.obj", 15728),  # Blender export
    ("YcbPowerDrill/collision_vhacd.obj", 342),              # 9-part VHACD hull
]


@pytest.mark.parametrize("name,nf", MESHES, ids=[n for n, _ in MESHES])
def test_gradients_at_surface_pts_reference_assets(name, nf, tmp_path):
    """Reference tests/test_sdf.py:10-29 on its own meshes: surface samples
    have |sdf| ~ 0 (atol 1e-4), batched query returns the same values, and
    the gradient at the surface matches the outward normal."""
    obj = pv.MeshObjectFactory(os.path.join(REF, name))
    assert obj._mesh.faces.shape[0] == nf  # parser reads every face
    sdf = pv.MeshSDF(obj)

    pts, normals, _ = pv.sample_mesh_points(
        obj, name=name, num_points=1000,
        dbpath=str(tmp_path / "model_points_cache.npz"))
    sdf_vals, sdf_grads = sdf(pts)
    assert np.allclose(np.abs(np.asarray(sdf_vals)), 0, atol=1e-4)

    batch_pts = pts.reshape(10, 100, -1)
    batch_vals, _ = sdf(batch_pts)
    assert batch_vals.shape == (10, 100)
    assert np.allclose(np.asarray(batch_vals).reshape(-1), np.asarray(sdf_vals))

    cos = np.sum(np.asarray(sdf_grads) * np.asarray(normals), axis=-1)
    assert cos.min() > 0.99

    # interior sign: the mesh centroid is inside all four assets
    c = jnp.asarray(obj.center(), dtype=jnp.float32).reshape(1, 3)
    vc, _ = sdf(c)
    assert float(vc[0]) < 0


def test_cached_sdf_debug_check_probe(tmp_path):
    """CachedSDF's online sanitizer (reference sdf.py:573-590) on probe.obj:
    in-bounds error < resolution, OOB fallback under-approximates, gradient
    cosine similarity > 0.7."""
    obj = pv.MeshObjectFactory(os.path.join(REF, "probe.obj"))
    gt = pv.MeshSDF(obj)
    cached = pv.CachedSDF("probe", 0.002, obj.bounding_box(padding=0.02), gt,
                          cache_path=str(tmp_path / "sdf_cache.npz"),
                          debug_check_sdf=True)
    rng = np.random.default_rng(0)
    lo, hi = np.asarray(obj.bounding_box(padding=0.01)).T
    pts = jnp.asarray(rng.uniform(lo, hi, (500, 3)).astype(np.float32))
    val, grad = cached(pts)
    vg, _ = gt(pts)
    assert np.abs(np.asarray(val) - np.asarray(vg)).max() < 0.002


def test_single_link_robot_reference_wrench(tmp_path):
    """Reference tests/test_model_to_sdf.py:263-326 verbatim semantics on the
    reference's own offset_wrench.urdf + offset_wrench_nogrip.obj (coarser
    cache resolution to stay CPU-friendly; near-surface tolerance follows)."""
    chain = pv.build_serial_chain_from_urdf(
        open(os.path.join(REF, "offset_wrench.urdf")).read(), "offset_wrench")
    res = 0.002
    sdf = pv.RobotSDF(chain, path_prefix=REF,
                      link_sdf_cls=pv.cache_link_sdf_factory(
                          resolution=res, padding=0.05,
                          cache_path=str(tmp_path / "sdf_cache.npz")))
    th = jnp.zeros(6)
    sdf.set_joint_configuration(th.reshape(1, -1))
    query_range = sdf.surface_bounding_box(padding=0.05)[0]
    _, pts = pv.get_coordinates_and_points_in_grid(res, np.asarray(query_range))

    sdf_val, sdf_grad = sdf(pts)
    assert sdf_val.shape == (1, pts.shape[0])
    assert sdf_grad.shape == (1, pts.shape[0], 3)
    near_surface = np.abs(np.asarray(sdf_val[0])) < res / 2
    surf_pts = np.asarray(pts)[near_surface]
    assert surf_pts.shape[0] > 1000

    # multiple identical configurations -> identical bounding boxes
    B = 5
    sdf.set_joint_configuration(jnp.tile(th[None], (B, 1)))
    qr = sdf.surface_bounding_box(padding=0.05)
    assert qr.shape == (B, 3, 2)
    for i in range(1, B):
        assert np.allclose(qr[0], qr[i])

    # flat + batched query with batched configs (shape contract
    # [A x][B x] N from reference test_model_to_sdf.py:310-326)
    BB, N = 10, 100
    assert surf_pts.shape[0] > BB * N
    test_pts = jnp.asarray(surf_pts[:BB * N])
    vals, grads = sdf(test_pts)
    assert vals.shape == (B, BB * N)
    assert grads.shape == (B, BB * N, 3)
    assert np.allclose(np.abs(np.asarray(vals)), 0, atol=res / 2 + 1e-6)

    batch_vals, batch_grads = sdf(test_pts.reshape(BB, N, 3))
    assert batch_vals.shape == (B, BB, N)
    assert batch_grads.shape == (B, BB, N, 3)
    assert np.allclose(np.asarray(batch_vals), np.asarray(vals).reshape(B, BB, N))


def test_batch_over_configurations_reference_wrench(tmp_path):
    """Reference tests/test_model_to_sdf.py:206-212: batched configurations
    give exactly the per-configuration results, on the reference's free-6DOF
    wrench robot."""
    chain = pv.build_serial_chain_from_urdf(
        open(os.path.join(REF, "offset_wrench.urdf")).read(), "offset_wrench")
    sdf = pv.RobotSDF(chain, path_prefix=REF,
                      link_sdf_cls=pv.cache_link_sdf_factory(
                          resolution=0.005, padding=0.05,
                          cache_path=str(tmp_path / "sdf_cache.npz")))
    rng = np.random.default_rng(0)
    N = 8
    th = jnp.asarray(np.concatenate(
        [np.zeros((1, 6)), rng.normal(0, 0.1, (N - 1, 6))]).astype(np.float32))
    sdf.set_joint_configuration(th)
    _, pts = pv.get_coordinates_and_points_in_grid(
        0.01, np.array([[-0.1, 0.15], [0.0, 0.0], [-0.05, 0.05]]))
    all_val, all_grad = sdf(pts)
    assert all_val.shape == (N, pts.shape[0])
    for i in range(N):
        sdf.set_joint_configuration(th[i])
        v, g = sdf(pts)
        assert np.allclose(v, all_val[i], atol=1e-6)
        assert np.allclose(g, all_grad[i], atol=1e-6)


def test_zero_dof_drill_robot(tmp_path):
    """The YcbPowerDrill URDF is a single fixed link with no joints; RobotSDF
    must handle an M == 0 configuration vector (reference loads this URDF via
    pybullet, tests/YcbPowerDrill/model.urdf)."""
    chain = pv.build_chain_from_urdf(
        open(os.path.join(REF, "YcbPowerDrill/model.urdf")).read())
    s = pv.RobotSDF(chain, path_prefix=os.path.join(REF, "YcbPowerDrill"),
                    link_sdf_cls=pv.cache_link_sdf_factory(
                        resolution=0.01, padding=0.05,
                        cache_path=str(tmp_path / "sdf_cache.npz")))
    s.set_joint_configuration(jnp.zeros((1, 0)))
    pts = jnp.array([[0.0, 0.0, 0.05], [1.0, 1.0, 1.0]])
    v, g = s(pts)
    assert v.shape == (1, 2)
    assert float(v[0, 1]) > 0.5  # far point is far outside
    v2, g2 = s.query(jnp.zeros((1, 0)), pts)
    assert np.allclose(np.asarray(v), np.asarray(v2), atol=1e-6)
    assert s.link_bounding_boxes().shape == (8, 3)


# ---------------------------------------------------------------------------
# pv_sdf_debug: the shared-face ComposedSDF artifact scenes
# ---------------------------------------------------------------------------
# The checked-in scene meshes come from two axis-aligned boxes (box_template
# scaled/translated as below) that SHARE the z=0 face: the "t" box sits on top
# of the wider "f" box.  scene_mesh_gt is their boolean union (internal faces
# removed); scene_mesh_wrong keeps the internal shared faces.  The reference
# documents (README.md:59-60) that composing SDFs of parts gives artifacts on
# such scenes; these tests pin down exactly what this engine does on them.
_T_BOX = ((0.4, 0.4, 0.1), (0.8, 0.0, 0.1))    # scale, translation
_F_BOX = ((0.75, 0.4, 0.1), (0.45, 0.0, -0.1))

# probe points: deep in t-box, deep in f-box, on the shared internal plane
# region, outside, in the notch above f but left of t
_PROBES = np.array([
    [0.8, 0.0, 0.1],     # t center           gt sdf -0.1
    [0.45, 0.0, -0.1],   # f center           gt sdf -0.1
    [0.8, 0.0, 0.0],     # on internal plane  gt sdf -0.2 (deep inside union)
    [2.0, 0.0, 0.0],     # outside            gt sdf +0.8
    [0.0, 0.0, 0.1],     # notch              gt sdf +0.1 (above f, left of t)
], dtype=np.float32)
_GT_VALS = np.array([-0.1, -0.1, -0.2, 0.8, 0.1], dtype=np.float32)


def _scene_sdf(name):
    return pv.MeshSDF(pv.MeshObjectFactory(os.path.join(REF, "pv_sdf_debug", name)))


def test_scene_mesh_gt_exact():
    """The boolean-union mesh: winding-number signs and distances are exact."""
    sdf = _scene_sdf("scene_mesh_gt.obj")
    v, _ = sdf(jnp.asarray(_PROBES))
    assert np.allclose(np.asarray(v), _GT_VALS, atol=1e-5)


def test_scene_mesh_wrong_internal_face_artifact():
    """scene_mesh_wrong keeps the internal z=0 faces.  VERDICT: signs stay
    correct everywhere (coincident opposite-orientation internal faces cancel
    in the winding number), but magnitudes inside clamp to the distance to the
    nearest surface *including* internal faces — the exact artifact the
    reference documents for composed/shared-face scenes."""
    sdf = _scene_sdf("scene_mesh_wrong.obj")
    v = np.asarray(sdf(jnp.asarray(_PROBES))[0])
    # probe 2 sits exactly ON the internal plane: its distance collapses to 0
    # there (gt: -0.2 deep inside the union) — the artifact at its sharpest
    assert abs(v[2]) < 1e-5
    off_plane = [0, 1, 3, 4]
    assert np.all(np.sign(v[off_plane]) == np.sign(_GT_VALS[off_plane]))
    # a deep interior point near the plane reads the internal face distance:
    deep = np.asarray(sdf(jnp.array([[0.8, 0.0, 0.05]]))[0])[0]
    assert -0.06 < deep < -0.04  # true union depth is -0.15
    # outside values are unaffected by internal faces
    assert np.allclose(v[3:], _GT_VALS[3:], atol=1e-5)


def test_composed_boxes_match_gt_union():
    """ComposedSDF of the two part boxes vs the boolean-union mesh: signs
    agree everywhere (winding numbers on each closed part are robust); values
    agree outside; inside, the min-union under-estimates depth near the shared
    plane (the documented ComposedSDF caveat, reference README.md:59-60)."""
    box = m.read_triangle_mesh(os.path.join(REF, "pv_sdf_debug",
                                            "box_template.obj"))
    import tempfile
    d = tempfile.mkdtemp()
    paths = []
    for nm, (scale, trans) in [("t", _T_BOX), ("f", _F_BOX)]:
        vtx = box.vertices * np.array(scale) + np.array(trans)
        p = os.path.join(d, f"{nm}.obj")
        m.save_obj(m.TriangleMesh(vtx, box.faces), p)
        paths.append(p)
    parts = [pv.MeshSDF(pv.MeshObjectFactory(p)) for p in paths]
    comp = pv.ComposedSDF(parts, pv.transforms.Transform3d(
        matrix=jnp.tile(jnp.eye(4)[None], (2, 1, 1))))
    gt = _scene_sdf("scene_mesh_gt.obj")

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform([-0.5, -0.5, -0.3], [1.6, 0.5, 0.4],
                                  (2000, 3)).astype(np.float32))
    vc = np.asarray(comp(pts)[0])
    vg = np.asarray(gt(pts)[0])
    off_surface = np.abs(vg) > 1e-3
    assert np.all(np.sign(vc[off_surface]) == np.sign(vg[off_surface]))
    outside = vg > 0
    assert np.allclose(vc[outside], vg[outside], atol=1e-5)
    # inside: min-union reports distance-to-part-surface, which can only
    # under-estimate the union depth (vc >= vg on sdf values)
    assert np.all(vc[~outside] >= vg[~outside] - 1e-5)
    # and the artifact is real: some interior points are shallower than truth
    assert np.max(vc[~outside] - vg[~outside]) > 0.05


@pytest.mark.parametrize("name", ["scene_mesh_overlap.obj",
                                  "scene_mesh_separated.obj"])
def test_scene_variants_sane(name):
    """The blender-exported variants (slightly shifted part boxes) parse and
    give finite, correctly-signed values at far-outside points."""
    sdf = _scene_sdf(name)
    v = np.asarray(sdf(jnp.asarray(_PROBES))[0])
    assert np.all(np.isfinite(v))
    assert v[3] > 0.7  # far outside stays far outside


# ---------------------------------------------------------------------------
# Additional contracts on reference assets
# ---------------------------------------------------------------------------

def test_chamfer_tightness_reference_meshes(tmp_path):
    """Reference tests/test_chamfer.py:49-66: the mesh-based unidirectional
    chamfer underestimates the point-cloud (cdist) chamfer but stays within
    5% — pinned here on the reference's own irregular meshes (probe + wrench;
    symmetric procedural shapes can slide onto themselves and violate the
    bound, see tests/test_chamfer.py)."""
    import jax
    from pytorch_volumetric_tpu import transforms as tfm

    for name in ["probe.obj", "offset_wrench_nogrip.obj"]:
        factory = pv.MeshObjectFactory(os.path.join(REF, name))
        # the 5% bound needs the reference's dense N=1000 sampling: the
        # cloud-vs-cloud chamfer overestimates the cloud-vs-mesh one by
        # O(sample spacing), which only vanishes with enough points
        pts, _, _ = pv.sample_mesh_points(
            factory, name=name, num_points=1000,
            dbpath=str(tmp_path / "mp.npz"))
        N = pts.shape[0]
        key = jax.random.PRNGKey(3)
        k1, k2, k3 = jax.random.split(key, 3)
        gt_tf = tfm.Transform3d(pos=jax.random.normal(k1, (3,)) * 0.1,
                                rot=tfm.random_rotation(k2))
        pts_world = gt_tf.transform_points(pts)
        B = 16
        perturbed_tf = gt_tf.sample_perturbations(
            B, radian_sigma=0.1, translation_sigma=0.1, key=k3)
        w2o = perturbed_tf.inverse().get_matrix()
        err = np.asarray(pv.batch_chamfer_dist(w2o, pts_world, factory,
                                               scale=1)) * N
        perturbed_pts = perturbed_tf.transform_points(pts)
        all_d = np.linalg.norm(np.asarray(pts_world)[None, :, None, :]
                               - np.asarray(perturbed_pts)[:, None, :, :],
                               axis=-1)
        cloud = (all_d.min(axis=2) ** 2).sum(axis=1)
        assert np.all(err < cloud + 1e-5), name            # underestimate
        assert np.all(cloud - err < 0.05 * cloud), name    # within 5%


def test_winding_threshold_open_mesh(tmp_path):
    """Sign sensitivity on a NON-watertight mesh, documented: for an open
    hemisphere the winding number varies continuously (0.5 exactly at the rim
    plane's center), so classification near the opening flips with
    ``winding_threshold``.  This is the engine's analog of the reference's
    stochastic jittered ray parity on open geometry (reference
    sdf.py:147-154): deterministic here, but geometry-dependent in the same
    region."""
    from pytorch_volumetric_tpu import mesh as m

    sph = m.icosphere_mesh(0.3, 3)
    keep = sph.vertices[sph.faces].mean(axis=1)[:, 2] > 0
    hemi = m.TriangleMesh(sph.vertices, sph.faces[keep])
    p = str(tmp_path / "hemi.obj")
    m.save_obj(hemi, p)

    # under the dome (winding > 0.5), just below the rim plane's center
    # (winding just under 0.5), and far outside (winding ~ 0)
    pts = jnp.array([[0.0, 0.0, 0.15], [0.0, 0.0, -0.05], [0.5, 0.0, 0.0]])
    signs = {}
    for thr in (0.3, 0.5, 0.9):
        sdf = pv.MeshSDF(pv.MeshObjectFactory(p, winding_threshold=thr))
        signs[thr] = np.sign(np.asarray(sdf(pts)[0]))
    # far-outside point is positive at every threshold
    assert all(s[2] > 0 for s in signs.values())
    # default: dome interior negative, below-rim positive
    assert signs[0.5][0] < 0 and signs[0.5][1] > 0
    # permissive threshold annexes the region just below the open rim
    assert signs[0.3][1] < 0
    # strict threshold rejects even the dome interior (winding < 0.9 there)
    assert signs[0.9][0] > 0


def test_mesh_arm_robot(tmp_path):
    """8-link serial arm built from the reference's real probe/wrench meshes
    (the mesh-real analog of the reference's 8-link KUKA benchmark robot,
    reference tests/test_model_to_sdf.py:46-48,182): builds cached link SDFs,
    answers batched queries that match the per-config loop, and conforms to
    the coherent-sweep contract used by the benchmark."""
    from pytorch_volumetric_tpu.utils.robots import make_mesh_arm

    d = str(tmp_path / "mesh_arm")
    urdf_path, end_link = make_mesh_arm(
        d, [os.path.join(REF, "probe.obj"),
            os.path.join(REF, "offset_wrench_nogrip.obj")], num_joints=7)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    robot = pv.RobotSDF(chain, path_prefix=d,
                        link_sdf_cls=pv.cache_link_sdf_factory(
                            resolution=0.04, padding=0.3,
                            cache_path=str(tmp_path / "c.npz")))
    assert len(robot.sdf.sdfs) == 8

    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.uniform(-0.4, 0.4, (4, 7)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32)
                      + np.array([0, 0, 0.5], dtype=np.float32))
    robot.set_joint_configuration(qs)
    vb, gb = robot(pts)
    assert vb.shape == (4, 64) and np.isfinite(np.asarray(vb)).all()
    # near the arm's spine some point should be close/inside, far ones not
    assert float(vb.min()) < 0.15
    for i in range(4):
        robot.set_joint_configuration(qs[i])
        vi, _ = robot(pts)
        np.testing.assert_allclose(np.asarray(vb[i]), np.asarray(vi),
                                   atol=1e-6)

    # the benchmark's coherent sweep contract holds for this robot
    robot.set_joint_configuration(qs)
    cpts, take = pv.get_coherent_grid_points(
        0.02, np.array([[-0.4, 0.4], [0.0, 0.0], [0.0, 0.8]]))
    assert robot.sdf.check_coherent_contract(cpts)
    vc, gc = robot.sdf.query_coherent(cpts)
    vg, gg = robot.sdf(cpts)
    assert np.array_equal(np.asarray(vc), np.asarray(vg))
