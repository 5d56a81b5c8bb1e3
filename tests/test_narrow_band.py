"""NarrowBandMeshSDF: exact in the band, voxel-accurate far field,
pseudonormal signs — cross-validated against the brute-force MeshSDF."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu import mesh as mesh_mod
from pytorch_volumetric_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def factory(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mesh"))
    m = mesh_mod.torus_mesh(major_radius=0.3, minor_radius=0.12,
                            major_segments=48, minor_segments=24)
    path = os.path.join(d, "torus.obj")
    mesh_mod.save_obj(m, path)
    return pv.MeshObjectFactory(path)


@pytest.fixture(scope="module")
def sdfs(factory):
    exact = pv.MeshSDF(factory)
    nb = pv.NarrowBandMeshSDF(factory, cell_res=0.03, band=0.1, padding=0.2)
    return exact, nb


def test_band_matches_exact(sdfs, rng):
    exact, nb = sdfs
    # points within the band: surface samples + small offsets
    base = rng.uniform(-0.45, 0.45, (400, 3)).astype(np.float32)
    v_ex, g_ex = exact(jnp.asarray(base))
    mask = np.abs(np.asarray(v_ex)) < 0.06  # comfortably inside the band
    pts = base[mask]
    assert len(pts) > 20
    v_nb, g_nb = nb(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(v_nb), np.asarray(v_ex)[mask],
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_nb), np.asarray(g_ex)[mask],
                               atol=1e-3)


def test_surface_samples_zero(factory, sdfs):
    _, nb = sdfs
    pts, _, _ = pv.sample_mesh_points(factory, num_points=200, seed=0,
                                      name="torus_nb", dbpath=None
                                      if False else "/tmp/nb_pts.npz")
    v, g = nb(pts)
    assert np.abs(np.asarray(v)).max() < 1e-4
    np.testing.assert_allclose(np.linalg.norm(np.asarray(g), axis=-1), 1.0,
                               atol=1e-4)


def test_far_field_accuracy(sdfs, rng):
    exact, nb = sdfs
    pts = rng.uniform(-0.55, 0.55, (500, 3)).astype(np.float32)
    v_ex, _ = exact(jnp.asarray(pts))
    v_nb, _ = nb(jnp.asarray(pts))
    # in-grid far field (outside the padded grid the documented semantics is
    # the AABB under-approximation, tested separately)
    lo = np.asarray(nb.tables.lo)
    hi = lo + np.asarray(nb.tables.res) * np.asarray(nb.tables.dims)
    in_grid = np.all((pts >= lo) & (pts <= hi), axis=-1)
    far = (np.abs(np.asarray(v_ex)) > 0.1) & in_grid
    # first-order-corrected far field: error well under a cell
    err = np.abs(np.asarray(v_nb) - np.asarray(v_ex))[far]
    assert err.max() < 0.015, err.max()
    # sign agrees everywhere (no surface inside far cells; out-of-grid
    # under-approximation is >= 0 and those points are outside)
    assert np.array_equal(np.sign(np.asarray(v_nb)) >= 0,
                          np.sign(np.asarray(v_ex)) >= 0)


def test_out_of_grid_fallback(sdfs):
    _, nb = sdfs
    pts = jnp.asarray([[2.0, 0.0, 0.0], [0.0, -3.0, 1.0]], dtype=jnp.float32)
    v, g = nb(pts)
    bb = np.asarray(nb.surface_bounding_box())
    clamped = np.clip(np.asarray(pts), bb[:, 0], bb[:, 1])
    expected = np.linalg.norm(np.asarray(pts) - clamped, axis=-1)
    np.testing.assert_allclose(np.asarray(v), expected, atol=1e-5)


def test_differentiable(sdfs, rng):
    _, nb = sdfs
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (64, 3)).astype(np.float32))

    def loss(offset):
        v, _ = nb.raw_query(pts + offset)
        return v.sum()

    g = jax.grad(loss)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    # straight-through: dloss/doffset == sum of analytic gradients
    _, grads = nb(pts)
    np.testing.assert_allclose(np.asarray(g), np.asarray(grads).sum(0),
                               rtol=1e-4, atol=1e-5)


def test_robot_with_narrow_band_links(tmp_path, rng):
    from pytorch_volumetric_tpu.utils.robots import make_serial_arm

    d = str(tmp_path / "arm")
    urdf_path, end_link = make_serial_arm(d, num_joints=3, segments=10, rings=3)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    exact = pv.RobotSDF(chain, path_prefix=d)  # MeshSDF links
    nb = pv.RobotSDF(chain, path_prefix=d,
                     link_sdf_cls=pv.narrow_band_link_sdf_factory(
                         cell_res=0.015, band=0.06, padding=0.1))
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (256, 3)).astype(np.float32))
    v_ex, g_ex = exact.query(q, pts)
    v_nb, g_nb = nb.query(q, pts)
    # near-surface values exact; elsewhere first-order far field / AABB
    near = np.abs(np.asarray(v_ex)) < 0.02
    np.testing.assert_allclose(np.asarray(v_nb)[near], np.asarray(v_ex)[near],
                               atol=1e-4)
    # min-union never overestimates by more than the far-field error and the
    # AABB fallback only underestimates
    assert np.all(np.asarray(v_nb) <= np.asarray(v_ex) + 0.01)


def test_narrow_band_disk_cache_roundtrip(tmp_path, rng):
    m = mesh_mod.icosphere_mesh(radius=0.2, subdivisions=2)
    path = os.path.join(str(tmp_path), "s.obj")
    mesh_mod.save_obj(m, path)
    fac = pv.MeshObjectFactory(path)
    cache = str(tmp_path / "nb.npz")
    nb1 = pv.NarrowBandMeshSDF(fac, cell_res=0.03, band=0.06, padding=0.1,
                               cache_path=cache)
    assert os.path.exists(cache)
    nb2 = pv.NarrowBandMeshSDF(fac, cell_res=0.03, band=0.06, padding=0.1,
                               cache_path=cache)  # cache hit, no native build
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (128, 3)).astype(np.float32))
    v1, g1 = nb1(pts)
    v2, g2 = nb2(pts)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    # different params -> different key -> rebuild (not a stale hit)
    nb3 = pv.NarrowBandMeshSDF(fac, cell_res=0.04, band=0.06, padding=0.1,
                               cache_path=cache)
    assert nb3.tables.dims.shape == (3,)


def test_union_threads_tables_as_arguments(sdfs):
    """Inside a ComposedSDF program the narrow-band tables ride in as jit
    ARGUMENTS (raw_query_aux), not captured constants: swapping the tables
    on the child changes results without a retrace (a captured constant
    would keep serving the stale values)."""
    _, nb = sdfs
    composed = pv.ComposedSDF([nb], pv.Transform3d(
        matrix=jnp.eye(4)[None]))
    pts = jnp.asarray([[0.45, 0.0, 0.0], [0.0, 0.0, 0.3]], dtype=jnp.float32)
    v0, _ = composed(pts)
    orig = nb.tables
    try:
        # shift every stored/far value by +0.25 (meta col 0 and candidate
        # corner data untouched: the far-field meta value drives far points)
        nb.tables = orig._replace(meta=orig.meta.at[:, 0].add(0.25))
        v1, _ = composed(pts)
    finally:
        nb.tables = orig
    assert not np.allclose(np.asarray(v0), np.asarray(v1)), (
        "table swap had no effect: tables were captured as constants")
    v2, _ = composed(pts)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v2), rtol=1e-6)
