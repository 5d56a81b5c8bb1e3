"""Pallas kernel vs XLA-oracle equivalence (interpret mode on CPU; the same
kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_volumetric_tpu import mesh as m
from pytorch_volumetric_tpu.ops.point_triangle import mesh_closest_query
from pytorch_volumetric_tpu.ops.pallas.closest_point import mesh_closest_query_pallas

INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def scene():
    mesh = m.icosphere_mesh(0.3, 2).concatenate(
        m.box_mesh((0.2, 0.3, 0.1), center=(0.4, 0.0, 0.0)))
    return m.MeshScene.from_mesh(mesh)


def test_pallas_matches_oracle(scene):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.6, 0.8, (300, 3)).astype(np.float32))
    d0, c0, f0, w0 = mesh_closest_query(pts, scene.tri)
    d1, c1, f1, w1 = mesh_closest_query_pallas(pts, scene.tri, interpret=INTERPRET)
    assert np.abs(np.asarray(d0) - np.asarray(d1)).max() < 1e-6
    assert np.abs(np.asarray(c0) - np.asarray(c1)).max() < 1e-6
    assert np.abs(np.asarray(w0) - np.asarray(w1)).max() < 5e-4  # in-kernel polynomial atan2
    # face-id contract: the chosen face must achieve the minimal distance.
    # Exact id equality does not hold on real TPU hardware — many faces are
    # equidistant (shared edges, coplanar box faces) and in-kernel FMA
    # contraction breaks ties differently than the XLA oracle.
    from pytorch_volumetric_tpu.ops.point_triangle import _closest_point_bary

    tri_np = np.asarray(scene.tri)
    chosen = jnp.asarray(tri_np[np.asarray(f1)])  # [P, 3, 3]
    d_chosen2, _ = _closest_point_bary(
        pts[:, None, :], chosen[:, None, 0], (chosen[:, 1] - chosen[:, 0])[:, None],
        (chosen[:, 2] - chosen[:, 0])[:, None])
    assert np.abs(np.sqrt(np.asarray(d_chosen2)[:, 0]) -
                  np.asarray(d0)).max() < 1e-5


def test_pallas_ragged_sizes(scene):
    """Point counts that don't divide the tile are padded internally."""
    rng = np.random.default_rng(1)
    for P in (1, 7, 129, 257):
        pts = jnp.asarray(rng.uniform(-0.5, 0.5, (P, 3)).astype(np.float32))
        d0, _, _, w0 = mesh_closest_query(pts, scene.tri)
        d1, _, _, w1 = mesh_closest_query_pallas(pts, scene.tri, interpret=INTERPRET)
        assert d1.shape == (P,)
        assert np.abs(np.asarray(d0) - np.asarray(d1)).max() < 1e-6
        assert np.abs(np.asarray(w0) - np.asarray(w1)).max() < 5e-4  # in-kernel polynomial atan2


def test_pallas_small_mesh():
    """Meshes smaller than one triangle tile."""
    scene = m.MeshScene.from_mesh(m.box_mesh((0.4, 0.6, 0.8)))
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, (64, 3)).astype(np.float32))
    d0, _, _, w0 = mesh_closest_query(pts, scene.tri)
    d1, _, _, w1 = mesh_closest_query_pallas(pts, scene.tri, interpret=INTERPRET)
    assert np.abs(np.asarray(d0) - np.asarray(d1)).max() < 1e-6
    assert np.abs(np.asarray(w0) - np.asarray(w1)).max() < 5e-4  # in-kernel polynomial atan2


def test_pallas_unaligned_triangle_count():
    """A RAW (non-128-padded) triangle array must still produce 128-aligned
    lane tiles (an unaligned BlockSpec passes interpret mode but fails Mosaic
    lowering on real TPUs)."""
    mesh = m.icosphere_mesh(0.25, 2)  # 320 faces: not a multiple of 128
    tri = jnp.asarray(mesh.triangles().astype(np.float32))
    assert tri.shape[0] % 128 != 0
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (64, 3)).astype(np.float32))
    d0, c0, f0, w0 = mesh_closest_query(pts, tri)
    d1, c1, f1, w1 = mesh_closest_query_pallas(pts, tri, interpret=INTERPRET)
    assert np.abs(np.asarray(d0) - np.asarray(d1)).max() < 1e-6
    assert np.abs(np.asarray(w0) - np.asarray(w1)).max() < 5e-4
