import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu.voxel import GridView, VoxelGrid, ExpandingVoxelGrid, VoxelSet


def test_divisible_range():
    r = pv.get_divisible_range_by_resolution(0.1, [(0.0, 0.55), (-0.3, 0.34)])
    assert np.allclose(r, [(0.0, 0.6), (-0.3, 0.3)])


def test_coordinates_and_points():
    coords, pts = pv.get_coordinates_and_points_in_grid(0.5, [(0, 1), (0, 1)])
    assert len(coords) == 2
    # inclusive upper bound
    assert np.allclose(coords[0], [0, 0.5, 1.0])
    assert pts.shape == (9, 2)
    assert np.allclose(pts[0], [0, 0])
    assert np.allclose(pts[-1], [1, 1])


def test_voxel_down_sample():
    """Reference tests/test_voxel_sdf.py semantics: downsampled count bound and
    reconstruction error <= 2 * new resolution."""
    N = 100

    def f(x, y):
        return np.sin(x) + 2 * np.cos(y)

    x = np.linspace(-2, 2, N)
    y = np.linspace(-2, 2, N)
    xx, yy = np.meshgrid(x, y, indexing="ij")
    values = f(xx, yy).flatten()
    pts = np.stack((xx.flatten(), yy.flatten(), values), axis=-1)

    bounds = 4
    prev_resolution = bounds / N
    new_resolution = 0.2
    reduce_factor = prev_resolution / new_resolution
    pts_reduced = np.asarray(pv.voxel_down_sample(pts, new_resolution))

    values_reduced = f(pts_reduced[:, 0], pts_reduced[:, 1])
    assert pts_reduced.shape[0] < pts.shape[0] * reduce_factor
    assert np.allclose(values_reduced, pts_reduced[:, 2], atol=new_resolution * 2)


def test_voxel_grid_set_get():
    g = VoxelGrid(0.1, [(0, 1), (0, 1)])
    pts = jnp.array([[0.2, 0.3], [0.71, 0.68]])
    g[pts] = jnp.array([1.5, 2.5])
    got = g[pts]
    assert np.allclose(got, [1.5, 2.5])
    # nearby points snap to the same voxel
    got2 = g[jnp.array([[0.24, 0.26]])]
    assert np.allclose(got2, [1.5])
    # unknown voxel returns invalid_val 0
    assert float(g[jnp.array([[0.9, 0.1]])][0]) == 0.0
    pos, val = g.get_known_pos_and_values()
    assert pos.shape == (2, 2)
    assert set(np.asarray(val).tolist()) == {1.5, 2.5}


def test_expanding_voxel_grid():
    g = ExpandingVoxelGrid(0.1, [(0, 0.5), (0, 0.5)])
    g[jnp.array([[0.2, 0.2]])] = 1.0
    # write outside the range: grid grows, old value preserved
    g[jnp.array([[1.3, -0.4]])] = 2.0
    assert g.range_per_dim[0][1] >= 1.3
    assert g.range_per_dim[1][0] <= -0.4
    assert np.allclose(g[jnp.array([[0.2, 0.2], [1.3, -0.4]])], [1.0, 2.0])


def test_voxel_set():
    s = VoxelSet(jnp.zeros((0, 3)), jnp.zeros((0,)))
    s[jnp.array([[1.0, 2, 3]])] = jnp.array([4.0])
    pos, val = s.get_known_pos_and_values()
    assert pos.shape == (1, 3)
    assert float(val[0]) == 4.0
    with pytest.raises(RuntimeError):
        s[jnp.array([[1.0, 2, 3]])]


def test_grid_view_fallback_callable():
    data = jnp.arange(16.0).reshape(4, 4)
    view = GridView(data, [(0, 3), (0, 3)],
                    invalid_value=lambda pts: jnp.full(pts.shape[:-1], -9.0))
    out = view[jnp.array([[0.0, 1.0], [10.0, 10.0]])]
    assert np.allclose(out, [1.0, -9.0])


def test_is_inside():
    rng = jnp.array([[0.0, 1.0], [0.0, 2.0]])
    pts = jnp.array([[0.5, 1.0], [1.5, 1.0], [1.0, 2.0]])
    assert np.array_equal(np.asarray(pv.is_inside(pts, rng)), [True, False, True])


def test_resize_to_fit():
    g = VoxelGrid(0.1, [(0, 2), (0, 2)])
    g[jnp.array([[0.5, 0.5], [0.8, 0.9]])] = jnp.array([1.0, 2.0])
    g.resize_to_fit()
    assert g.range_per_dim[0][0] >= 0.3
    assert g.range_per_dim[0][1] <= 1.0
    assert np.allclose(g[jnp.array([[0.5, 0.5], [0.8, 0.9]])], [1.0, 2.0])


def test_setitem_below_range_does_not_wrap():
    """JAX scatter mod-normalizes negative indices before mode='drop';
    writes below the grid's lower bound must be dropped, not wrapped onto
    the far edge."""
    import jax.numpy as jnp
    import pytorch_volumetric_tpu as pv

    g = pv.VoxelGrid(0.1, [(0.0, 1.0)] * 3, dtype=jnp.bool_)
    g[jnp.array([[-0.35, 0.5, 0.5], [2.0, 0.5, 0.5]])] = True
    pts, _ = g.get_known_pos_and_values()
    assert pts.shape[0] == 0  # both writes out of range -> nothing stored


def test_degenerate_flat_dimension_grid():
    """A snapped-to-zero span yields one coordinate with a sane (nonzero)
    index resolution: reads at the plane hit the slice, far reads miss."""
    import jax.numpy as jnp
    import pytorch_volumetric_tpu as pv

    g = pv.VoxelGrid(0.1, [(0.0, 1.0), (0.0, 1.0), (0.5, 0.5)])
    g[jnp.array([[0.5, 0.5, 0.5]])] = 3.0
    assert float(g[jnp.array([[0.5, 0.5, 0.5]])][0]) == 3.0
    assert np.isfinite(np.asarray(g[jnp.array([[0.5, 0.5, 7.0]])])).all()
