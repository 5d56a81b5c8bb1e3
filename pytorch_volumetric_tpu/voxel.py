"""Voxel grids with value-space indexing and automatic expansion.

TPU-native re-implementation of the reference's ``voxel.py`` plus the used
subset of its ``multidim_indexing.TorchMultidimView`` dependency (reference
voxel.py:10-171, sdf.py:535-550).  Grids are host-managed objects (shape
changes like :class:`ExpandingVoxelGrid` regrow on host, since XLA shapes are
static) wrapping device arrays; the hot gather path used by ``CachedSDF``
lives in jit-friendly free functions.
"""

from __future__ import annotations

import abc
from typing import Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_volumetric_tpu.utils.batching import as_float_array


def get_divisible_range_by_resolution(resolution: float, range_per_dim):
    """Snap each (lo, hi) so the span is an integer multiple of resolution
    (reference voxel.py:10-17)."""
    out = []
    for low, high in np.asarray(range_per_dim):
        span = round(float(high - low) / resolution)
        out.append((float(low), float(low) + span * resolution))
    return out


def get_coordinates_and_points_in_grid(resolution: float, range_per_dim,
                                       dtype=jnp.float32, device=None,
                                       get_points: bool = True):
    """Per-dim coordinates (inclusive upper bound, reference voxel.py:20-25)
    and the cartesian-product point list ``[N, d]``."""
    del device
    coords = [jnp.arange(low, high + 0.9 * resolution, resolution, dtype=dtype)
              for low, high in np.asarray(range_per_dim)]
    pts = None
    if get_points:
        mesh = jnp.meshgrid(*coords, indexing="ij")
        pts = jnp.stack(mesh, axis=-1).reshape(-1, len(coords))
    return coords, pts


def get_coherent_grid_points(resolution: float, range_per_dim,
                             dtype=jnp.float32):
    """Grid point list arranged for the segmented brick-gather fast path
    (``ComposedSDF.query_coherent``): the fastest-varying (last) dimension is
    padded to a multiple of 4 by repeating its final coordinate, so every
    consecutive quadruple of points is collinear with span ``3 * resolution``.
    That satisfies the coherence contract of ``compose_query_coherent``
    whenever the cached-SDF voxel resolution is at least ``2 * resolution``.

    Returns ``(pts [F, d], take_idx [N] numpy)`` where ``pts[take_idx]``
    reproduces :func:`get_coordinates_and_points_in_grid` point order (the
    padded duplicates are discarded).

    The inputs are host constants, so the build is forced to compile-time
    (concrete arrays even when called inside a jit/grad trace).
    """
    with jax.ensure_compile_time_eval():
        return _get_coherent_grid_points(resolution, range_per_dim, dtype)


def get_coherent_tile_points(resolution: float, range_per_dim,
                             cache_resolution: float = None,
                             dtype=jnp.float32):
    """Grid point list arranged in multi-dimensional TILES for the
    brick-gather fast path: every consecutive group of ``seg`` points is a
    box tile of grid points that provably lands inside one stride-2-anchored
    4x4x4 voxel brick under ANY rigid transform — one brick row then serves
    ``seg`` points instead of :data:`sdf.COHERENT_SEG` = 4, cutting gather
    rows (the TPU bottleneck) by ``seg/4``.

    Tile-shape choice: a tile with ``t_d - 1`` steps of ``resolution`` per
    dim has worst-case rotated per-axis span ``resolution * ||t - 1||_2``
    (Cauchy-Schwarz over rotation rows), and integer voxel keys of a span
    ``sigma`` fit the brick iff ``sigma < 2 * cache_resolution``.  The
    largest-volume integer tile satisfying ``||t - 1||_2 < 2 * rho`` (with
    ``rho = cache_resolution / resolution``, default 2 — the standard sweep
    ratio) is chosen: at rho=2 that is 4-point lines in 1D, (4, 3) = 12-point
    tiles for 2D slices, and (3, 3, 3) = 27-point tiles for 3D sweeps.
    ``cache_resolution`` should be the SMALLEST voxel resolution among the
    cached children that will be queried.

    Returns ``(pts [F, d], take_idx [N] numpy, seg)``: pass ``seg`` to
    ``query_coherent`` / ``compose_query_coherent``; ``pts[take_idx]``
    reproduces :func:`get_coordinates_and_points_in_grid` point order (padded
    duplicates discarded).
    """
    with jax.ensure_compile_time_eval():
        return _get_coherent_tile_points(resolution, range_per_dim,
                                         cache_resolution, dtype)


def _tile_shape(sizes, rho):
    """Largest-volume integer tile with ||t - 1||_2 < 2 * rho over the
    non-degenerate dims (ties broken toward less padding waste)."""
    from itertools import product as iproduct
    active = [i for i, s in enumerate(sizes) if s > 1]
    limit = (2.0 * rho) ** 2 - 1e-9
    # the all-ones tile is always admissible (a single point spans nothing),
    # so degenerate ratios (rho ~ 0) degrade to seg=1 instead of crashing
    best = ((1, 0.0), (1,) * len(active))
    for combo in iproduct(range(1, 9), repeat=len(active)):
        if sum((t - 1) ** 2 for t in combo) >= limit:
            continue
        waste = 1.0
        for a, t in zip(active, combo):
            waste *= -(-sizes[a] // t) * t / sizes[a]
        key = (int(np.prod(combo)), -waste)
        if best is None or key > best[0]:
            best = (key, combo)
    tile = [1] * len(sizes)
    for a, t in zip(active, best[1]):
        tile[a] = t
    return tile


def _get_coherent_tile_points(resolution, range_per_dim, cache_resolution,
                              dtype):
    coords, _ = get_coordinates_and_points_in_grid(resolution, range_per_dim,
                                                   dtype=dtype, get_points=False)
    sizes = [len(c) for c in coords]
    rho = (2.0 if cache_resolution is None
           else float(cache_resolution) / float(resolution))
    tile = _tile_shape(sizes, rho)
    seg = int(np.prod(tile))
    padded = []
    for c, t in zip(coords, tile):
        n = len(c)
        n_pad = -(-n // t) * t
        if n_pad != n:
            c = jnp.concatenate([c, jnp.full((n_pad - n,), c[-1], dtype=dtype)])
        padded.append(c)
    P = [len(c) for c in padded]
    d = len(P)
    mesh = jnp.meshgrid(*padded, indexing="ij")
    pts = jnp.stack(mesh, axis=-1)
    # [P1..Pd, d] -> [T1, t1, .., Td, td, d] -> tiles-major, within-tile-minor
    shape = []
    for Pd, td in zip(P, tile):
        shape += [Pd // td, td]
    pts = pts.reshape(*shape, d)
    perm = ([2 * i for i in range(d)] + [2 * i + 1 for i in range(d)]
            + [2 * d])
    pts = pts.transpose(*perm).reshape(-1, d)
    # original raster index -> position in the tiled order
    idxs = np.meshgrid(*[np.arange(s, dtype=np.int64) for s in sizes],
                       indexing="ij")
    pos_tile = np.zeros((), dtype=np.int64)
    pos_within = np.zeros((), dtype=np.int64)
    for i_d, td, Pd in zip(idxs, tile, P):
        pos_tile = pos_tile * (Pd // td) + i_d // td
        pos_within = pos_within * td + i_d % td
    take_idx = (pos_tile * seg + pos_within).reshape(-1)
    return pts, take_idx, seg


def _get_coherent_grid_points(resolution, range_per_dim, dtype):
    coords, _ = get_coordinates_and_points_in_grid(resolution, range_per_dim,
                                                   dtype=dtype, get_points=False)
    sizes = [len(c) for c in coords]
    nz = sizes[-1]
    nzp = -(-nz // 4) * 4
    if nzp != nz:
        last = jnp.concatenate(
            [coords[-1], jnp.full((nzp - nz,), coords[-1][-1], dtype=dtype)])
        coords = coords[:-1] + [last]
    mesh = jnp.meshgrid(*coords, indexing="ij")
    pts = jnp.stack(mesh, axis=-1).reshape(-1, len(coords))
    lead = int(np.prod(sizes[:-1], dtype=np.int64))
    take_idx = (np.arange(lead, dtype=np.int64)[:, None] * nzp
                + np.arange(nz, dtype=np.int64)[None, :]).reshape(-1)
    return pts, take_idx


# ---------------------------------------------------------------------------
# Value-space grid view (multidim_indexing replacement)
# ---------------------------------------------------------------------------

class GridView:
    """A dense array viewed through value-space coordinates.

    Maps d-dimensional points to nearest-voxel indices via the affine
    ``idx = round((x - lo) / res)`` per dimension; supports raveled
    gather/scatter and an out-of-range fallback that is either a scalar or a
    callable evaluated on the out-of-range points (the reference uses the
    ground-truth SDF itself as the callable, sdf.py:521-523).
    """

    def __init__(self, data: jnp.ndarray, range_per_dim,
                 invalid_value: Union[float, Callable] = 0.0):
        self.raw_data = jnp.asarray(data)
        rng = np.asarray(range_per_dim, dtype=np.float64)
        self.range_per_dim = rng
        self.shape = tuple(self.raw_data.shape)
        d = len(self.shape)
        self.lo = rng[:, 0]
        # a degenerate dimension (single coordinate, zero span) would give
        # res 0 and NaN/inf index keys; use 1.0 so only points within half a
        # unit of the plane snap to its one valid slice
        self.res = np.array([
            ((rng[i, 1] - rng[i, 0]) / max(self.shape[i] - 1, 1))
            or 1.0 for i in range(d)])
        self.invalid_value = invalid_value
        self._strides = np.array(
            [int(np.prod(self.shape[i + 1:], dtype=np.int64)) for i in range(d)])

    # -- key conversions ------------------------------------------------------
    def ensure_index_key(self, pts) -> jnp.ndarray:
        pts = as_float_array(pts)
        lo = jnp.asarray(self.lo, dtype=pts.dtype)
        res = jnp.asarray(self.res, dtype=pts.dtype)
        return jnp.round((pts - lo) / res).astype(jnp.int32)

    def ensure_value_key(self, indices) -> jnp.ndarray:
        idx = jnp.asarray(indices)
        lo = jnp.asarray(self.lo, dtype=jnp.float32)
        res = jnp.asarray(self.res, dtype=jnp.float32)
        return lo + idx.astype(jnp.float32) * res

    def ravel_multi_index(self, keys, shape=None) -> jnp.ndarray:
        strides = jnp.asarray(self._strides, dtype=jnp.int32)
        return jnp.sum(keys * strides, axis=-1)

    def get_valid_values(self, pts) -> jnp.ndarray:
        """In-range mask by nearest-index membership."""
        keys = self.ensure_index_key(pts)
        n = jnp.asarray(self.shape, dtype=jnp.int32)
        return jnp.all((keys >= 0) & (keys < n), axis=-1)

    # -- access ---------------------------------------------------------------
    def __getitem__(self, pts):
        pts = as_float_array(pts)
        keys = self.ensure_index_key(pts)
        valid = jnp.all((keys >= 0) & (keys < jnp.asarray(self.shape, dtype=jnp.int32)),
                        axis=-1)
        flat = self.ravel_multi_index(jnp.clip(
            keys, 0, jnp.asarray(self.shape, dtype=jnp.int32) - 1))
        vals = self.raw_data.reshape(-1)[flat]
        if callable(self.invalid_value):
            fallback = self.invalid_value(pts)
            fallback = jnp.asarray(fallback).reshape(vals.shape).astype(vals.dtype)
        else:
            fallback = jnp.asarray(self.invalid_value, dtype=vals.dtype)
        return jnp.where(valid, vals, fallback)

    def __setitem__(self, pts, value):
        pts = as_float_array(pts)
        keys = self.ensure_index_key(pts)
        value = jnp.broadcast_to(jnp.asarray(value, dtype=self.raw_data.dtype),
                                 keys.shape[:-1])
        # mode="drop" only discards POSITIVE out-of-range indices: JAX
        # normalizes negative scatter indices with mod first, which would
        # wrap a below-range write onto the far edge.  Redirect every
        # invalid key to shape (positive OOB) so the drop actually drops.
        n = jnp.asarray(self.shape, dtype=keys.dtype)
        valid = jnp.all((keys >= 0) & (keys < n), axis=-1)
        keys = jnp.where(valid[..., None], keys, n)
        idx = tuple(keys[..., i] for i in range(keys.shape[-1]))
        self.raw_data = self.raw_data.at[idx].set(value, mode="drop")


# ---------------------------------------------------------------------------
# Voxel containers (reference voxel.py:28-131)
# ---------------------------------------------------------------------------

class Voxels(abc.ABC):
    @abc.abstractmethod
    def get_known_pos_and_values(self):
        """Return the position (N x d) and values (N) of known voxels."""

    @abc.abstractmethod
    def __getitem__(self, pts):
        """Return the values (N) at the positions (N x d)."""

    @abc.abstractmethod
    def __setitem__(self, pts, value):
        """Set the values (N) at the positions (N x d)."""


class VoxelGrid(Voxels):
    """Dense grid with an ``invalid_val = 0`` "unknown" sentinel
    (reference voxel.py:42-91)."""

    def __init__(self, resolution: float, range_per_dim, dtype=jnp.float32,
                 device=None):
        self.resolution = float(resolution)
        self.invalid_val = 0
        self.dtype = dtype
        self.device = device
        self._create_voxels(self.resolution, range_per_dim)

    def _create_voxels(self, resolution, range_per_dim):
        self.range_per_dim = get_divisible_range_by_resolution(resolution, range_per_dim)
        self.coords, self.pts = get_coordinates_and_points_in_grid(
            resolution, self.range_per_dim, dtype=jnp.float32)
        shape = [len(c) for c in self.coords]
        self._data = jnp.zeros(shape, dtype=self.dtype)
        self.voxels = GridView(self._data, self.range_per_dim,
                               invalid_value=self.invalid_val)
        self.range_per_dim = np.array(self.range_per_dim)

    def get_known_pos_and_values(self):
        data = np.asarray(self.voxels.raw_data)
        known = data != self.invalid_val
        indices = np.argwhere(known)
        pos = self.voxels.ensure_value_key(jnp.asarray(indices))
        val = jnp.asarray(data[known])
        return pos, val

    def resize_to_fit(self):
        known_pos, known_val = self.get_known_pos_and_values()
        if known_pos.size == 0:
            return
        mins = np.asarray(known_pos.min(axis=0))
        maxs = np.asarray(known_pos.max(axis=0))
        rng = [(mins[i] - self.resolution, maxs[i] + self.resolution)
               for i in range(len(mins))]
        self._create_voxels(self.resolution, rng)
        self[known_pos] = known_val

    def get_voxel_values(self):
        return self.voxels.raw_data

    def get_voxel_center_points(self):
        return self.pts

    def __getitem__(self, pts):
        return self.voxels[pts]

    def __setitem__(self, pts, value):
        self.voxels[pts] = value
        self._data = self.voxels.raw_data


class ExpandingVoxelGrid(VoxelGrid):
    """Grows its range in whole-resolution increments to cover writes
    (reference voxel.py:94-115).  Regrowth is host-side; a regrow changes the
    array shape and therefore re-jits downstream consumers."""

    def __setitem__(self, pts, value):
        pts = as_float_array(pts)
        if pts.size > 0:
            flat = np.asarray(pts.reshape(-1, pts.shape[-1]))
            cur = np.asarray(self.range_per_dim, dtype=np.float64)
            # grow each bound outward in whole-resolution steps until every
            # written point fits (vectorized over dims; zero overshoot keeps
            # the bound exactly where it is)
            overshoot = np.maximum(
                np.stack([cur[:, 0] - flat.min(axis=0),
                          flat.max(axis=0) - cur[:, 1]], axis=1), 0.0)
            steps = np.ceil(overshoot / self.resolution)
            grown = cur + steps * self.resolution * np.array([-1.0, 1.0])
            if not np.allclose(grown, cur):
                keep_pos, keep_vals = self.get_known_pos_and_values()
                self._create_voxels(self.resolution, grown)
                super().__setitem__(keep_pos, keep_vals)
        return super().__setitem__(pts, value)


class VoxelSet(Voxels):
    """Sparse append-only (positions, values) store (reference voxel.py:118-131)."""

    def __init__(self, positions, values):
        self.positions = as_float_array(positions)
        self.values = jnp.asarray(values)

    def __getitem__(self, pts):
        raise RuntimeError("Cannot get arbitrary points on a voxel set")

    def __setitem__(self, pts, value):
        pts = as_float_array(pts).reshape(-1, self.positions.shape[-1])
        self.positions = jnp.concatenate((self.positions, pts), axis=0)
        self.values = jnp.concatenate((self.values, jnp.atleast_1d(jnp.asarray(value))))

    def get_known_pos_and_values(self):
        return self.positions, self.values


def bounds_contain_another_bounds(outer_bounds, inner_bounds) -> bool:
    outer_bounds = np.asarray(outer_bounds)
    inner_bounds = np.asarray(inner_bounds)
    return bool(np.all(outer_bounds[:, 0] <= inner_bounds[:, 0])
                and np.all(outer_bounds[:, 1] >= inner_bounds[:, 1]))


def voxel_down_sample(points, resolution: float, range_per_dim=None,
                      ignore_flat_dim: bool = False):
    """Down-sample a point cloud to occupied voxel centers — fully parallel
    scatter instead of open3d's per-point loop (reference voxel.py:139-171).
    Output size is data-dependent, so this is a host-facing (non-jit) op."""
    points = as_float_array(points)
    if points.shape[0] == 0:
        return points
    pts_np = np.asarray(points)
    padded = np.stack((pts_np.min(axis=0) - 2 * resolution,
                       pts_np.max(axis=0) + 2 * resolution)).T
    if range_per_dim is None or bounds_contain_another_bounds(range_per_dim,
                                                              padded):
        range_per_dim = padded
    bounds = np.asarray(range_per_dim, dtype=np.float64)

    # a degenerate trailing dimension (min == max) cannot be voxelized: drop
    # it for the scatter and splice the constant coordinate back afterwards
    squeeze_last = ignore_flat_dim and bounds[-1, 0] == bounds[-1, 1]
    if squeeze_last:
        const_last = bounds[-1, 0]
        bounds, points = bounds[:-1], points[..., :-1]

    occupancy = VoxelGrid(resolution, bounds, dtype=jnp.bool_)
    occupancy[points] = True
    centers, _ = occupancy.get_known_pos_and_values()

    if squeeze_last:
        tail = jnp.full((centers.shape[0], 1), const_last, dtype=centers.dtype)
        centers = jnp.concatenate((centers, tail), axis=-1)
    return centers
