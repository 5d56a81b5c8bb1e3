"""Triangle-sharded mesh SDF: shard the triangle array across devices.

For meshes too large to replicate (or to scale a single heavy query), the
triangle sweep is data-parallel over triangles: each device sweeps its
triangle shard, keeping a local (min-distance, closest point, face id) and a
partial winding sum; the union is a ``psum``/``all_gather`` epilogue over ICI
(the associative-min analog of ring attention's blockwise streaming —
SURVEY §5).  Query points are replicated; the result is identical to the
single-device sweep.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_volumetric_tpu import mesh as mesh_mod
from pytorch_volumetric_tpu import sdf as sdf_mod
from pytorch_volumetric_tpu.ops.point_triangle import mesh_closest_query
from pytorch_volumetric_tpu.utils.batching import cdiv


class TriangleShardedMeshSDF(sdf_mod.ObjectFrameSDF):
    """Exact mesh SDF with triangles sharded over a 1D device mesh axis.

    Drop-in ``ObjectFrameSDF``: same contract as :class:`sdf.MeshSDF`
    (reference sdf.py:302-329), scaled over devices.
    """

    def __init__(self, obj_factory: sdf_mod.ObjectFactory, device_mesh: Mesh,
                 axis: str = None, point_axis: str = None):
        """``axis``: mesh axis the triangles shard over (default: the first).
        ``point_axis``: optional second mesh axis to ALSO shard the query
        points over (2D mesh = point-data-parallel x triangle-sharded — the
        full scaling layout; point count must divide evenly).  With a 1D mesh
        points are replicated."""
        self.obj_factory = obj_factory
        self.device_mesh = device_mesh
        self.axis = axis if axis is not None else device_mesh.axis_names[0]
        self.point_axis = point_axis
        n_shards = device_mesh.shape[self.axis]
        extra = [a for a in device_mesh.axis_names if a != self.axis]
        if extra != ([] if point_axis is None else [point_axis]):
            raise ValueError(
                f"mesh axes {device_mesh.axis_names} with triangle axis "
                f"{self.axis!r}: point_axis must name exactly the remaining "
                f"axis (got point_axis={point_axis!r})")

        scene = obj_factory.scene
        Fp = scene.padded_faces
        # pad the triangle array so every shard is a multiple of 128
        shard = cdiv(Fp, n_shards * 128) * 128
        total = shard * n_shards
        tri = np.asarray(scene.tri)
        normals = np.asarray(scene.normals)
        if total != Fp:
            tri = np.concatenate([tri, np.full((total - Fp, 3, 3),
                                               mesh_mod.PAD_COORD, np.float32)])
            normals = np.concatenate([normals,
                                      np.zeros((total - Fp, 3), np.float32)])
        tri_sharding = NamedSharding(device_mesh, P(self.axis))
        self.tri = jax.device_put(jnp.asarray(tri), tri_sharding)
        self.normals = jax.device_put(jnp.asarray(normals), tri_sharding)
        self.shard_size = shard
        self.surface_normal_eps = obj_factory.surface_normal_eps
        self.winding_threshold = obj_factory.winding_threshold

        axis_name = self.axis
        eps = self.surface_normal_eps
        thr = self.winding_threshold
        # with a point axis, each device row sweeps its point shard against
        # its triangle shard; collectives reduce over the triangle axis only,
        # so the point axis stays embarrassingly parallel
        pspec = P(point_axis) if point_axis else P()

        @functools.partial(
            jax.shard_map, mesh=device_mesh,
            in_specs=(pspec, P(axis_name), P(axis_name)),
            out_specs=(pspec, pspec, pspec, pspec))
        def sharded(pts, tri_local, normals_local):
            dist, cp, fid, wind = mesh_closest_query(pts, tri_local)
            wind = lax.psum(wind, axis_name)
            d_global = lax.pmin(dist, axis_name)
            me = lax.axis_index(axis_name)
            n_dev = lax.axis_size(axis_name)
            # break exact-distance ties to the lowest device id
            cand = jnp.where(dist <= d_global, me, n_dev)
            best_dev = lax.pmin(cand, axis_name)
            is_winner = best_dev == me
            cp_g = lax.psum(jnp.where(is_winner[:, None], cp, 0.0), axis_name)
            normal_local = normals_local[fid]
            n_g = lax.psum(jnp.where(is_winner[:, None], normal_local, 0.0),
                           axis_name)
            return d_global, cp_g, n_g, wind

        def raw(pts):
            dist, closest, face_n, wind = sharded(pts, self.tri, self.normals)
            # |winding| to match MeshSDF / signed_closest_query: an
            # inward-wound mesh has winding -1 inside and must still
            # classify as inside (reference sign semantics sdf.py:147-157);
            # the factory's winding_threshold knob applies here too
            inside = jnp.abs(wind) > thr
            sign = jnp.where(inside, -1.0, 1.0).astype(pts.dtype)
            sdf_val = sign * dist
            away = pts - closest
            grad = sign[..., None] * away / jnp.maximum(dist, 1e-12)[..., None]
            grad = jnp.where((dist < eps)[..., None], face_n, grad)
            return sdf_val, grad

        self._raw = sdf_mod._straight_through_sdf(raw)
        self._sharded = sharded

    def raw_query(self, points):
        return self._raw(points)

    def full_query(self, points):
        """(dist, closest, normal_at_closest, winding) — the SDFQuery pieces."""
        return self._sharded(points, self.tri, self.normals)

    def surface_bounding_box(self, padding=0.0, padding_ratio=0.0):
        return jnp.asarray(self.obj_factory.bounding_box(padding, padding_ratio))
