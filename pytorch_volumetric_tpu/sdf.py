"""Object-frame signed distance fields (the central abstraction).

TPU-native re-implementation of the reference's ``sdf.py``: the
``ObjectFrameSDF`` protocol ``pts [.., N, 3] -> (val [.., N], grad [.., N, 3])``
(reference sdf.py:217-246) with concrete ``SphereSDF``, ``MeshSDF``,
``ComposedSDF`` and ``CachedSDF`` implementations.

Key departures from the reference, driven by the TPU/XLA model:

- Mesh queries run a brute-force Pallas/XLA triangle sweep
  (``ops.point_triangle``) instead of Open3D's C++ BVH; the inside/outside
  sign comes from a deterministic generalized winding number instead of
  jittered ray parity (reference sdf.py:147-154).
- Every SDF exposes a pure ``raw_query(pts [P, 3])`` traceable function, so
  compositions (``ComposedSDF``, ``RobotSDF``) jit into a single fused XLA
  program; ``__call__`` wraps it with batch flattening and per-instance jit.
- Values are differentiable w.r.t. query points (and hence object poses and
  joint angles via the chain rule) through ``jax.custom_vjp`` using the
  analytic SDF gradient.
- Disk caches are ``.npz`` (no pickles of device arrays).
"""

from __future__ import annotations

import abc
import enum
import functools
import logging
import math
import os
from functools import partial
from typing import Callable, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_volumetric_tpu import mesh as mesh_mod
from pytorch_volumetric_tpu import transforms as tfm
from pytorch_volumetric_tpu.ops.point_triangle import signed_closest_query
from pytorch_volumetric_tpu.utils.batching import as_float_array
from pytorch_volumetric_tpu.utils.cache import get_store
from pytorch_volumetric_tpu.voxel import (
    GridView, VoxelGrid, get_coherent_tile_points,
    get_coordinates_and_points_in_grid, get_divisible_range_by_resolution,
)

logger = logging.getLogger(__name__)


class SDFQuery(NamedTuple):
    closest: jnp.ndarray
    distance: jnp.ndarray
    gradient: jnp.ndarray
    normal: Union[jnp.ndarray, None]


# ---------------------------------------------------------------------------
# Object factories (mesh loading/framing; reference sdf.py:30-214)
# ---------------------------------------------------------------------------

class ObjectFactory(abc.ABC):
    """Loads and frames a triangle mesh and answers closest-point queries.

    Mirrors reference sdf.py:30-189 with the Open3D raycasting scene replaced
    by a :class:`mesh.MeshScene` of padded device triangle arrays.
    """

    def __init__(self, name="", scale=1.0, vis_frame_pos=(0, 0, 0),
                 vis_frame_rot=(0, 0, 0, 1), plausible_suboptimality=0.001,
                 mesh: Optional[mesh_mod.TriangleMesh] = None,
                 surface_normal_eps: float = 1e-3,
                 winding_threshold: float = 0.5,
                 weld_tolerance: Optional[float] = None, **kwargs):
        self.name = name
        self.scale = scale if scale is not None else 1.0
        # frame from the mesh's own frame to the object (simulation) frame
        self.vis_frame_pos = vis_frame_pos
        self.vis_frame_rot = vis_frame_rot
        self.other_load_kwargs = kwargs
        self.plausible_suboptimality = plausible_suboptimality
        self.surface_normal_eps = surface_normal_eps
        # inside ⇔ |generalized winding number| > winding_threshold.  For
        # watertight meshes the winding is ~0/±1 and 0.5 is robust.  For OPEN
        # (non-watertight) meshes the winding varies continuously: points near
        # the hole see values near ±0.5 and classification becomes geometry-
        # dependent — the same regime where the reference's jittered ray
        # parity (sdf.py:147-154) is stochastic.  Lower the threshold to
        # classify more space "inside" an open shell, raise it for less.
        self.winding_threshold = winding_threshold
        # merge vertices within this distance at load: triangle soups and
        # unwelded exports then present closed connectivity to the winding.
        # UNITS: on the file-load path welding runs before scale/vis-frame
        # framing (file units); for a directly passed `mesh` (already in
        # object units by definition) the tolerance applies as-is — divide
        # by `scale` yourself if you want file-unit semantics there
        self.weld_tolerance = weld_tolerance

        if mesh is not None and weld_tolerance is not None:
            # welding otherwise happens inside read_triangle_mesh on the
            # file-load path; honor the knob for directly-passed meshes too
            # (idempotent on already-welded input)
            mesh = mesh_mod.weld_vertices(mesh, weld_tolerance)
        self._mesh = mesh
        self._mesh_was_given = mesh is not None
        self._scene: Optional[mesh_mod.MeshScene] = None
        self._query_fn = None
        self.precompute_sdf()

    def _reduce_kwargs(self):
        kw = dict(scale=self.scale,
                  vis_frame_pos=self.vis_frame_pos,
                  vis_frame_rot=self.vis_frame_rot,
                  plausible_suboptimality=self.plausible_suboptimality,
                  surface_normal_eps=self.surface_normal_eps,
                  winding_threshold=self.winding_threshold,
                  weld_tolerance=self.weld_tolerance,
                  **self.other_load_kwargs)
        if getattr(self, "_mesh_was_given", False):
            # an in-memory mesh has no file to reload from; ship it along
            # (host numpy dataclass — pickles fine)
            kw["mesh"] = self._mesh
        return kw

    def __reduce__(self):
        return partial(self.__class__, **self._reduce_kwargs()), (self.name,)

    def make_collision_obj(self, z, rgba=None):
        return None, None

    @abc.abstractmethod
    def get_mesh_resource_filename(self) -> str:
        """Path to the mesh resource file (.obj, .stl, ...)."""

    def get_mesh_high_poly_resource_filename(self) -> str:
        return self.get_mesh_resource_filename()

    def draw_mesh(self, dd, name, pose, rgba, object_id=None):
        frame_pos = np.array(self.vis_frame_pos) * self.scale
        return dd.draw_mesh(name, self.get_mesh_resource_filename(), pose,
                            scale=self.scale, rgba=rgba, object_id=object_id,
                            vis_frame_pos=frame_pos, vis_frame_rot=self.vis_frame_rot)

    def precompute_sdf(self):
        """Load + frame the mesh (scale, vis-frame rotate about origin,
        translate by scaled vis-frame position; reference sdf.py:97-120) and
        pack device triangle data."""
        if self._mesh is None:
            full_path = os.path.expanduser(self.get_mesh_high_poly_resource_filename())
            if not os.path.exists(full_path):
                raise RuntimeError(f"Expected mesh file does not exist: {full_path}")
            m = mesh_mod.read_triangle_mesh(full_path,
                                            weld_tolerance=self.weld_tolerance)
            m = m.scale(self.scale)
            R = np.asarray(tfm.quaternion_xyzw_to_matrix(
                np.asarray(self.vis_frame_rot, dtype=np.float32)))
            m = m.rotate(R, center=[0, 0, 0])
            m = m.translate(np.asarray(self.vis_frame_pos) * self.scale)
            self._mesh = m
        if self._scene is None:
            self._scene = mesh_mod.MeshScene.from_mesh(self._mesh)
            eps = self.surface_normal_eps
            thr = self.winding_threshold
            tri, normals = self._scene.tri, self._scene.normals

            def raw(pts):
                return signed_closest_query(pts, tri, normals,
                                            surface_normal_eps=eps,
                                            winding_threshold=thr)

            self._query_fn = jax.jit(raw)

    def bounding_box(self, padding=0.0, padding_ratio=0.0) -> np.ndarray:
        """[3, 2] AABB of the framed mesh with padding (reference sdf.py:80-89)."""
        return pad_aabb(self._mesh.aabb(), padding, padding_ratio)

    def center(self) -> np.ndarray:
        if self._mesh is None:
            self.precompute_sdf()
        return self._mesh.center()

    @property
    def scene(self) -> mesh_mod.MeshScene:
        return self._scene

    def object_frame_closest_point(self, points_in_object_frame,
                                   compute_normal=False) -> SDFQuery:
        """Batched closest point / signed distance / SDF gradient / normal
        (reference sdf.py:122-189).  Input ``[.., N, 3]``; leading dims are
        preserved on all outputs."""
        pts = as_float_array(points_in_object_frame)
        flat = pts.reshape(-1, pts.shape[-1])
        closest, dist, grad, normal = self._query_fn(flat)
        batch = pts.shape[:-1]
        closest = closest.reshape(batch + (3,))
        dist = dist.reshape(batch)
        grad = grad.reshape(batch + (3,))
        normal = normal.reshape(batch + (3,)) if compute_normal else None
        return SDFQuery(closest, dist, grad, normal)


class MeshObjectFactory(ObjectFactory):
    """Mesh from a file path with optional prefix joining and ``package://``
    stripping (reference sdf.py:192-214)."""

    def __init__(self, mesh_name="", path_prefix="", **kwargs):
        self.path_prefix = path_prefix
        self.strip_package_prefix = path_prefix != ""
        super().__init__(mesh_name, **kwargs)

    def __reduce__(self):
        return partial(self.__class__, path_prefix=self.path_prefix,
                       **self._reduce_kwargs()), (self.name,)

    def get_mesh_resource_filename(self) -> str:
        mesh_path = self.name
        if self.strip_package_prefix:
            mesh_path = mesh_path.replace("package://", "")
        return os.path.join(self.path_prefix, mesh_path)


def pad_aabb(aabb, padding=0.0, padding_ratio=0.0) -> np.ndarray:
    """[3, 2] AABB expanded by ``padding`` (absolute) plus ``padding_ratio``
    of each extent — the one padding rule shared by every
    ``surface_bounding_box`` (reference sdf.py:80-89)."""
    bb = np.array(aabb, dtype=np.float64, copy=True)
    extents = bb[:, 1] - bb[:, 0]
    bb[:, 0] -= padding + padding_ratio * extents
    bb[:, 1] += padding + padding_ratio * extents
    return bb


def aabb_corners(aabb) -> jnp.ndarray:
    """[3, 2] AABB -> its 8 corner points [8, 3]."""
    bb = jnp.asarray(aabb)
    lo, hi = bb[:, 0], bb[:, 1]
    sel = jnp.asarray([[(c >> d) & 1 for d in range(3)] for c in range(8)],
                      dtype=bb.dtype)
    return lo + sel * (hi - lo)


# ---------------------------------------------------------------------------
# SDF protocol
# ---------------------------------------------------------------------------

class ObjectFrameSDF(abc.ABC):
    """SDF protocol: ``pts [.., N, d] -> (val [.., N], grad [.., N, d])``
    (reference sdf.py:217-282).  Subclasses implement the pure traceable
    :meth:`raw_query`; ``__call__`` adds input coercion, batch flattening and
    per-instance jit."""

    _jit_cache = None

    @abc.abstractmethod
    def raw_query(self, points: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pure function on flat points ``[P, d]`` -> ``(val [P], grad [P, d])``.
        Must be traceable (jit/vmap/grad-safe)."""

    @abc.abstractmethod
    def surface_bounding_box(self, padding=0.0, padding_ratio=0.0):
        """(min, max) per dimension of the 0-level set."""

    def _jitted(self):
        if self._jit_cache is None:
            self._jit_cache = jax.jit(self.raw_query)
        return self._jit_cache

    # -- large-table threading (see ComposedSDF.__call__) -------------------
    def raw_query_aux(self):
        """Pytree of big per-instance tables that should ride into compiled
        programs as ARGUMENTS rather than captured closure constants
        (measured on TPU: a 200 MB captured constant costs ~60 s per
        retrace vs ~10 s arg-style).  Default: nothing to thread."""
        return None

    def raw_query_with(self, aux, points):
        """``raw_query`` with :meth:`raw_query_aux`'s pytree passed back in
        explicitly.  Default implementation ignores ``aux``."""
        return self.raw_query(points)

    def __call__(self, points_in_object_frame):
        pts = as_float_array(points_in_object_frame)
        batch = pts.shape[:-1]
        flat = pts.reshape(-1, pts.shape[-1])
        val, grad = self._jitted()(flat)
        return val.reshape(batch), grad.reshape(batch + pts.shape[-1:])

    def outside_surface(self, points_in_object_frame, surface_level=0):
        """B x N bool; separate so implementations can specialize
        (reference sdf.py:236-246)."""
        sdf_values, _ = self(points_in_object_frame)
        return sdf_values > surface_level

    def get_voxel_view(self, voxels: Optional[VoxelGrid] = None, dtype=jnp.float32,
                       device=None) -> GridView:
        """Rasterize this SDF onto a voxel grid; out-of-grid queries fall back
        to evaluating the SDF itself (reference sdf.py:248-264)."""
        if voxels is None:
            bb = np.asarray(self.surface_bounding_box(padding=0.1))
            voxels = VoxelGrid(0.01, bb, dtype=dtype)
        pts = voxels.get_voxel_center_points()
        sdf_val, _ = self(pts)
        shape = [len(c) for c in voxels.coords]
        return GridView(sdf_val.reshape(shape), voxels.range_per_dim,
                        invalid_value=lambda p: self(p)[0])

    def get_filtered_points(self, unary_filter, voxels: Optional[VoxelGrid] = None,
                            dtype=jnp.float32, device=None) -> jnp.ndarray:
        """Voxel-center points whose SDF value passes ``unary_filter``
        (reference sdf.py:266-282).  Output size is data-dependent, so this is
        a host-facing (non-jit) op."""
        view = self.get_voxel_view(voxels, dtype=dtype)
        interior = np.asarray(unary_filter(view.raw_data))
        indices = np.argwhere(interior)
        return view.ensure_value_key(jnp.asarray(indices))


class SphereSDF(ObjectFrameSDF):
    """Analytic sphere at the origin (reference sdf.py:285-299)."""

    def __init__(self, radius: float):
        self.radius = radius

    def raw_query(self, points):
        dist_to_origin = jnp.linalg.norm(points, axis=-1)
        dist = dist_to_origin - self.radius
        grad = points / (dist_to_origin[..., None] + 1e-12)
        return dist, grad

    def surface_bounding_box(self, padding=0.0, padding_ratio=0.0):
        length = self.radius + padding + padding_ratio * self.radius
        return jnp.asarray([[-length, length]] * 3)


class BoxSDF(ObjectFrameSDF):
    """Analytic axis-aligned box centered at the origin.  The reference skips
    non-mesh link visuals entirely (model_to_sdf.py:56); we support them as
    analytic primitives — exact, differentiable, and far cheaper than meshes."""

    def __init__(self, size):
        self.size = jnp.asarray(size, dtype=jnp.float32)  # full extents [3]

    def raw_query(self, points):
        half = self.size / 2.0
        q = jnp.abs(points) - half
        q_out = jnp.maximum(q, 0.0)
        d_out = jnp.linalg.norm(q_out, axis=-1)
        q_in = jnp.max(q, axis=-1)
        d_in = jnp.minimum(q_in, 0.0)
        dist = d_out + d_in
        # gradient: outside -> normalized residual; inside -> axis of the
        # closest face
        sign = jnp.sign(points)
        sign = jnp.where(sign == 0, 1.0, sign)
        grad_out = sign * q_out / jnp.maximum(d_out, 1e-12)[..., None]
        inside_axis = jnp.argmax(q, axis=-1)
        grad_in = sign * jax.nn.one_hot(inside_axis, 3, dtype=points.dtype)
        grad = jnp.where((d_out > 0)[..., None], grad_out, grad_in)
        return dist, grad

    def surface_bounding_box(self, padding=0.0, padding_ratio=0.0):
        half = np.asarray(self.size) / 2.0
        pad = padding + padding_ratio * 2 * half
        return jnp.asarray(np.stack([-half - pad, half + pad], axis=1))


class CylinderSDF(ObjectFrameSDF):
    """Analytic capped cylinder along z, centered at the origin (URDF
    convention)."""

    def __init__(self, radius: float, height: float):
        self.radius = radius
        self.height = height

    def raw_query(self, points):
        r = jnp.linalg.norm(points[..., :2], axis=-1)
        dr = r - self.radius
        dz = jnp.abs(points[..., 2]) - self.height / 2.0
        out_r = jnp.maximum(dr, 0.0)
        out_z = jnp.maximum(dz, 0.0)
        d_out = jnp.sqrt(out_r ** 2 + out_z ** 2)
        d_in = jnp.minimum(jnp.maximum(dr, dz), 0.0)
        dist = d_out + d_in
        # gradient
        radial = points[..., :2] / jnp.maximum(r, 1e-12)[..., None]
        zsign = jnp.sign(points[..., 2])
        zsign = jnp.where(zsign == 0, 1.0, zsign)
        # outside: combine radial/axial residuals; inside: nearest face normal
        gr = out_r / jnp.maximum(d_out, 1e-12)
        gz = out_z / jnp.maximum(d_out, 1e-12) * zsign
        grad_out = jnp.concatenate([radial * gr[..., None], gz[..., None]], axis=-1)
        grad_in_radial = jnp.concatenate(
            [radial, jnp.zeros_like(points[..., :1])], axis=-1)
        grad_in_axial = jnp.concatenate(
            [jnp.zeros_like(points[..., :2]), zsign[..., None]], axis=-1)
        grad_in = jnp.where((dr > dz)[..., None], grad_in_radial, grad_in_axial)
        grad = jnp.where((d_out > 0)[..., None], grad_out, grad_in)
        return dist, grad

    def surface_bounding_box(self, padding=0.0, padding_ratio=0.0):
        r = self.radius + padding + padding_ratio * 2 * self.radius
        h = self.height / 2.0 + padding + padding_ratio * self.height
        return jnp.asarray([[-r, r], [-r, r], [-h, h]])


class CapsuleSDF(ObjectFrameSDF):
    """Analytic capsule along z (cylinder of ``height`` with hemispherical
    caps), centered at the origin — exact and smooth everywhere."""

    def __init__(self, radius: float, height: float):
        self.radius = radius
        self.height = height

    def raw_query(self, points):
        half = self.height / 2.0
        z = jnp.clip(points[..., 2], -half, half)
        axis_pt = jnp.concatenate(
            [jnp.zeros_like(points[..., :2]), z[..., None]], axis=-1)
        diff = points - axis_pt
        d_axis = jnp.linalg.norm(diff, axis=-1)
        dist = d_axis - self.radius
        grad = diff / jnp.maximum(d_axis, 1e-12)[..., None]
        # on-axis points: gradient defaults to +x (any direction is valid)
        degenerate = d_axis < 1e-12
        grad = jnp.where(degenerate[..., None],
                         jnp.asarray([1.0, 0.0, 0.0], dtype=points.dtype), grad)
        return dist, grad

    def surface_bounding_box(self, padding=0.0, padding_ratio=0.0):
        r = self.radius + padding + padding_ratio * 2 * self.radius
        h = (self.height / 2.0 + self.radius + padding
             + padding_ratio * (self.height + 2 * self.radius))
        return jnp.asarray([[-r, r], [-r, r], [-h, h]])


def _straight_through_sdf(raw_fn: Callable, aux_specs=()) -> Callable:
    """Wrap ``(*aux, pts) -> (val, grad)`` with a custom VJP whose
    derivative of the value w.r.t. the points is the analytic gradient
    itself.  This is what makes pose/joint-angle gradients flow through
    transforms and FK by the chain rule.  (Second derivatives of the
    gradient output are treated as zero.)

    ``aux_specs``: ``((shape, dtype), ...)`` for leading table arguments
    that receive ZERO cotangents (data, not parameters) — used by the
    aux-threaded paths so big tables ride as program inputs instead of
    captured constants."""
    f = jax.custom_vjp(raw_fn)

    def fwd(*args):
        val, grad = raw_fn(*args)
        return (val, grad), grad

    def bwd(residual_grad, cotangents):
        ct_val, _ct_grad = cotangents
        zeros = tuple(jnp.zeros(s, d) for s, d in aux_specs)
        return (*zeros, ct_val[..., None] * residual_grad)

    f.defvjp(fwd, bwd)
    return f


class MeshSDF(ObjectFrameSDF):
    """Exact SDF from the triangle sweep (reference sdf.py:302-329)."""

    def __init__(self, obj_factory: ObjectFactory, vis=None):
        self.obj_factory = obj_factory
        self.vis = vis
        scene = obj_factory.scene
        tri, normals = scene.tri, scene.normals
        eps = obj_factory.surface_normal_eps
        thr = getattr(obj_factory, "winding_threshold", 0.5)

        def raw(pts):
            _, val, grad, _ = signed_closest_query(pts, tri, normals,
                                                   surface_normal_eps=eps,
                                                   winding_threshold=thr)
            return val, grad

        self._raw = _straight_through_sdf(raw)

    def raw_query(self, points):
        return self._raw(points)

    def surface_bounding_box(self, padding=0.0, padding_ratio=0.0):
        return jnp.asarray(self.obj_factory.bounding_box(padding, padding_ratio))


# ---------------------------------------------------------------------------
# Composition (min-union over posed children; reference sdf.py:332-433)
# ---------------------------------------------------------------------------

def compose_query(child_raw_queries: Tuple[Callable, ...],
                  obj_to_link: jnp.ndarray, link_to_obj: jnp.ndarray,
                  batch: int, points: jnp.ndarray):
    """Pure min-union query over ``S`` posed child SDFs.

    ``obj_to_link``/``link_to_obj``: ``[S*B, 4, 4]`` link-major flattened
    transforms (child ``i`` owns rows ``[i*B, (i+1)*B)``, the reference's
    ``ith_transform_slice`` contract at sdf.py:385-390).  ``points``: ``[F, d]``
    in the shared object frame.  Returns ``(val [B, F], grad [B, F, d])``.

    The per-child Python loop is a trace-time loop: XLA sees one fused program
    with all children inlined; children with identical shapes could be vmapped
    but are typically heterogeneous meshes.
    """
    S = len(child_raw_queries)
    F = points.shape[0]
    # transform points into every child/batch frame at once: [S*B, F, 3]
    pts_all = tfm.transform_points(obj_to_link, points)
    pts_all = pts_all.reshape(S, batch, F, 3)
    R_back = link_to_obj.reshape(S, batch, 4, 4)[..., :3, :3]

    # incremental min-union: carry the running (best value, best gradient)
    # instead of stacking [S, ...] and argmin-gathering afterwards — fewer
    # materialized intermediates, and XLA fuses the elementwise select chains
    # between the per-child gathers
    best_v = None
    best_g = None
    for i, raw in enumerate(child_raw_queries):
        v, g = raw(pts_all[i].reshape(batch * F, 3))
        v = v.reshape(batch, F)
        g = g.reshape(batch, F, 3)
        # rotate gradients back into the object frame (rigid: R == inv-transpose)
        g = tfm.rotate_vectors(R_back[i], g)
        if best_v is None:
            best_v, best_g = v, g
        else:
            better = v < best_v
            best_v = jnp.where(better, v, best_v)
            best_g = jnp.where(better[..., None], g, best_g)
    return best_v, best_g


class NarrowBandMeshSDF(ObjectFrameSDF):
    """Large-mesh SDF: exact within ``band`` of the surface via per-cell
    candidate lists, first-order-corrected voxel far field beyond it
    (``ops.narrow_band``).

    The brute-force sweep behind :class:`MeshSDF` is compute-bound at
    ``points x faces`` pairs; this drops the per-point cost to one wide
    gather + ``K`` candidate evaluations, independent of the face count —
    the TPU answer to the reference's Open3D BVH on million-triangle meshes.
    Signs come from angle-weighted pseudonormals (exact for watertight
    manifold meshes; use :class:`MeshSDF`'s winding numbers for soups).
    Requires the native host runtime for the build.

    :param band: half-width of the exact shell around the surface.  Defaults
        to ``4 * cell_res``.
    :param cell_res: cell size; defaults to ``aabb diagonal / 96``.
    :param padding: grid margin beyond the mesh AABB; queries outside the
        grid fall back to the AABB distance under-approximation.
    """

    def __init__(self, obj_factory: ObjectFactory, cell_res: Optional[float] = None,
                 band: Optional[float] = None, padding: float = 0.1,
                 max_k: int = 256, cache_path: Optional[str] = None):
        from pytorch_volumetric_tpu.ops.narrow_band import (
            build_narrow_band_tables)

        self.obj_factory = obj_factory
        obj_factory.precompute_sdf()
        m = obj_factory._mesh
        if cell_res is None:
            aabb = m.aabb()
            cell_res = float(np.linalg.norm(aabb[:, 1] - aabb[:, 0])) / 96.0
        if band is None:
            band = 4.0 * cell_res
        self.cell_res = cell_res
        self.band = band
        self.tables = build_narrow_band_tables(m, cell_res, band,
                                               padding=padding, max_k=max_k,
                                               cache_path=cache_path)
        self._eps = jnp.float32(obj_factory.surface_normal_eps)
        # the query closes over the TINY grid fields as trace-time constants
        # (exactness: see ops.narrow_band.NarrowBandSmalls) and takes the big
        # tables as explicit arguments — threadable through jits with zero
        # cotangents, never captured as multi-GB program constants
        from pytorch_volumetric_tpu.ops.narrow_band import (
            make_straight_through_query)
        self._st_query = make_straight_through_query(self.tables.smalls)

    def raw_query(self, points):
        return self._st_query(self.tables.big, points, self._eps)

    def raw_query_aux(self):
        return self.tables.big

    def raw_query_with(self, aux, points):
        return self._st_query(aux, points, self._eps)

    def _jitted(self):
        # jit with the (potentially multi-GB) tables as arguments, not as
        # captured compile-time constants
        if self._jit_cache is None:
            self._jit_cache = jax.jit(self._st_query)
        return lambda pts: self._jit_cache(self.tables.big, pts, self._eps)

    def surface_bounding_box(self, padding=0.0, padding_ratio=0.0):
        return jnp.asarray(self.obj_factory.bounding_box(padding, padding_ratio))


# -- coherent (segmented brick-gather) union query ---------------------------
#
# XLA gathers on TPU have two regimes (both measured on v5e): NARROW rows are
# issue-rate bound (~170M rows/s at 16 B rows, independent of dtype or index
# locality) and WIDE rows are bandwidth-bound at an effective gather stream
# of only ~24 GB/s — far below the ~800 GB/s sequential HBM bandwidth (fit
# from the r1 and r3 headline artifacts: 16 B rows cost ~6 ns, 1 KB rows
# ~43 ns).  So the layout must minimize BOTH the row count and, above ~100 B
# rows, the gathered BYTES.  The naive one-gather-per-(link, point) cached
# union costs S*P narrow rows; when consecutive groups of COHERENT_SEG query
# points are spatially coherent (each group spans <= 1.5 * cache resolution
# per dimension — true for regular-grid sweeps like the reference benchmark,
# draw_sdf_slice, and voxelization), one gather of a 4x4x4 voxel *brick*
# serves the whole group and per-point values are extracted on the VPU with
# a one-hot dot: S*P/seg rows instead of S*P.  Brick rows carry ONLY the
# value channel (64 cells = 256 B): a 4-channel (value, grad) brick was
# measured 26% SLOWER end-to-end (BENCH_r03 4ch A/B — 1 KB rows put the
# union in the bytes-bound regime), so the winner's gradient comes from one
# extra 16 B row per point gathered from the concatenated packed (value,
# grad) table instead — narrow rows ride the cheap issue-bound regime.
# Bricks overlap at stride 2 per dim (8x the value grid in HBM, 2x the
# packed vg rows) so that any segment whose integer keys span <= 2 voxels is
# guaranteed to land inside the brick anchored at 2*floor(min_key/2).
#
# A "segment" is just a run of consecutive points sharing one brick — the
# lookup only reshapes, so the group size generalizes beyond 4-point raster
# lines to multi-dimensional TILES of grid points (one brick row per tile).
# Containment under an arbitrary rigid link transform: a box tile with
# (t_d - 1) steps of size r per dim has worst-case rotated per-axis span
# r * ||t - 1||_2 (Cauchy-Schwarz over rotation-matrix rows), and integer
# keys round(x / res) spanning sigma in world units fit a stride-2-anchored
# 4-brick iff sigma < 2 * res.  So a tile conforms for EVERY rotation iff
# ||t - 1||_2 < 2 * cache_res / r — at the standard ratio cache_res = 2r:
# (4,) lines (the classic contract), (4, 3) tiles for 2D slices (12
# points/row), (3, 3, 3) tiles for 3D sweeps (27 points/row).  See
# voxel.get_coherent_tile_points.

COHERENT_SEG = 4


def _aabb_distance_grad(bb: jnp.ndarray, pts: jnp.ndarray):
    """Distance-to-AABB under-approximation + its gradient (reference
    sdf.py:555-571).  ONE implementation: the coherent paths' exactness
    contract requires this math bit-identical everywhere it appears.

    ``p - clip(p, lo, hi)`` is bit-identical to the reference's
    ``max(p - hi, 0) - max(lo - p, 0)`` form (IEEE: ``p - lo == -(lo - p)``
    exactly) in one clamp pass instead of two max passes — this helper runs
    per (child, point) in every union, so one saved pass over
    ``[S, B, seg, FS, 3]`` is measurable (~5 ms/north-star chunk)."""
    dtotal = pts - jnp.clip(pts, bb[:, 0], bb[:, 1])
    dist = jnp.linalg.norm(dtotal, axis=-1)
    grad = dtotal / jnp.maximum(dist, 1e-12)[..., None]
    return dist, grad


def _scattered_rows(shape, nrows):
    """Distinct filler addresses for gather lanes whose result is discarded.

    Redirecting dead lanes to row 0 was believed to turn scattered HBM reads
    into cache hits; measured on v5e it does the OPPOSITE — duplicated
    addresses SERIALIZE on HBM banks (100% row-0 gathers ran 1.75x slower
    than 100% scattered; artifacts_r05/winner_microbench.json).  Dead lanes
    therefore read distinct sequential rows, which stream at full bank
    parallelism.  Built from broadcasted_iota so XLA generates the addresses
    in-register (no materialized arange/reshape relayout)."""
    n = len(shape)
    flat = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    for d in range(1, n):
        flat = flat * shape[d] + jax.lax.broadcasted_iota(jnp.int32, shape, d)
    return flat % nrows


def _coherent_classify(children) -> tuple:
    """``(fast_idx, tri_idx, generic_idx)`` — the ONE definition of which
    children take which path in :func:`compose_query_coherent` (mirrored by
    :func:`coherent_fast_tables`, :func:`coherent_generic_aux`,
    ``check_coherent_contract`` and ``coherent_min_cache_resolution``):

    - ``fast_idx``: nearest-mode BOUNDING_BOX caches (the 4x4x4 value-brick
      union with per-tile winner gradients);
    - ``tri_idx``: trilinear BOUNDING_BOX caches when they can take the
      multi-child TRILINEAR union (at least two of them and no nearest-fast
      children — mixed unions evaluate trilinear children generically, and
      a single trilinear child in a multi-child union stays generic too);
    - ``generic_idx``: everything else (per-point raw_query sub-path).

    A composition whose ONLY child is a trilinear cache is handled before
    classification by the single-child 5x5x5 path
    (:func:`_coherent_single_trilinear_child`)."""
    fast = [i for i, s in enumerate(children) if _is_coherent_fast_child(s)]
    tri = [i for i, s in enumerate(children)
           if _is_coherent_trilinear_child(s)]
    if fast or len(tri) < 2:
        tri = []
    generic = [i for i in range(len(children))
               if i not in fast and i not in tri]
    return fast, tri, generic


def coherent_fast_tables(children: Sequence["ObjectFrameSDF"]):
    """The ``_CoherentTables`` tuple for the coherent-fast children of
    ``children`` (in child order), ready to thread into
    :func:`compose_query_coherent`'s ``fast_tables`` as a jit argument.
    Build ONCE outside the jit (the brick expansion is device work).

    When exactly ONE child takes the fast path, its tables additionally
    carry the 4-channel gradient bricks (``bricks4``) so
    :func:`compose_query_coherent` can use the winner-row-free single-child
    layout (see :func:`_coherent_single_lookup`).  A composition whose ONE
    child is a trilinear BOUNDING_BOX cache gets the 5x5x5 ``bricks5``
    table for the trilinear fast path instead
    (:func:`_coherent_single_trilinear_lookup`); a union of two or more
    trilinear caches gets the value/gradient 5x5x5 tables of the
    multi-child TRILINEAR union (:func:`_coherent_union_lookup_tile_tri`)."""
    tri = _coherent_single_trilinear_child(children)
    if tri is not None:
        return (tri._coherent_tables(with_tri_bricks=True,
                                     with_value_bricks=False),)
    fast_idx, tri_idx, _ = _coherent_classify(children)
    if tri_idx:
        return tuple(children[i]._coherent_tables(
            with_value_bricks=False, with_tri_value_bricks=True,
            with_tri_gradonly_bricks=True) for i in tri_idx)
    fast = [children[i] for i in fast_idx]
    single = len(fast) == 1
    # multi-child unions get gradient-only bricks for the per-TILE winner
    # fast path (r5, _coherent_union_lookup_tile); single-child compositions
    # get the 4-channel bricks4 (no union to win)
    tables = tuple(s._coherent_tables(with_grad_bricks=single,
                                      with_gradonly_bricks=not single)
                   for s in fast)
    if not single:
        # A child may carry an in-place-upgraded bricks4 cache from an earlier
        # SINGLE-child composition; multi-child unions never use it, so strip
        # it here — otherwise the 32x-grid-memory table is threaded/replicated
        # through every jit call as a dead argument (wasted HBM + transfer).
        tables = tuple(t._replace(bricks4=None) for t in tables)
    else:
        tables = tuple(t._replace(gbricks=None) for t in tables)
    return tables


def _is_coherent_fast_child(s) -> bool:
    """True iff the brick-gather fast path applies to this union child (the
    others take the generic per-point sub-path where the coherence contract
    is irrelevant)."""
    return (isinstance(s, CachedSDF)
            and s.out_of_bounds_strategy == OutOfBoundsStrategy.BOUNDING_BOX
            and s.interpolation == "nearest")


def coherent_min_cache_resolution(children) -> Optional[float]:
    """Smallest voxel resolution among the coherent-fast children of
    ``children``, or ``None`` when there are none — the ``cache_resolution``
    to hand :func:`voxel.get_coherent_tile_points` when building a tiled
    sweep over these children (the ONE definition of 'which ratio governs
    tile safety'; every tile-path consumer must use it).  Trilinear
    children count when they take a trilinear fast path (single-child
    5x5x5 or the multi-trilinear union): those paths share the same
    per-axis span bound (see :func:`_coherent_single_trilinear_lookup`)."""
    tri = _coherent_single_trilinear_child(children)
    if tri is not None:
        return float(tri.resolution)
    fast_idx, tri_idx, _ = _coherent_classify(children)
    vals = [float(children[i].resolution) for i in fast_idx + tri_idx]
    return min(vals) if vals else None


class _CoherentTables(NamedTuple):
    lo: jnp.ndarray        # [3] grid origin
    res: jnp.ndarray       # [3] voxel size
    n: jnp.ndarray         # [3] int32 grid dims
    strides: jnp.ndarray   # [3] int32 ravel strides of the value grid
    vg: jnp.ndarray        # [G, 4] packed (value, grad) rows
    bricks: jnp.ndarray    # [NB, 64] overlapping 4x4x4 VALUE bricks
    bstrides: jnp.ndarray  # [3] int32 ravel strides of the brick grid
    bb: jnp.ndarray        # [3, 2] surface AABB for the out-of-bounds fallback
    # [NB, 256] 4-channel (value, grad) bricks, CHANNEL-major
    # ([v x64 | gx x64 | gy x64 | gz x64] per row — see
    # _coherent_single_lookup / _build_coherent_tables).
    # Built ONLY for single-cached-child unions, where (value, gradient)
    # ride one 1 KB row per tile instead of a 256 B value row plus seg
    # 16 B winner rows (no union to win — see _coherent_single_lookup;
    # measured 136 -> 261M q/s on the free-drill bench row).  None for
    # multi-child unions, where carrying gradient channels in every
    # (child, tile) row measured 26% slower end-to-end.
    bricks4: Optional[jnp.ndarray] = None
    # [NB, 512] 4-channel 5x5x5 bricks for the single-child TRILINEAR fast
    # path, channel-major with each 125-cell channel padded to 128 lanes
    # ([v x128 | gx x128 | gy x128 | gz x128]).  Same stride-2 anchors and
    # bstrides as the 4x4x4 bricks: the tile contract bounds the clipped
    # floor-key span by 2, so the 8 interpolation corners span <= 4 cells
    # per dim — always inside a 5-window at anchor 2*floor(min/2) (see
    # _coherent_single_trilinear_lookup).
    bricks5: Optional[jnp.ndarray] = None
    # [NB, 192] GRADIENT-only 4x4x4 bricks, channel-major
    # ([gx x64 | gy x64 | gz x64] per 768 B row), for MULTI-child unions'
    # per-TILE winner fast path (_coherent_union_lookup_tile, r5): the
    # winner's gradient rides 1-2 brick rows per tile instead of one 16 B
    # row per point.  The r5 microbench (artifacts_r05/winner_microbench)
    # showed per-point gathers are ROW-RATE bound (~142M rows/s, address
    # pattern irrelevant — duplicated addresses are in fact 1.75x SLOWER,
    # bank serialization), so the only way to beat the 59%-of-forward
    # winner gather is fewer rows, i.e. tile granularity.
    gbricks: Optional[jnp.ndarray] = None
    # multi-child TRILINEAR union tables (_coherent_union_lookup_tile_tri,
    # r5): [NB, 128] VALUE-only 5x5x5 bricks (125 cells lane-padded to 128;
    # ~15.6x grid memory) and [NB, 384] GRADIENT-only 5x5x5 bricks,
    # channel-major ([gx x128 | gy x128 | gz x128]; ~47x grid memory).
    # Same stride-2 anchors/bstrides as bricks5.
    tbricks: Optional[jnp.ndarray] = None
    tgbricks: Optional[jnp.ndarray] = None


def _coherent_union_values(smalls: Sequence[_CoherentTables],
                           seg: int = COHERENT_SEG):
    """Value-only variant of :func:`_coherent_union_lookup`:
    ``values(pts_c [C, B, seg, FS, 3], bricks_list) -> val [B, seg, FS]``.
    Skips the winner-row gradient gather and every gradient-side carry
    (~10% of the value+gradient cost under the value-brick layout) for
    inference-only sweeps (collision checks, occupancy rasters).  Not
    differentiable (callers stop gradients).  ``seg``: points per brick row
    (line segment or tile size — see the module comment above COHERENT_SEG).

    SHAPE CONVENTION (r4): the segment axis is EXPLICIT and SECOND-MINOR
    (``[B, seg, FS]``) throughout.  Two TPU layout facts force this
    (artifacts_r04/roofline_arm.json, full_stage_hlo.txt, engine_v2b.log):
    (1) a ``[B, F] <-> [B, F//seg, seg]`` reshape is not a bitcast under
    tiled layouts — XLA lowers each one as a chunked relayout while-loop,
    ~9.5 ms per instance, ~294 ms of the r3 709 ms chunk forward; (2) a
    minor ``seg`` axis pads to the 128-lane tile (27 -> 128, a 4.7x
    memory/bandwidth bloat that OOMed the north-star chunk).  With ``seg``
    second-minor it pads only to the 8-sublane tile (27 -> 32) and the
    large FS axis fills the lanes.  Per-element math is unchanged
    (bit-identical results); callers un-permute once at the end."""
    with jax.ensure_compile_time_eval():
        iota64 = jnp.arange(64, dtype=jnp.int32)
        off_ravel = jnp.asarray([16, 4, 1], dtype=jnp.int32)

    def values(pts_c, bricks_list):
        best_v = None
        for ci, t in enumerate(smalls):
            p = pts_c[ci]                                  # [B, seg, FS, 3]
            k = jnp.round((p - t.lo) / t.res).astype(jnp.int32)
            valid = jnp.all((k >= 0) & (k < t.n), axis=-1)
            kc = jnp.clip(k, 0, t.n - 1)
            corner2 = kc.min(axis=1) // 2                  # [B, FS, 3]
            bflat = jnp.sum(corner2 * t.bstrides, axis=-1)
            seg_valid = jnp.any(valid, axis=1)
            bflat = jnp.where(seg_valid, bflat,
                              _scattered_rows(bflat.shape,
                                              bricks_list[ci].shape[0]))
            rows = bricks_list[ci][bflat]                  # [B, FS, 64]
            off = kc - (corner2 * 2)[:, None, :, :]
            offf = jnp.sum(off * off_ravel, axis=-1)       # [B, seg, FS]
            oh64 = (offf[..., None] == iota64).astype(p.dtype)
            v_in = jnp.sum(rows[:, None, :, :] * oh64, axis=-1)
            v_oob, _ = _aabb_distance_grad(t.bb, p)
            v = jnp.where(valid, v_in, v_oob)
            best_v = v if best_v is None else jnp.minimum(best_v, v)
        return best_v

    return values


def _coherent_vg_bases(smalls: Sequence[_CoherentTables]) -> np.ndarray:
    """Static row offset of each child's packed (value, grad) table inside
    the concatenated ``vg_cat`` array (child order, trailing total)."""
    return np.cumsum([0] + [int(np.prod(np.asarray(t.n, dtype=np.int64)))
                            for t in smalls])


def _coherent_union_lookup(smalls: Sequence[_CoherentTables],
                           brick_sd: Sequence[tuple], vg_sd: tuple,
                           seg: int = COHERENT_SEG):
    """Returns a custom-VJP function ``lookup(pts_c [C, B, seg, FS, 3],
    bricks_list, vg_cat) -> (val [B, seg, FS], g_link [B, seg, FS, 3],
    win [B, seg, FS] int32)`` evaluating the min-union of the cached
    children with brick gathers; ``g_link`` is the winner's gradient in the
    *winner's own frame* and ``win`` the winner's index into ``smalls``
    (compact int32 instead of a ``[C, ..]`` float one-hot: 1/32 the residual
    bytes for the straight-through VJP; callers build per-child masks with
    ``win == ci``).  The segment axis stays explicit and second-minor
    end-to-end — see :func:`_coherent_union_values` on why (``[B, F] <->
    [B, FS, seg]`` reshapes are chunked relayout loops on TPU, ~40% of the
    r3 north-star chunk time, and a minor seg axis pads 27 -> 128 lanes).

    The union's values come from one 256 B value-brick row per (child,
    ``seg``-point group); the winner's gradient comes from ONE extra 16 B
    row per point gathered from ``vg_cat`` (the children's packed (value,
    grad) tables concatenated in child order).  Narrow rows ride the
    issue-bound gather regime (~6 ns/row) so the gradient adds ~10% to the
    bytes-dominated brick cost — a 4-channel gradient-in-brick layout was
    measured 26% slower end-to-end (1 KB rows are bandwidth-bound at
    ~24 GB/s; see the module comment above COHERENT_SEG).

    Only ``smalls``' tiny fields (lo/res/n/strides/bstrides/bb) are used —
    they MUST be concrete (their arithmetic has to constant-fold exactly
    like the generic path's, or borderline ``round()``\\ s flip by one
    voxel).  The big arrays (``bricks_list`` per child, ``vg_cat``) are
    explicit arguments so callers can thread them through jits: captured
    constants at multi-hundred-MB scale cost minutes of compile per
    retrace, and custom_vjp closures cannot capture argument tracers.
    ``vg_sd``: (shape, dtype) of ``vg_cat`` for the zero cotangent."""
    C = len(smalls)
    bases = _coherent_vg_bases(smalls)
    # small index constants; concrete even when (re)built inside a
    # jit/grad trace (a traced constant here would fail lowering under
    # grad-of-jit)
    with jax.ensure_compile_time_eval():
        iota64 = jnp.arange(64, dtype=jnp.int32)
        off_ravel = jnp.asarray([16, 4, 1], dtype=jnp.int32)
        child_iota = jnp.arange(C, dtype=jnp.int32)

    def eval_union(pts_c, bricks_list, vg_cat):
        best_v = best_i = best_flat = best_valid = best_g_oob = None
        for ci, t in enumerate(smalls):
            p = pts_c[ci]                                  # [B, seg, FS, 3]
            k = jnp.round((p - t.lo) / t.res).astype(jnp.int32)
            valid = jnp.all((k >= 0) & (k < t.n), axis=-1)
            kc = jnp.clip(k, 0, t.n - 1)
            # int() keeps the python-int weak type: an np.int64 scalar would
            # promote the int32 flat index
            flat = jnp.sum(kc * t.strides, axis=-1) + int(bases[ci])
            corner2 = kc.min(axis=1) // 2                  # brick coord
            bflat = jnp.sum(corner2 * t.bstrides, axis=-1)     # [B, FS]
            # segments with no in-bounds point read SCATTERED filler rows
            # (discarded by the valid-select below): duplicated addresses
            # serialize on HBM banks — see _scattered_rows.
            seg_valid = jnp.any(valid, axis=1)
            bflat = jnp.where(seg_valid, bflat,
                              _scattered_rows(bflat.shape,
                                              bricks_list[ci].shape[0]))
            rows = bricks_list[ci][bflat]                      # [B, FS, 64]
            off = kc - (corner2 * 2)[:, None, :, :]            # in [0, 4)
            offf = jnp.sum(off * off_ravel, axis=-1)           # [B, SEG, FS]
            oh64 = (offf[..., None] == iota64).astype(p.dtype)
            # one-hot multiply-sum, NOT einsum/matmul: exactly one term per
            # lane is nonzero, so the result is bit-identical to a direct
            # row gather (and immune to TPU bf16 matmul passes)
            v_in = jnp.sum(rows[:, None, :, :] * oh64, axis=-1)
            # out-of-bounds: distance-to-AABB under-approximation, carrying
            # its gradient through the min-union so no per-point winner
            # reconstruction is needed afterwards
            v_oob, g_oob = _aabb_distance_grad(t.bb, p)
            v = jnp.where(valid, v_in, v_oob)
            if best_v is None:
                best_v, best_flat, best_valid = v, flat, valid
                best_g_oob = g_oob
                best_i = jnp.zeros_like(flat)
            else:
                better = v < best_v
                best_v = jnp.where(better, v, best_v)
                best_flat = jnp.where(better, flat, best_flat)
                best_valid = jnp.where(better, valid, best_valid)
                best_g_oob = jnp.where(better[..., None], g_oob, best_g_oob)
                best_i = jnp.where(better, ci, best_i)
        # single winner-row gather for the gradient; points whose winner is
        # out of bounds use the AABB gradient anyway, so their lanes read
        # scattered filler rows (see _scattered_rows)
        best_flat = jnp.where(best_valid, best_flat,
                              _scattered_rows(best_flat.shape,
                                              vg_cat.shape[0]))
        g_in = vg_cat[best_flat][..., 1:4]
        g_link = jnp.where(best_valid[..., None], g_in, best_g_oob)
        return best_v, g_link, best_i

    @jax.custom_vjp
    def lookup(pts_c, bricks_list, vg_cat):
        return eval_union(pts_c, bricks_list, vg_cat)

    def fwd(pts_c, bricks_list, vg_cat):
        val, g_link, win = eval_union(pts_c, bricks_list, vg_cat)
        return (val, g_link, win), (g_link, win)

    def bwd(residual, cotangents):
        g_link, win = residual
        ct_val = cotangents[0]
        # straight-through: d val / d pts_c[ci] = (win == ci) * winner
        # gradient; the one-hot is rebuilt from the compact int32 winner
        # index here instead of being materialized as a [C, ..] float
        # residual (32x fewer residual bytes for C=8)
        oh = (win[None] == child_iota[:, None, None, None]).astype(
            g_link.dtype)
        d_pts = oh[..., None] * (ct_val[..., None] * g_link)[None]
        # tables are data, not parameters: zero cotangents (DCE'd upstream;
        # shapes statically known at lookup-build time)
        d_bricks = tuple(jnp.zeros(s, d) for s, d in brick_sd)
        return (d_pts, d_bricks, jnp.zeros(vg_sd[0], vg_sd[1]))

    lookup.defvjp(fwd, bwd)
    return lookup


def _coherent_gbrick_bases(smalls: Sequence[_CoherentTables]) -> np.ndarray:
    """Static row offset of each child's brick-grid table (stride-2 anchor
    rows, dims ``(n-1)//2+1``) inside a concatenated brick array."""
    return np.cumsum([0] + [
        int(np.prod((np.asarray(t.n, dtype=np.int64) - 1) // 2 + 1))
        for t in smalls])


def _coherent_union_lookup_tile(smalls: Sequence[_CoherentTables],
                                brick_sd: Sequence[tuple], gb_sd: tuple,
                                vg_sd: tuple, rb_sd: tuple,
                                seg: int = COHERENT_SEG,
                                residual_frac: float = 0.04):
    """Per-TILE winner variant of :func:`_coherent_union_lookup` (r5): the
    winner's gradient rides 768 B gradient-BRICK rows per tile instead of one
    16 B row per point, and comes out already rotated into the OBJECT frame.

    Why: the per-point winner gather is ROW-RATE bound (~142M rows/s on v5e
    — 186 ms for the 26.5M rows of one north-star chunk, 59% of the r4
    forward), and the rate is independent of address pattern (duplicated
    addresses measured 1.75x SLOWER — HBM bank serialization — so the
    redirect-rows-to-0 trick cannot help it; artifacts_r05/
    winner_microbench.json).  Tile-granular rows are the only lever: 2 brick
    gathers (24 ms) + winner-one-hot extraction (47 ms) replace the gather.

    Mechanics per tile (measured rates at north-star chunk scale):
      1. three candidates per tile: first/last distinct in-bounds winners
         (``eff_min``/``eff_max`` over the seg axis) plus the smallest
         remaining one — <= 3 distinct winners covers 98.9-100% of tiles
         (benchmarks/winner_agreement.py);
      2. gather those children's gradient-brick rows (768 B each) and rotate
         the 64-cell channel rows into the object frame at TILE level with
         the tile winner's R (identical per-cell math and add order as
         ``transforms.rotate_vectors`` — bit-exact);
      3. extract each point's cells with the winner's one-hot
         (``best_offf``), select candidate 1 vs 2 per point;
      4. tiles with >= 4 distinct winners ("middle" tiles, <= 1.1% measured)
         are COMPACTED at tile granularity (``jnp.nonzero`` over the [B*FS]
         tile mask — NOT the r3 culled-union's per-(child,point)-pair
         compaction whose front-end cost 85 ms) and take exact per-point
         16 B rows only there; capacity is ``residual_frac`` of all tiles
         (static shape).  Tiles beyond capacity get NaN gradients — exact
         or LOUD, never silently wrong — and in-bounds values are unaffected.

    Returns ``lookup(pts_c [C, B, seg, FS, 3], bricks_list, gbricks_cat,
    vg_cat, Rb [C, B, 3, 3]) -> (val [B, seg, FS], g_obj [B, seg, FS, 3],
    win [B, seg, FS] int32)`` with ``g_obj`` in the OBJECT frame (unlike
    ``_coherent_union_lookup``, which returns the winner's link frame and
    leaves rotation to the caller).  ``Rb`` are the link->object rotations
    of the fast children.  The custom VJP keeps the straight-through
    point/value semantics and gives ``Rb`` the same cotangent the caller's
    external rotate chain used to produce (gradient outputs feed joint-angle
    gradients through R).  ``gb_sd``/``vg_sd``/``rb_sd``: (shape, dtype)
    for the zero/real cotangents."""
    C = len(smalls)
    bases = _coherent_vg_bases(smalls)
    gbases = _coherent_gbrick_bases(smalls)
    nbg_total = int(gbases[-1])
    with jax.ensure_compile_time_eval():
        iota64 = jnp.arange(64, dtype=jnp.int32)
        off_ravel = jnp.asarray([16, 4, 1], dtype=jnp.int32)

    def eval_union(pts_c, bricks_list, gbricks_cat, vg_cat, Rb):
        B, FS = pts_c.shape[1], pts_c.shape[3]
        dtype = pts_c.dtype
        best = None
        bflats = []
        for ci, t in enumerate(smalls):
            p = pts_c[ci]                                  # [B, seg, FS, 3]
            k = jnp.round((p - t.lo) / t.res).astype(jnp.int32)
            valid = jnp.all((k >= 0) & (k < t.n), axis=-1)
            kc = jnp.clip(k, 0, t.n - 1)
            flat = jnp.sum(kc * t.strides, axis=-1) + int(bases[ci])
            corner2 = kc.min(axis=1) // 2                  # [B, FS, 3]
            bflat = jnp.sum(corner2 * t.bstrides, axis=-1)
            seg_valid = jnp.any(valid, axis=1)
            bflat = jnp.where(seg_valid, bflat,
                              _scattered_rows(bflat.shape,
                                              bricks_list[ci].shape[0]))
            bflats.append(bflat)
            rows = bricks_list[ci][bflat]                  # [B, FS, 64]
            off = kc - (corner2 * 2)[:, None, :, :]
            offf = jnp.sum(off * off_ravel, axis=-1)       # [B, seg, FS]
            oh64 = (offf[..., None] == iota64).astype(dtype)
            v_in = jnp.sum(rows[:, None, :, :] * oh64, axis=-1)
            v_oob, g_oob = _aabb_distance_grad(t.bb, p)
            # rotate the AABB fallback gradient into the OBJECT frame here,
            # per child (the only per-point rotations left; in-bounds
            # gradients are rotated at TILE level below)
            g_oob_obj = tfm.rotate_vectors(Rb[ci][:, None], g_oob)
            v = jnp.where(valid, v_in, v_oob)
            if best is None:
                best = dict(v=v, flat=flat, valid=valid, g_oob=g_oob_obj,
                            i=jnp.zeros_like(flat), offf=offf)
            else:
                better = v < best["v"]
                best = dict(
                    v=jnp.where(better, v, best["v"]),
                    flat=jnp.where(better, flat, best["flat"]),
                    valid=jnp.where(better, valid, best["valid"]),
                    g_oob=jnp.where(better[..., None], g_oob_obj,
                                    best["g_oob"]),
                    i=jnp.where(better, ci, best["i"]),
                    offf=jnp.where(better, offf, best["offf"]))
        best_v, best_i, best_valid = best["v"], best["i"], best["valid"]

        # ---- per-tile first/last distinct in-bounds winner ----
        eff_min = jnp.where(best_valid, best_i, C).min(axis=1)   # [B, FS]
        eff_max = jnp.where(best_valid, best_i, -1).max(axis=1)
        # scattered filler addresses for unused candidate slots: row-0
        # duplicates SERIALIZE on HBM banks (microbench: 1.75x slower than
        # scattered), so idle lanes read distinct sequential rows instead
        filler = (jax.lax.broadcasted_iota(jnp.int32, (B, FS), 0) * FS
                  + jax.lax.broadcasted_iota(jnp.int32, (B, FS), 1)) \
            % nbg_total

        def candidate(ceff):
            """Object-frame rotated 64-cell gradient channels of the brick
            of child ``ceff[B, FS]`` at each tile (3 x [B, FS, 64])."""
            addr = filler
            r9 = jnp.zeros((B, FS, 3, 3), dtype)
            for ci in range(C):
                m = ceff == ci
                addr = jnp.where(m, int(gbases[ci]) + bflats[ci], addr)
                r9 = jnp.where(m[..., None, None], Rb[ci][:, None], r9)
            rows = gbricks_cat[addr]                     # [B, FS, 192]
            # tile-level rotation; term order matches rotate_vectors
            # (bit-exact per cell)
            return [r9[..., o, 0, None] * rows[..., 0:64]
                    + r9[..., o, 1, None] * rows[..., 64:128]
                    + r9[..., o, 2, None] * rows[..., 128:192]
                    for o in range(3)]

        # candidates 1..3: first/last distinct winners, then the smallest
        # remaining one — <= 3 distinct winners covers 98.9-100% of tiles
        # (winner_agreement.py), so the residual lane only carries the
        # >= 4-winner tail (<= 1.1% measured; cap has ~5x headroom)
        ohw = (best["offf"][..., None] == iota64).astype(dtype)
        # candidate list is static in C: a union of C children can never
        # have more than C distinct winners per tile
        cand_specs = [eff_min]
        if C >= 2:
            cand_specs.append(jnp.where(eff_max > eff_min, eff_max, -1))
        if C >= 3:
            cand_specs.append(None)  # resolved below from `covered`
        g_cand = None
        covered = jnp.zeros(best_i.shape, dtype=bool)
        for ceff in cand_specs:
            if ceff is None:  # third: smallest winner not yet covered
                rem = jnp.where(best_valid & ~covered, best_i, C)
                eff_mid = rem.min(axis=1)
                ceff = jnp.where(eff_mid < C, eff_mid, -1)
            rows_k = candidate(ceff)
            g_k = jnp.stack([jnp.sum(rows_k[c][:, None] * ohw, axis=-1)
                             for c in range(3)], axis=-1)  # [B, seg, FS, 3]
            mask_k = best_i == ceff[:, None, :]  # ceff==-1 matches nothing
            g_cand = g_k if g_cand is None else jnp.where(
                mask_k[..., None], g_k, g_cand)
            covered = covered | mask_k

        if C <= 3:
            # three candidates exhaust every possible winner: no residual
            # lane, no overflow — the whole compaction/gather/scatter block
            # below is statically dead
            return best_v, jnp.where(best_valid[..., None], g_cand,
                                     best["g_oob"]), best_i

        # ---- residual: tiles with >= 4 distinct winners ----
        middle = jnp.any(best_valid & ~covered, axis=1)  # [B, FS]
        mflat = middle.reshape(-1)
        # floor of 32 tiles so tiny (debug-scale) workloads never overflow
        # just because ceil(frac * few) is small; tiny caps only matter for
        # the overflow tests, which pass residual_frac ~ 0 explicitly
        cap = min(B * FS, max(int(math.ceil(B * FS * residual_frac)),
                              min(32, B * FS) if residual_frac >= 1e-6 else 1))
        (idx,) = jnp.nonzero(mflat, size=cap, fill_value=B * FS)
        bi, fi = idx // FS, idx % FS           # padding rows: bi == B (OOB)
        bi_s = jnp.minimum(bi, B - 1)
        fi_s = jnp.minimum(fi, FS - 1)
        # transpose to seg-MINOR first so each tile's residual fetch is ONE
        # contiguous row (advanced indexing [cap, :] on the engine's
        # seg-second-minor layout would lower to cap*seg strided
        # single-element gather rows — the row-rate-bound cost class this
        # path exists to avoid).  The winner index packs into the flat
        # index's top bits so ONE relayout transpose serves both (a [B,
        # seg, FS] int32 transpose is ~11 ms at north-star scale).
        assert int(bases[-1]) < (1 << 28) and C <= 8, \
            "packed residual transpose needs flat < 2^28 and <= 8 children"
        packed_t = jnp.swapaxes(best["flat"] | (best_i << 28), 1, 2)
        res_packed = packed_t[bi_s, fi_s]                # [cap, seg]
        res_win = res_packed >> 28
        res_flat = res_packed & ((1 << 28) - 1)
        # padding entries (idx beyond the middle-tile count) would all read
        # the SAME clamped tile -> duplicated addresses serialize on HBM
        # banks (1.75x slower than scattered; winner_microbench) — give them
        # distinct sequential rows instead
        pad = (idx >= B * FS)[:, None]
        iota_sc = (jax.lax.broadcasted_iota(jnp.int32, (cap, seg), 0) * seg
                   + jax.lax.broadcasted_iota(jnp.int32, (cap, seg), 1)) \
            % int(bases[-1])
        res_flat = jnp.where(pad, iota_sc, res_flat)
        res_win = jnp.where(pad, 0, res_win)
        res_g = vg_cat[res_flat][..., 1:4]
        rr = jnp.zeros(res_g.shape[:2] + (3, 3), dtype)  # [cap, seg, 3, 3]
        for ci in range(C):
            m = res_win == ci
            rr = jnp.where(m[..., None, None], Rb[ci][bi_s][:, None], rr)
        res_g_obj = tfm.rotate_vectors(rr, res_g[..., None, :])[..., 0, :]
        g_sc = jnp.zeros((B, FS, seg, 3), dtype).at[bi, fi].set(
            res_g_obj, mode="drop")
        g_res = jnp.swapaxes(g_sc, 1, 2)                 # [B, seg, FS, 3]
        # capacity overflow: exact or LOUD — NaN-poison uncovered middle
        # tiles' in-bounds gradients instead of returning silently wrong ones
        mint = mflat.astype(jnp.int32)
        rank = (jnp.cumsum(mint) - mint).reshape(B, FS)
        overflow = middle & (rank >= cap)

        g_in = jnp.where(middle[:, None, :, None], g_res, g_cand)
        g_in = jnp.where(overflow[:, None, :, None], jnp.float32(np.nan),
                         g_in)
        g_obj = jnp.where(best_valid[..., None], g_in, best["g_oob"])
        return best_v, g_obj, best_i

    @jax.custom_vjp
    def lookup(pts_c, bricks_list, gbricks_cat, vg_cat, Rb):
        return eval_union(pts_c, bricks_list, gbricks_cat, vg_cat, Rb)

    def fwd(pts_c, bricks_list, gbricks_cat, vg_cat, Rb):
        val, g_obj, win = eval_union(pts_c, bricks_list, gbricks_cat,
                                     vg_cat, Rb)
        return (val, g_obj, win), (g_obj, win, Rb)

    def bwd(residual, cotangents):
        g_obj, win, Rb = residual
        ct_val, ct_g = cotangents[0], cotangents[1]
        d_pts = []
        d_Rb = []
        for ci in range(C):
            mask = (win == ci).astype(g_obj.dtype)
            r = Rb[ci][:, None, None]                    # [B, 1, 1, 3, 3]
            # winner gradient back in child ci's LINK frame: R^T g_obj
            # (straight-through: d val / d pts_c[ci] = mask * link gradient,
            # same as _coherent_union_lookup's bwd up to the R^T(R g)
            # round-trip ulp)
            g_link = jnp.stack(
                [r[..., 0, i] * g_obj[..., 0] + r[..., 1, i] * g_obj[..., 1]
                 + r[..., 2, i] * g_obj[..., 2] for i in range(3)], axis=-1)
            d_pts.append(mask[..., None] * (ct_val[..., None] * g_link))
            # rotation transpose: d R[o, i] = sum over this child's winner
            # points of ct_g[o] * g_link[i] (the cotangent the caller's
            # external rotate chain produced in the per-point design)
            ct_gm = ct_g * mask[..., None]
            d_Rb.append(jnp.stack(
                [jnp.stack([jnp.sum(ct_gm[..., o] * g_link[..., i],
                                    axis=(1, 2)) for i in range(3)], axis=-1)
                 for o in range(3)], axis=-2))           # [B, 3, 3]
        d_bricks = tuple(jnp.zeros(s, d) for s, d in brick_sd)
        return (jnp.stack(d_pts), d_bricks,
                jnp.zeros(gb_sd[0], gb_sd[1]),
                jnp.zeros(vg_sd[0], vg_sd[1]),
                jnp.stack(d_Rb))

    lookup.defvjp(fwd, bwd)
    return lookup


def _coherent_union_lookup_tile_tri(smalls: Sequence[_CoherentTables],
                                    tb_sd: Sequence[tuple], tgb_sd, vg_sd,
                                    rb_sd, seg: int = COHERENT_SEG,
                                    residual_frac: float = 0.04,
                                    values_only: bool = False):
    """Multi-child TRILINEAR union on the per-TILE winner design (r5) —
    the trilinear analog of :func:`_coherent_union_lookup_tile`, removing
    the generic trilinear path's 8-corner-rows-per-(child, point) cliff
    (measured 20.4M q/s, artifacts_r04/trilinear.json).

    Values: one 512 B 5x5x5 VALUE-brick row per (child, tile)
    (``tbricks``), per-point 8-corner lerp via static lane rolls in the
    exact corner order of ``CachedSDF.gather_trilinear`` (bit-identical,
    same contract as :func:`_coherent_single_trilinear_lookup`).

    Winner gradients: up to three per-tile candidate children (same
    eff_min/eff_max/remaining scheme as the nearest version) read 1.5 KB
    gradient-only 5x5x5 rows (``tgbricks``), the winner's 8-corner lerp
    accumulates in LINK frame per candidate, the per-point result selects
    among candidates and is rotated ONCE per point with the
    candidate-selected R — lerp-then-rotate, matching the generic path's
    op order exactly (rotation does NOT distribute over the lerp sum
    bitwise, so tile-level row rotation as in the nearest engine would
    break the CPU bit-exactness contract here).  Tiles with >= 4 distinct
    winners take the tile-compacted per-point residual lane (exact
    8-corner vg lerp); capacity overflow NaN-poisons like the nearest
    version.  ``values_only=True`` returns just the value function
    (inference; callers stop gradients)."""
    C = len(smalls)
    bases = _coherent_vg_bases(smalls)
    gbases = _coherent_gbrick_bases(smalls)
    nbg_total = int(gbases[-1])
    with jax.ensure_compile_time_eval():
        iota128 = jnp.arange(128, dtype=jnp.int32)

    corner_offs = [[(corner >> d) & 1 for d in range(3)] for corner in
                   range(8)]

    def corner_weight(w, offs):
        # weight product in gather_trilinear's exact reduce order (x, y, z)
        wt = ((w[..., 0] if offs[0] else 1.0 - w[..., 0])
              * (w[..., 1] if offs[1] else 1.0 - w[..., 1]))
        return wt * (w[..., 2] if offs[2] else 1.0 - w[..., 2])

    def eval_union(pts_c, tbricks_list, tgbricks_cat=None, vg_cat=None,
                   Rb=None):
        B, FS = pts_c.shape[1], pts_c.shape[3]
        dtype = pts_c.dtype
        best = None
        bflats = []
        for ci, t in enumerate(smalls):
            p = pts_c[ci]                                  # [B, seg, FS, 3]
            f = (p - t.lo) / t.res
            keys = jnp.round(f).astype(jnp.int32)
            valid = jnp.all((keys >= 0) & (keys < t.n), axis=-1)
            fc = jnp.clip(f, 0.0, (t.n - 1).astype(dtype))
            i0 = jnp.clip(jnp.floor(fc).astype(jnp.int32), 0, t.n - 2)
            w = fc - i0.astype(dtype)                      # [B, seg, FS, 3]
            corner2 = i0.min(axis=1) // 2                  # [B, FS, 3]
            bflat = jnp.sum(corner2 * t.bstrides, axis=-1)
            seg_valid = jnp.any(valid, axis=1)
            bflat = jnp.where(seg_valid, bflat,
                              _scattered_rows(bflat.shape,
                                              tbricks_list[ci].shape[0]))
            bflats.append(bflat)
            rows = tbricks_list[ci][bflat]                 # [B, FS, 128]
            off = i0 - (corner2 * 2)[:, None, :, :]        # in [0, 3]
            off5 = off[..., 0] * 25 + off[..., 1] * 5 + off[..., 2]
            oh = (off5[..., None] == iota128).astype(dtype)
            acc = jnp.zeros(p.shape[:-1], dtype)
            for offs in corner_offs:
                delta = offs[0] * 25 + offs[1] * 5 + offs[2]
                cell = jnp.sum(jnp.roll(rows[:, None], -delta, axis=-1)
                               * oh, axis=-1)
                acc = acc + corner_weight(w, offs) * cell
            v_oob, g_oob = _aabb_distance_grad(t.bb, p)
            v = jnp.where(valid, acc, v_oob)
            if values_only:
                cur = dict(v=v)
            else:
                flat0 = jnp.sum(i0 * t.strides, axis=-1) + int(bases[ci])
                g_oob_obj = tfm.rotate_vectors(Rb[ci][:, None], g_oob)
                cur = dict(v=v, valid=valid, g_oob=g_oob_obj,
                           off5=off5, w=w, flat0=flat0)
            if best is None:
                best = cur
                if not values_only:
                    best["i"] = jnp.zeros_like(off5)
            elif values_only:
                best["v"] = jnp.minimum(best["v"], v)
            else:
                better = v < best["v"]
                best = dict(
                    v=jnp.where(better, v, best["v"]),
                    valid=jnp.where(better, valid, best["valid"]),
                    g_oob=jnp.where(better[..., None], cur["g_oob"],
                                    best["g_oob"]),
                    i=jnp.where(better, ci, best["i"]),
                    off5=jnp.where(better, off5, best["off5"]),
                    w=jnp.where(better[..., None], w, best["w"]),
                    flat0=jnp.where(better, cur["flat0"], best["flat0"]))
        if values_only:
            return best["v"]
        best_v, best_i, best_valid = best["v"], best["i"], best["valid"]

        eff_min = jnp.where(best_valid, best_i, C).min(axis=1)   # [B, FS]
        eff_max = jnp.where(best_valid, best_i, -1).max(axis=1)
        filler = _scattered_rows((B, FS), nbg_total)

        def candidate(ceff):
            """LINK-frame gradient channel slices (3 x [B, FS, 128]) and the
            tile-level rotation matrix [B, FS, 3, 3] of child ``ceff``."""
            addr = filler
            r9 = jnp.zeros((B, FS, 3, 3), dtype)
            for ci in range(C):
                m = ceff == ci
                addr = jnp.where(m, int(gbases[ci]) + bflats[ci], addr)
                r9 = jnp.where(m[..., None, None], Rb[ci][:, None], r9)
            rows = tgbricks_cat[addr]                    # [B, FS, 384]
            return [rows[..., c * 128:(c + 1) * 128] for c in range(3)], r9

        ohw = (best["off5"][..., None] == iota128).astype(dtype)
        cand_specs = [eff_min]
        if C >= 2:
            cand_specs.append(jnp.where(eff_max > eff_min, eff_max, -1))
        if C >= 3:
            cand_specs.append(None)
        g_link = None          # winner's LINK-frame lerped gradient
        cand_r = []            # tile-level candidate rotation matrices
        cand_mask = []         # per-point is-this-candidate masks
        covered = jnp.zeros(best_i.shape, dtype=bool)
        for ceff in cand_specs:
            if ceff is None:
                rem = jnp.where(best_valid & ~covered, best_i, C)
                eff_mid = rem.min(axis=1)
                ceff = jnp.where(eff_mid < C, eff_mid, -1)
            chans, r9 = candidate(ceff)
            acc = [jnp.zeros(best_v.shape, dtype) for _ in range(3)]
            for offs in corner_offs:
                delta = offs[0] * 25 + offs[1] * 5 + offs[2]
                wt = corner_weight(best["w"], offs)
                for c in range(3):
                    cell = jnp.sum(
                        jnp.roll(chans[c][:, None], -delta, axis=-1) * ohw,
                        axis=-1)
                    acc[c] = acc[c] + wt * cell
            g_k = jnp.stack(acc, axis=-1)                # [B, seg, FS, 3]
            mask_k = best_i == ceff[:, None, :]
            g_link = g_k if g_link is None else jnp.where(
                mask_k[..., None], g_k, g_link)
            cand_r.append(r9)
            cand_mask.append(mask_k)
            covered = covered | mask_k

        # per-point rotation with the candidate-selected R: lerp (above,
        # link frame) THEN rotate — the generic path's op order (rotation
        # does not distribute over the lerp sum bitwise).  R entries select
        # per point among the <= 3 tile-level candidate matrices.
        def rot_entry(o, i):
            r = cand_r[0][:, None, :, o, i]
            for k in range(1, len(cand_r)):
                r = jnp.where(cand_mask[k], cand_r[k][:, None, :, o, i], r)
            return r

        g_cand = jnp.stack([
            rot_entry(o, 0) * g_link[..., 0]
            + rot_entry(o, 1) * g_link[..., 1]
            + rot_entry(o, 2) * g_link[..., 2] for o in range(3)], axis=-1)

        if C <= 3:
            return best_v, jnp.where(best_valid[..., None], g_cand,
                                     best["g_oob"]), best_i

        # ---- residual: tiles with >= 4 distinct winners ----
        middle = jnp.any(best_valid & ~covered, axis=1)  # [B, FS]
        mflat = middle.reshape(-1)
        cap = min(B * FS, max(int(math.ceil(B * FS * residual_frac)),
                              min(32, B * FS) if residual_frac >= 1e-6
                              else 1))
        (idx,) = jnp.nonzero(mflat, size=cap, fill_value=B * FS)
        bi, fi = idx // FS, idx % FS
        bi_s = jnp.minimum(bi, B - 1)
        fi_s = jnp.minimum(fi, FS - 1)
        assert int(bases[-1]) < (1 << 28) and C <= 8
        packed_t = jnp.swapaxes(best["flat0"] | (best_i << 28), 1, 2)
        res_packed = packed_t[bi_s, fi_s]                # [cap, seg]
        res_win = res_packed >> 28
        res_flat0 = res_packed & ((1 << 28) - 1)
        pad = (idx >= B * FS)[:, None]
        res_flat0 = jnp.where(pad, _scattered_rows((cap, seg),
                                                   int(bases[-1]) // 2),
                              res_flat0)
        res_win = jnp.where(pad, 0, res_win)
        res_w = jnp.swapaxes(best["w"], 1, 2)[bi_s, fi_s]  # [cap, seg, 3]
        # winner child's ravel strides per residual point
        strides_res = jnp.zeros((cap, seg, 3), jnp.int32)
        rr = jnp.zeros((cap, seg, 3, 3), dtype)
        for ci, t in enumerate(smalls):
            m = res_win == ci
            strides_res = jnp.where(m[..., None], t.strides, strides_res)
            rr = jnp.where(m[..., None, None], Rb[ci][bi_s][:, None], rr)
        acc = jnp.zeros((cap, seg, 3), dtype)
        for offs in corner_offs:
            doff = (offs[0] * strides_res[..., 0]
                    + offs[1] * strides_res[..., 1] + offs[2])
            rowsr = vg_cat[res_flat0 + doff][..., 1:4]   # [cap, seg, 3]
            acc = acc + corner_weight(res_w, offs)[..., None] * rowsr
        res_g_obj = tfm.rotate_vectors(rr, acc[..., None, :])[..., 0, :]
        g_sc = jnp.zeros((B, FS, seg, 3), dtype).at[bi, fi].set(
            res_g_obj, mode="drop")
        g_res = jnp.swapaxes(g_sc, 1, 2)
        mint = mflat.astype(jnp.int32)
        rank = (jnp.cumsum(mint) - mint).reshape(B, FS)
        overflow = middle & (rank >= cap)

        g_in = jnp.where(middle[:, None, :, None], g_res, g_cand)
        g_in = jnp.where(overflow[:, None, :, None], jnp.float32(np.nan),
                         g_in)
        g_obj = jnp.where(best_valid[..., None], g_in, best["g_oob"])
        return best_v, g_obj, best_i

    if values_only:
        return lambda pts_c, tbricks_list: eval_union(pts_c, tbricks_list)

    @jax.custom_vjp
    def lookup(pts_c, tbricks_list, tgbricks_cat, vg_cat, Rb):
        return eval_union(pts_c, tbricks_list, tgbricks_cat, vg_cat, Rb)

    def fwd(pts_c, tbricks_list, tgbricks_cat, vg_cat, Rb):
        val, g_obj, win = eval_union(pts_c, tbricks_list, tgbricks_cat,
                                     vg_cat, Rb)
        return (val, g_obj, win), (g_obj, win, Rb)

    def bwd(residual, cotangents):
        g_obj, win, Rb = residual
        ct_val, ct_g = cotangents[0], cotangents[1]
        d_pts = []
        d_Rb = []
        for ci in range(C):
            mask = (win == ci).astype(g_obj.dtype)
            r = Rb[ci][:, None, None]
            g_link = jnp.stack(
                [r[..., 0, i] * g_obj[..., 0] + r[..., 1, i] * g_obj[..., 1]
                 + r[..., 2, i] * g_obj[..., 2] for i in range(3)], axis=-1)
            d_pts.append(mask[..., None] * (ct_val[..., None] * g_link))
            ct_gm = ct_g * mask[..., None]
            d_Rb.append(jnp.stack(
                [jnp.stack([jnp.sum(ct_gm[..., o] * g_link[..., i],
                                    axis=(1, 2)) for i in range(3)], axis=-1)
                 for o in range(3)], axis=-2))
        d_tb = tuple(jnp.zeros(s, d) for s, d in tb_sd)
        return (jnp.stack(d_pts), d_tb,
                jnp.zeros(tgb_sd[0], tgb_sd[1]),
                jnp.zeros(vg_sd[0], vg_sd[1]),
                jnp.stack(d_Rb))

    lookup.defvjp(fwd, bwd)
    return lookup


def _coherent_single_lookup(t: _CoherentTables, b4_sd: tuple,
                            seg: int = COHERENT_SEG):
    """Single-cached-child variant of :func:`_coherent_union_lookup`: with no
    union to win, the winner is always this child, so (value, gradient) ride
    ONE 1 KB 4-channel brick row per ``seg``-point tile instead of a 256 B
    value row plus ``seg`` per-point 16 B winner rows.  Under the gather cost
    model ``t_row ~ 5.9 ns + 42 ps/B`` that is ~49 ns per 12-point tile vs
    ~94 ns for value-brick + winner rows; the r3 A/B measured the free-drill
    bench row at 261M q/s (4-channel) vs 136M q/s (value-brick + winner
    rows).  Multi-child unions keep value-only bricks — there, gradient
    channels would be gathered for every LOSING child too, which measured
    26% slower end-to-end (see ``_coherent_union_lookup``).

    Returns ``lookup(pts_c [1, B, seg, FS, 3], bricks4 [NB, 256]) ->
    (val [B, seg, FS], g_link [B, seg, FS, 3], win [B, seg, FS] int32)`` —
    same output contract as the union lookup (``win`` is all-zeros),
    bit-identical values/gradients to the generic per-point path.  The
    segment axis stays explicit and second-minor (see
    :func:`_coherent_union_values` on the TPU relayout/padding costs).
    ``b4_sd``: (shape, dtype) of ``bricks4`` for the zero cotangent."""
    with jax.ensure_compile_time_eval():
        iota64 = jnp.arange(64, dtype=jnp.int32)
        off_ravel = jnp.asarray([16, 4, 1], dtype=jnp.int32)

    def eval_single(pts_c, bricks4):
        B, FS = pts_c.shape[1], pts_c.shape[3]
        p = pts_c[0]                                        # [B, seg, FS, 3]
        k = jnp.round((p - t.lo) / t.res).astype(jnp.int32)
        valid = jnp.all((k >= 0) & (k < t.n), axis=-1)
        kc = jnp.clip(k, 0, t.n - 1)
        corner2 = kc.min(axis=1) // 2
        bflat = jnp.sum(corner2 * t.bstrides, axis=-1)
        seg_valid = jnp.any(valid, axis=1)
        bflat = jnp.where(seg_valid, bflat,
                          _scattered_rows(bflat.shape, bricks4.shape[0]))
        rows = bricks4[bflat]                               # [B, FS, 256]
        off = kc - (corner2 * 2)[:, None, :, :]
        offf = jnp.sum(off * off_ravel, axis=-1)            # [B, SEG, FS]
        oh64 = (offf[..., None] == iota64).astype(p.dtype)  # [B, SEG, FS, 64]
        # one-hot multiply-sum (exactly one nonzero term): bit-identical to
        # a per-point row gather, immune to TPU bf16 matmul passes.  bricks4
        # rows are CHANNEL-MAJOR ([v x64 | gx x64 | gy x64 | gz x64]) so each
        # channel is a contiguous minor-dim slice — no [.., 64, 4] minor-dim
        # split (which would relayout and run 4-wide in the 128 lanes).
        chans = [jnp.sum(rows[:, None, :, c * 64:(c + 1) * 64] * oh64,
                         axis=-1) for c in range(4)]        # 4 x [B, SEG, FS]
        v_oob, g_oob = _aabb_distance_grad(t.bb, p)
        val = jnp.where(valid, chans[0], v_oob)
        g_link = jnp.where(valid[..., None],
                           jnp.stack(chans[1:4], axis=-1), g_oob)
        win = jnp.zeros((B, seg, FS), dtype=jnp.int32)
        return val, g_link, win

    @jax.custom_vjp
    def lookup(pts_c, bricks4):
        return eval_single(pts_c, bricks4)

    def fwd(pts_c, bricks4):
        val, g_link, oh = eval_single(pts_c, bricks4)
        return (val, g_link, oh), (g_link,)

    def bwd(residual, cotangents):
        (g_link,) = residual
        ct_val = cotangents[0]
        # straight-through: d val / d pts_c[0] = winner gradient
        d_pts = (ct_val[..., None] * g_link)[None]
        return (d_pts, jnp.zeros(b4_sd[0], b4_sd[1]))

    lookup.defvjp(fwd, bwd)
    return lookup


def _is_coherent_trilinear_child(s) -> bool:
    """True iff ``s`` is eligible for the single-child TRILINEAR brick fast
    path (trilinear BOUNDING_BOX CachedSDF)."""
    return (isinstance(s, CachedSDF)
            and s.out_of_bounds_strategy == OutOfBoundsStrategy.BOUNDING_BOX
            and s.interpolation == "trilinear")


def _coherent_single_trilinear_child(children):
    """The lone child iff the composition is a SINGLE trilinear
    BOUNDING_BOX ``CachedSDF`` — the only composition the trilinear brick
    fast path serves (multi-child unions evaluate trilinear children on
    the generic per-point path, where carrying 8 corner rows per losing
    child would dwarf the nearest path's cost) — else ``None``."""
    if len(children) == 1 and _is_coherent_trilinear_child(children[0]):
        return children[0]
    return None


def _coherent_single_trilinear_lookup(t: _CoherentTables, b5_sd: tuple,
                                      seg: int = COHERENT_SEG,
                                      values_only: bool = False):
    """Single-child TRILINEAR variant of :func:`_coherent_single_lookup`:
    one 2 KB 5x5x5 4-channel brick row per ``seg``-point tile replaces the
    generic trilinear path's EIGHT 16 B corner rows per point (measured
    15.3M q/s — `artifacts_r04/trilinear.json`).  The tile contract's
    per-axis span bound (< 2 voxels) caps the clipped floor-key span at 2,
    so the 8 interpolation corners span <= 4 cells per dim and always fit
    the 5-window at anchor ``2*floor(min_key/2)`` (either anchor parity).

    Per-point extraction builds ONE 128-lane one-hot at the point's base
    cell offset (base-5 ravel, <= 93) and reads each corner via a static
    lane roll of the channel slice — corner offsets are compile-time
    deltas {0,1,5,6,25,26,30,31}, and ``base + delta <= 124 < 125`` keeps
    every selected lane inside the real 125 cells.  The lerp accumulation
    mirrors ``gather_trilinear``'s exact corner order and weight-product
    order, so results equal the generic path's bit-for-bit (up to the sign
    of zero, which ``==`` ignores).

    Returns ``lookup(pts_c [1, B, seg, FS, 3], bricks5 [NB, 512]) ->
    (val [B, seg, FS], g_link [B, seg, FS, 3], win [B, seg, FS] int32)``
    with the union-lookup output contract, or just ``val`` with
    ``values_only=True`` (not differentiable; callers stop gradients).
    ``b5_sd``: (shape, dtype) of ``bricks5`` for the zero cotangent."""
    with jax.ensure_compile_time_eval():
        iota128 = jnp.arange(128, dtype=jnp.int32)

    nchan = 1 if values_only else 4

    def eval_single(pts_c, bricks5):
        B, FS = pts_c.shape[1], pts_c.shape[3]
        p = pts_c[0]                                    # [B, seg, FS, 3]
        f = (p - t.lo) / t.res
        # validity and cell selection mirror gather_trilinear exactly
        keys = jnp.round(f).astype(jnp.int32)
        valid = jnp.all((keys >= 0) & (keys < t.n), axis=-1)
        fc = jnp.clip(f, 0.0, (t.n - 1).astype(p.dtype))
        i0 = jnp.clip(jnp.floor(fc).astype(jnp.int32), 0, t.n - 2)
        w = fc - i0.astype(p.dtype)                     # [B, seg, FS, 3]
        corner2 = i0.min(axis=1) // 2                   # [B, FS, 3]
        bflat = jnp.sum(corner2 * t.bstrides, axis=-1)
        seg_valid = jnp.any(valid, axis=1)
        bflat = jnp.where(seg_valid, bflat,
                          _scattered_rows(bflat.shape, bricks5.shape[0]))
        rows = bricks5[bflat]                           # [B, FS, 512]
        # off in [0, 3] per dim under the tile contract (clipped floor-key
        # span <= 2 plus anchor parity; the +1 corner extent brings the max
        # read to off+1 <= 4, the 5-window edge) — the roll-based lane
        # extraction below relies on base+delta <= 124 < 125, which a
        # per-dim off of 4 would break (base 124 + delta 31 wraps)
        off = i0 - (corner2 * 2)[:, None, :, :]
        off5 = off[..., 0] * 25 + off[..., 1] * 5 + off[..., 2]
        oh = (off5[..., None] == iota128).astype(p.dtype)
        accs = [jnp.zeros(p.shape[:-1], p.dtype) for _ in range(nchan)]
        for corner in range(8):
            offs = [(corner >> d) & 1 for d in range(3)]
            delta = offs[0] * 25 + offs[1] * 5 + offs[2]
            # weight product in gather_trilinear's reduce order (x, y, z)
            wt = ((w[..., 0] if offs[0] else 1.0 - w[..., 0])
                  * (w[..., 1] if offs[1] else 1.0 - w[..., 1]))
            wt = wt * (w[..., 2] if offs[2] else 1.0 - w[..., 2])
            for c in range(nchan):
                ch = rows[:, None, :, c * 128:(c + 1) * 128]
                cell = jnp.sum(jnp.roll(ch, -delta, axis=-1) * oh, axis=-1)
                accs[c] = accs[c] + wt * cell
        v_oob, g_oob = _aabb_distance_grad(t.bb, p)
        val = jnp.where(valid, accs[0], v_oob)
        if values_only:
            return val
        g_link = jnp.where(valid[..., None],
                           jnp.stack(accs[1:4], axis=-1), g_oob)
        win = jnp.zeros((B, seg, FS), dtype=jnp.int32)
        return val, g_link, win

    if values_only:
        return eval_single

    @jax.custom_vjp
    def lookup(pts_c, bricks5):
        return eval_single(pts_c, bricks5)

    def fwd(pts_c, bricks5):
        val, g_link, win = eval_single(pts_c, bricks5)
        return (val, g_link, win), (g_link,)

    def bwd(residual, cotangents):
        (g_link,) = residual
        ct_val = cotangents[0]
        # straight-through: d val / d pts_c[0] = interpolated gradient field
        # (same contract as the generic trilinear path's custom VJP)
        d_pts = (ct_val[..., None] * g_link)[None]
        return (d_pts, jnp.zeros(b5_sd[0], b5_sd[1]))

    lookup.defvjp(fwd, bwd)
    return lookup


# NOTE (r4): the opt-in CULLED union (`cull_capacity` compaction of
# out-of-bounds (child, tile) pairs via static-size jnp.nonzero) was DELETED
# this round.  It was a hypothesis that never measured a win: at in-bounds
# fraction 0.10 cull took 96-105 ms vs 38-40 ms dense (TPU v5e,
# artifacts_r03/bench.json `tight_*` rows), and the loss decomposes as a
# ~85 ms compaction front-end (nonzero + meta gather + scatter over ALL
# pairs) that does not shrink with sparsity — so it cannot win at ANY
# in-bounds fraction for a fixed pair count.  See ARCHITECTURE.md
# "culled union (deleted)" and VERDICT r3 item 5.


def coherent_generic_aux(children: Sequence["ObjectFrameSDF"]):
    """``raw_query_aux`` pytrees of the children that take the GENERIC
    sub-path in :func:`compose_query_coherent` (in that order).  Thread it
    through your jit as an argument alongside ``fast_tables`` when any
    generic child carries big tables (trilinear/GT-fallback caches,
    narrow-band meshes)."""
    if _coherent_single_trilinear_child(children) is not None:
        return ()
    _, _, generic = _coherent_classify(children)
    return tuple(children[i].raw_query_aux() for i in generic)


def compose_query_coherent(children: Sequence[ObjectFrameSDF],
                           obj_to_link: jnp.ndarray, link_to_obj: jnp.ndarray,
                           batch: int, points: jnp.ndarray,
                           fast_tables=None, values_only: bool = False,
                           generic_aux=None, seg: int = COHERENT_SEG,
                           residual_frac: float = 0.04):
    """Min-union query like :func:`compose_query` but using the segmented
    brick-gather fast path for ``CachedSDF`` children.

    ``residual_frac``: static capacity of the per-TILE winner path's
    residual lane (the fraction of tiles allowed to have >= 3 distinct
    winning links — measured 1-6% on the benchmark workloads,
    benchmarks/winner_agreement.py), as a fraction of all (config, tile)
    pairs.  Tiles beyond capacity get NaN gradients (exact or LOUD; see
    :func:`_coherent_union_lookup_tile`).

    Contract: ``points [F, 3]`` with ``F % seg == 0`` and every consecutive
    ``seg``-point group's integer voxel keys landing inside one
    stride-2-anchored 4x4x4 brick for every cached child (for raster lines
    at ``seg=4`` that is spans of at most ``1.5 * resolution`` per dimension
    in world units; rigid transforms preserve this).  Use
    :func:`pytorch_volumetric_tpu.voxel.get_coherent_grid_points` (lines,
    ``seg=4``) or :func:`pytorch_volumetric_tpu.voxel.
    get_coherent_tile_points` (multi-dim tiles, larger ``seg``) to build a
    conforming layout; results are bit-identical to :func:`compose_query`.

    Children that are not nearest-neighbor BOUNDING_BOX ``CachedSDF``\\ s
    (analytic primitives, ``MeshSDF``, trilinear/GT-fallback caches) are
    evaluated on the generic per-point path and min-combined afterwards —
    EXCEPT a composition whose only child is a trilinear BOUNDING_BOX
    cache, which takes the 5x5x5-brick trilinear fast path
    (:func:`_coherent_single_trilinear_lookup`; new in r4).  That path,
    like every fast path here, REQUIRES the coherence contract above —
    callers that previously fed non-conforming points to a
    single-trilinear composition were already violating this function's
    contract (it merely happened to still be exact); they must use the
    generic ``__call__``/``compose_query`` path or conforming layouts.

    ``fast_tables``: optional ``_CoherentTables`` tuple for the
    coherent-fast children in child order, as built by
    :func:`coherent_fast_tables`.  Thread it through your jit as an
    ARGUMENT — the brick tables are 8x the value grids, and captured
    constants at that scale cost minutes of compile per retrace.  When
    omitted, tables are materialized at trace time as program constants
    (correct, but slow to compile for big robots).

    ``values_only=True`` returns just ``val [B, F]``, skipping the winner
    gradient gather and its carries (~10% of the value+gradient cost at
    north-star scale).  Inference only: gradients through the result are STOPPED
    (collision checks / occupancy rasters don't need them).
    """
    S = len(children)
    F = points.shape[0]
    if F % seg:
        raise ValueError(f"points count {F} must be a multiple of seg={seg}")
    FS = F // seg
    # transform with the segment axis ALREADY split AND second-minor:
    # [B, F] <-> [B, FS, seg] reshapes are chunked relayout while-loops on
    # TPU (~9.5 ms each at north-star scale — artifacts_r04/
    # full_stage_hlo.txt), and a minor seg axis pads to the 128-lane tile
    # (27 -> 128: 4.7x memory, OOMed the north-star chunk — engine_v2b.log),
    # so the engine works on [.., seg, FS] shapes end-to-end; only the
    # generic-child and final-output paths ever pay a relayout.  Permuting
    # the POINTS input here is one 12 MB transpose and the broadcasted
    # transform math is elementwise-identical to the flat version
    # (bit-exact).
    pts_sm = jnp.swapaxes(points.reshape(FS, seg, 3), 0, 1)  # [seg, FS, 3]
    pts_all = tfm.transform_points(obj_to_link[:, None], pts_sm).reshape(
        S, batch, seg, FS, 3)
    R_back = link_to_obj.reshape(S, batch, 4, 4)[..., :3, :3]

    def unflatten(x_sm, trailing=()):
        # [B, seg, FS(, 3)] engine output -> the caller-facing [B, F(, 3)]
        return jnp.swapaxes(x_sm, 1, 2).reshape((batch, F) + trailing)

    fast, tri_u, generic = _coherent_classify(children)
    if generic_aux is None:
        # trace-time fetch: correct, but captures any big generic-child
        # tables as program constants — thread coherent_generic_aux(children)
        # through your jit to avoid that
        generic_aux = tuple(children[i].raw_query_aux() for i in generic)

    def generic_query(k, i, pts_flat):
        if generic_aux[k] is None:
            return children[i].raw_query(pts_flat)
        return children[i].raw_query_with(generic_aux[k], pts_flat)

    # single trilinear child: the 5x5x5 brick fast path (one 2 KB row per
    # tile instead of 8 corner rows per point — _coherent_single_trilinear_
    # lookup).  Routed before the nearest-fast machinery: the trilinear
    # child classifies as "generic" above but never reaches that path here.
    tri_child = _coherent_single_trilinear_child(children)
    if tri_child is not None:
        if (fast_tables is not None and len(fast_tables) == 1
                and fast_tables[0].bricks5 is not None):
            b5 = fast_tables[0].bricks5
        else:
            b5 = tri_child._coherent_tables(
                with_tri_bricks=True, with_value_bricks=False).bricks5
        with jax.ensure_compile_time_eval():
            small = tri_child._coherent_tables(with_value_bricks=False)
        if values_only:
            values = _coherent_single_trilinear_lookup(
                small, (b5.shape, b5.dtype), seg=seg, values_only=True)
            val = values(jax.lax.stop_gradient(pts_all[0][None]),
                         jax.lax.stop_gradient(b5))
            return unflatten(val)
        lookup = _coherent_single_trilinear_lookup(
            small, (b5.shape, b5.dtype), seg=seg)
        val, g_link, _ = lookup(pts_all[0][None], b5)
        g = tfm.rotate_vectors(R_back[0][:, None], g_link)
        return unflatten(val), unflatten(g, (3,))

    if values_only and not fast and not tri_u:
        best_v = None
        for k, i in enumerate(generic):
            v, _ = generic_query(
                k, i, jax.lax.stop_gradient(pts_all[i].reshape(batch * F, 3)))
            v = v.reshape(batch, seg, FS)
            best_v = v if best_v is None else jnp.minimum(best_v, v)
        return unflatten(best_v)

    best_v = best_g = best_i = None
    if tri_u:
        # multi-child TRILINEAR union (r5): value lerp from 5x5x5 value
        # bricks per (child, tile), winner gradient from per-tile candidate
        # gradient bricks — see _coherent_union_lookup_tile_tri
        if fast_tables is not None:
            ttables = fast_tables
            if len(ttables) != len(tri_u):
                raise ValueError(
                    f"fast_tables holds {len(ttables)} table sets but "
                    f"{len(tri_u)} children take the trilinear union path")
        else:
            ttables = [children[i]._coherent_tables(
                with_value_bricks=False, with_tri_value_bricks=True,
                with_tri_gradonly_bricks=True) for i in tri_u]
        with jax.ensure_compile_time_eval():
            smalls = [children[i]._coherent_tables(with_value_bricks=False)
                      for i in tri_u]
        tb_sd = [(t.tbricks.shape, t.tbricks.dtype) for t in ttables]
        pts_tri = jnp.stack([pts_all[i] for i in tri_u])
        if values_only:
            values = _coherent_union_lookup_tile_tri(
                smalls, tb_sd, None, None, None, seg=seg, values_only=True)
            best_v = values(jax.lax.stop_gradient(pts_tri),
                            tuple(jax.lax.stop_gradient(t.tbricks)
                                  for t in ttables))
            for k, i in enumerate(generic):
                v, _ = generic_query(
                    k, i,
                    jax.lax.stop_gradient(pts_all[i].reshape(batch * F, 3)))
                best_v = jnp.minimum(best_v, v.reshape(batch, seg, FS))
            return unflatten(best_v)
        vg_cat = jnp.concatenate([t.vg for t in ttables], axis=0)
        tg_cat = jnp.concatenate([t.tgbricks for t in ttables], axis=0)
        rb = jnp.stack([R_back[i] for i in tri_u])       # [C, B, 3, 3]
        lookup = _coherent_union_lookup_tile_tri(
            smalls, tb_sd, (tg_cat.shape, tg_cat.dtype),
            (vg_cat.shape, vg_cat.dtype), (rb.shape, rb.dtype), seg=seg,
            residual_frac=residual_frac)
        val, best_g, win = lookup(pts_tri,
                                  tuple(t.tbricks for t in ttables),
                                  tg_cat, vg_cat, rb)
        best_i = jnp.zeros(val.shape, dtype=jnp.int32)
        for ci, i in enumerate(tri_u):
            best_i = jnp.where(win == ci, i, best_i)
        best_v = val
    if fast:
        if fast_tables is not None:
            tables = fast_tables
            if len(tables) != len(fast):
                raise ValueError(
                    f"fast_tables holds {len(tables)} table sets but "
                    f"{len(fast)} children take the coherent fast path")
        else:
            tables = [children[i]._coherent_tables(
                with_grad_bricks=len(fast) == 1,
                with_gradonly_bricks=len(fast) > 1) for i in fast]
        # the tiny per-child fields (lo/res/dims/strides/bb) must be
        # trace-time CONSTANTS even when tables arrive as jit-argument
        # tracers: as traced values XLA emits a true division for
        # (p - lo)/res where the generic path's constant folds to a
        # reciprocal multiply, and the 1-ulp quotient difference flips
        # borderline round()s by one voxel — breaking the bit-exactness
        # contract.  Only the big brick arrays stay arguments.
        with jax.ensure_compile_time_eval():
            smalls = [children[i]._coherent_tables() for i in fast]
        if values_only:
            pts_fast = jax.lax.stop_gradient(
                jnp.stack([pts_all[i] for i in fast]))
            values = _coherent_union_values(smalls, seg=seg)
            best_v = values(pts_fast, tuple(t.bricks for t in tables))
            for k, i in enumerate(generic):
                v, _ = generic_query(
                    k, i,
                    jax.lax.stop_gradient(pts_all[i].reshape(batch * F, 3)))
                best_v = jnp.minimum(best_v, v.reshape(batch, seg, FS))
            return unflatten(best_v)
        if len(fast) == 1 and tables[0].bricks4 is not None:
            # single cached child: no union to win, so skip the per-point
            # winner rows entirely — (value, gradient) ride one 4-channel
            # brick row per tile (see _coherent_single_lookup)
            lookup = _coherent_single_lookup(
                smalls[0], (tables[0].bricks4.shape, tables[0].bricks4.dtype),
                seg=seg)
            val, g_link, _ = lookup(pts_all[fast[0]][None], tables[0].bricks4)
            best_v = val
            best_g = tfm.rotate_vectors(R_back[fast[0]][:, None], g_link)
            best_i = jnp.full(val.shape, fast[0], dtype=jnp.int32)
        elif all(t.gbricks is not None for t in tables):
            # per-TILE winner fast path (r5): winner gradients ride 768 B
            # gradient-brick rows per tile — the per-point 16 B row gather
            # is row-rate bound (59% of the r4 forward) and no address
            # trick can cheapen it (_coherent_union_lookup_tile docstring)
            vg_cat = jnp.concatenate([t.vg for t in tables], axis=0)
            g_cat = jnp.concatenate([t.gbricks for t in tables], axis=0)
            rb = jnp.stack([R_back[i] for i in fast])    # [C, B, 3, 3]
            lookup = _coherent_union_lookup_tile(
                smalls,
                [(t.bricks.shape, t.bricks.dtype) for t in tables],
                (g_cat.shape, g_cat.dtype), (vg_cat.shape, vg_cat.dtype),
                (rb.shape, rb.dtype), seg=seg, residual_frac=residual_frac)
            val, best_g, win = lookup(
                jnp.stack([pts_all[i] for i in fast]),
                tuple(t.bricks for t in tables), g_cat, vg_cat, rb)
            best_i = jnp.zeros(val.shape, dtype=jnp.int32)
            for ci, i in enumerate(fast):
                best_i = jnp.where(win == ci, i, best_i)
            best_v = val
        else:
            # legacy per-point winner rows (fast_tables built without
            # gradient bricks): the children's packed [G, 4] tables
            # concatenated in child order.  When tables arrive as jit
            # arguments the concat is ONE device op per dispatch, hoisted out
            # of any scan (~0.2 ms at HBM bandwidth for the 8-link headline
            # robot) — far cheaper than the ~26% end-to-end cost of carrying
            # gradient channels inside the brick rows (_coherent_union_lookup).
            vg_cat = jnp.concatenate([t.vg for t in tables], axis=0)
            lookup = _coherent_union_lookup(
                smalls,
                [(t.bricks.shape, t.bricks.dtype) for t in tables],
                (vg_cat.shape, vg_cat.dtype), seg=seg)
            val, g_link, win = lookup(
                jnp.stack([pts_all[i] for i in fast]),
                tuple(t.bricks for t in tables), vg_cat)
            best_g = jnp.zeros(g_link.shape, dtype=g_link.dtype)
            best_i = jnp.zeros(val.shape, dtype=jnp.int32)
            for ci, i in enumerate(fast):
                mask = win == ci
                g_rot = tfm.rotate_vectors(R_back[i][:, None], g_link)
                best_g = jnp.where(mask[..., None], g_rot, best_g)
                best_i = jnp.where(mask, i, best_i)
            best_v = val
    for k, i in enumerate(generic):
        v, g = generic_query(k, i, pts_all[i].reshape(batch * F, 3))
        v = v.reshape(batch, seg, FS)
        g = tfm.rotate_vectors(R_back[i][:, None],
                               g.reshape(batch, seg, FS, 3))
        if best_v is None:
            best_v, best_g = v, g
            best_i = jnp.full(v.shape, i, dtype=jnp.int32)
        else:
            # tie-break on the ORIGINAL child index so exact-tie winners (and
            # their gradients) match compose_query's first-wins index order,
            # even though fast children were evaluated first here
            better = (v < best_v) | ((v == best_v) & (i < best_i))
            best_v = jnp.where(better, v, best_v)
            best_g = jnp.where(better[..., None], g, best_g)
            best_i = jnp.where(better, i, best_i)
    return unflatten(best_v), unflatten(best_g, (3,))


class ComposedSDF(ObjectFrameSDF):
    def __init__(self, sdfs: Sequence[ObjectFrameSDF],
                 obj_frame_to_each_frame: Optional[tfm.Transform3d] = None):
        """
        :param sdfs: S object-frame SDFs
        :param obj_frame_to_each_frame: ``[B*]S x 4 x 4`` transforms from the
            shared object frame to each SDF's frame, flattened link-major
            (reference sdf.py:333-345).
        """
        self.sdfs = list(sdfs)
        self.obj_frame_to_link_frame: Optional[tfm.Transform3d] = None
        self.link_frame_to_obj_frame: Optional[jnp.ndarray] = None
        self.tsf_batch = None
        self._compose_jit = None
        self._coherent_jits = {}  # (values_only, seg) -> jitted program
        self.set_transforms(obj_frame_to_each_frame)

    def set_transforms(self, tsf: Optional[tfm.Transform3d], batch_dim=None):
        self.obj_frame_to_link_frame = tsf
        prev_batch = self.tsf_batch
        self.tsf_batch = tuple(batch_dim) if batch_dim is not None else None
        if tsf is not None:
            S = len(self.sdfs)
            S_tsf = len(tsf)
            if self.tsf_batch is None and S_tsf != S:
                assert S_tsf % S == 0, (S_tsf, S)
                self.tsf_batch = (S_tsf // S,)
            self.link_frame_to_obj_frame = tfm.invert_tf(tsf.get_matrix())
        if prev_batch != self.tsf_batch:
            self._compose_jit = None  # batch size is a static arg: re-jit
            self._coherent_jits = {}

    def ith_transform_slice(self, i):
        if self.tsf_batch is None:
            return slice(i, i + 1)
        total = math.prod(self.tsf_batch)
        return slice(i * total, (i + 1) * total)

    @property
    def _batch(self) -> int:
        return math.prod(self.tsf_batch) if self.tsf_batch is not None else 1

    def raw_query(self, points):
        vv, gg = compose_query(tuple(s.raw_query for s in self.sdfs),
                               self.obj_frame_to_link_frame.get_matrix(),
                               self.link_frame_to_obj_frame, self._batch, points)
        return vv, gg

    def __call__(self, points_in_object_frame):
        pts = as_float_array(points_in_object_frame)
        pts_batch = pts.shape[:-1]
        flat = pts.reshape(-1, pts.shape[-1])
        if self._compose_jit is None:
            children_with = tuple(s.raw_query_with for s in self.sdfs)
            B = self._batch

            # children's big tables (e.g. NarrowBandMeshSDF candidate
            # lists) ride in as jit arguments via raw_query_aux, not as
            # captured constants: constants serialize into the program and
            # cost minutes of compile per retrace at GB scale
            def fn(points, m, m_inv, aux):
                queries = tuple(
                    functools.partial(child, a)
                    for child, a in zip(children_with, aux))
                return compose_query(queries, m, m_inv, B, points)

            self._compose_jit = jax.jit(fn)
        aux = tuple(s.raw_query_aux() for s in self.sdfs)
        vv, gg = self._compose_jit(flat, self.obj_frame_to_link_frame.get_matrix(),
                                   self.link_frame_to_obj_frame, aux)
        if self.tsf_batch is not None:
            out_batch = self.tsf_batch + pts_batch
        else:
            out_batch = pts_batch
            vv, gg = vv[0], gg[0]
        return vv.reshape(out_batch), gg.reshape(out_batch + (pts.shape[-1],))

    def check_coherent_contract(self, points_in_object_frame,
                                seg: int = COHERENT_SEG) -> bool:
        """True iff every consecutive ``seg``-point group of ``points`` lands
        inside its 4x4x4 brick for every cached child under the current
        transforms (the correctness precondition of :meth:`query_coherent`).
        Host-side debug helper — an analog of the reference's
        ``debug_check_sdf`` (reference sdf.py:573-590)."""
        pts = as_float_array(points_in_object_frame)
        m = self.obj_frame_to_link_frame.get_matrix()
        S, B, F = len(self.sdfs), self._batch, pts.shape[0]
        if F % seg:
            return False
        pts_all = np.asarray(tfm.transform_points(m, pts)).reshape(S, B, F, 3)
        tri = _coherent_single_trilinear_child(self.sdfs)
        fast_idx, tri_idx, _ = _coherent_classify(self.sdfs)
        tri_set = set(tri_idx)
        for i, s in enumerate(self.sdfs):
            is_tri = s is tri or i in tri_set
            if not (i in fast_idx or is_tri):
                continue
            # only the tiny grid fields are needed — do NOT trigger the lazy
            # 8x brick-table device build just to gate the fast path (f32
            # casts match the device tables' arithmetic)
            lo = np.asarray(s.voxels.lo, dtype=np.float32)
            res = np.asarray(s.voxels.res, dtype=np.float32)
            n = np.asarray(s.voxels.shape)
            f = (pts_all[i] - lo) / res
            if is_tri:
                # trilinear: the 8 interpolation corners of the clipped
                # floor cell must fit the 5-window at the stride-2 anchor
                fc = np.clip(f, 0.0, (n - 1).astype(np.float32))
                i0 = np.clip(np.floor(fc), 0, n - 2).astype(np.int64)
                ks = i0.reshape(B, F // seg, seg, 3)
                corner = 2 * (ks.min(axis=2) // 2)
                if (ks.max(axis=2) + 1 - corner).max() > 4:
                    return False
                continue
            k = np.round(f)
            kc = np.clip(k, 0, n - 1).astype(np.int64)
            ks = kc.reshape(B, F // seg, seg, 3)
            corner = 2 * (ks.min(axis=2) // 2)
            if (ks.max(axis=2) - corner).max() > 3:
                return False
        return True

    def query_coherent(self, points_in_object_frame, debug_check=False,
                       values_only: bool = False, seg: int = COHERENT_SEG):
        """Like ``__call__`` but on spatially-coherent points (consecutive
        groups of ``seg`` points each landing in one 4x4x4 voxel brick; see
        :func:`compose_query_coherent`).  Bit-identical results, ``seg``-x
        fewer gather rows for cached children on TPU.  Points must be flat
        ``[F, 3]`` with ``F % seg == 0``.  ``debug_check=True`` verifies the
        coherence contract on host first and raises on violation.
        ``values_only=True`` returns just the values (skips the winner rows;
        gradients stopped — inference only).  ``seg``: points per brick row —
        4 for classic raster lines (:func:`voxel.get_coherent_grid_points`),
        or the tile size returned by :func:`voxel.get_coherent_tile_points`
        for multi-dimensional tiles (12/27 at the standard 2x ratio)."""
        pts = as_float_array(points_in_object_frame)
        if debug_check and not self.check_coherent_contract(pts, seg=seg):
            raise ValueError(
                f"points violate the coherence contract (a {seg}-point group "
                "spans more than its 4x4x4 voxel brick for some cached child); "
                "use get_coherent_grid_points / get_coherent_tile_points or "
                "the generic __call__ path")
        key = (bool(values_only), int(seg))
        if self._coherent_jits.get(key) is None:
            children = tuple(self.sdfs)
            B = self._batch

            def fn(points, m, m_inv, fast_tables, generic_aux):
                return compose_query_coherent(children, m, m_inv, B, points,
                                              fast_tables=fast_tables,
                                              values_only=values_only,
                                              generic_aux=generic_aux,
                                              seg=seg)

            self._coherent_jits[key] = jax.jit(fn)
        # brick tables AND generic children's big tables ride in as
        # arguments, not captured constants (constants at that scale cost
        # minutes of compile per retrace)
        out = self._coherent_jits[key](
            pts, self.obj_frame_to_link_frame.get_matrix(),
            self.link_frame_to_obj_frame, coherent_fast_tables(self.sdfs),
            coherent_generic_aux(self.sdfs))
        F = pts.shape[0]
        if values_only:
            vv = out
            if self.tsf_batch is None:
                return vv[0]
            return vv.reshape(self.tsf_batch + (F,))
        vv, gg = out
        if self.tsf_batch is None:
            return vv[0], gg[0]
        # restore multi-dim configuration batches like __call__ does
        return (vv.reshape(self.tsf_batch + (F,)),
                gg.reshape(self.tsf_batch + (F, pts.shape[-1])))

    def get_voxel_view(self, voxels: Optional[VoxelGrid] = None,
                       dtype=jnp.float32, device=None) -> GridView:
        """Rasterize the union onto a voxel grid (reference sdf.py:248-264).
        A voxel raster is exactly the coherent tile path's shape, so when the
        contract holds this runs one brick gather per 27-point tile per
        cached child instead of one gather per (child, point)."""
        if voxels is None:
            bb = np.asarray(self.surface_bounding_box(padding=0.1))
            voxels = VoxelGrid(0.01, bb, dtype=dtype)
        if self.tsf_batch is not None:
            # batched transforms: keep the generic base behavior/shape rules
            return super().get_voxel_view(voxels, dtype=dtype, device=device)
        shape = [len(c) for c in voxels.coords]
        min_res = coherent_min_cache_resolution(self.sdfs)
        vals = None
        if min_res is not None:  # only build the tile layout when usable
            pts_t, take, seg = get_coherent_tile_points(
                voxels.resolution, voxels.range_per_dim,
                cache_resolution=min_res)
            if self.check_coherent_contract(pts_t, seg=seg):
                vals = self.query_coherent(pts_t, seg=seg,
                                           values_only=True)[take]
        if vals is None:
            vals, _ = self(voxels.get_voxel_center_points())
        return GridView(vals.reshape(shape), voxels.range_per_dim,
                        invalid_value=lambda p: self(p)[0])

    def surface_bounding_box(self, **kwargs):
        """Batched AABB of the union: per-child AABB corners transformed into
        the object frame, then min/max over children and corners
        (reference sdf.py:347-368, using all 8 corners for correctness under
        rotation)."""
        m_inv = self.link_frame_to_obj_frame  # [S*B, 4, 4]
        S = len(self.sdfs)
        B = self._batch
        bounds = []
        for i, sdf in enumerate(self.sdfs):
            corners = aabb_corners(sdf.surface_bounding_box(**kwargs))
            sl = self.ith_transform_slice(i)
            pts = tfm.transform_points(m_inv[sl], corners)  # [B, 8, 3]
            bounds.append(pts)
        bounds = jnp.stack(bounds)  # [S, B, 8, 3]
        if self.tsf_batch is not None:
            mins = bounds.min(axis=(0, 2))
            maxs = bounds.max(axis=(0, 2))
            out = jnp.stack((mins, maxs), axis=-1)  # [B, 3, 2]
            return out.reshape(self.tsf_batch + (3, 2))
        mins = bounds.min(axis=(0, 1, 2))
        maxs = bounds.max(axis=(0, 1, 2))
        return jnp.stack((mins, maxs), axis=-1)


# ---------------------------------------------------------------------------
# Cached (voxelized) SDF (reference sdf.py:436-614)
# ---------------------------------------------------------------------------

class OutOfBoundsStrategy(enum.Enum):
    LOOKUP_GT_SDF = 0
    BOUNDING_BOX = 1  # under-approximates the SDF value


DEFAULT_CACHE_PATH = "sdf_cache.npz"

GRID_SWEEP_CHUNK = 131072


def _grid_sweep(gt_sdf: "ObjectFrameSDF", pts: jnp.ndarray,
                chunk: int = GRID_SWEEP_CHUNK):
    """Evaluate ``gt_sdf`` over a large grid, chunked with ``lax.map`` inside
    a single jitted program: peak device memory stays bounded by one chunk of
    the triangle sweep while paying ONE dispatch and ONE host fetch — the
    per-dispatch floor over tunneled TPU transports (~33 ms) made a host-side
    chunk loop 20x slower on large builds (the expensive CachedSDF build
    step, reference sdf.py:502-503)."""
    P, d = pts.shape
    if P <= chunk:
        val, grad = gt_sdf(pts)
        return np.asarray(val), np.asarray(grad).reshape(-1, d)
    n = (P + chunk - 1) // chunk
    pad = n * chunk - P
    pts_padded = jnp.pad(pts, ((0, pad), (0, 0))) if pad else pts
    logger.info("grid sweep: %d points in %d chunks", P, n)
    # thread the ground truth's big tables (narrow-band candidates, cached
    # grids) as jit ARGUMENTS, not captured constants (CLAUDE.md rule)
    aux = gt_sdf.raw_query_aux()
    if aux is None:
        raw = gt_sdf.raw_query

        @jax.jit
        def sweep(pc):
            return jax.lax.map(raw, pc)

        v, g = sweep(pts_padded.reshape(n, chunk, d))
    else:
        leaves, treedef = jax.tree_util.tree_flatten(aux)

        @jax.jit
        def sweep_aux(pc, *aux_leaves):
            a = jax.tree_util.tree_unflatten(treedef, aux_leaves)
            return jax.lax.map(lambda p: gt_sdf.raw_query_with(a, p), pc)

        v, g = sweep_aux(pts_padded.reshape(n, chunk, d), *leaves)
    return (np.asarray(v).reshape(-1)[:P],
            np.asarray(g).reshape(-1, d)[:P])


class CachedSDF(ObjectFrameSDF):
    """SDF by nearest-voxel lookup of precomputed value + gradient grids
    (reference sdf.py:441-614).

    The grid build sweeps the ground-truth SDF over the snapped range and
    persists to an ``.npz`` store keyed ``"{name} {resolution} {range}"``
    (matching the reference's cache-key format, sdf.py:484).  Queries are a
    raveled gather — bandwidth-bound and the hot path of robot-SDF workloads.
    Out-of-bounds queries either recurse into the ground truth or use the
    distance-to-AABB under-approximation (reference sdf.py:553-571).

    Additions over the reference: optional ``interpolation="trilinear"``
    (smooth value/gradient instead of nearest-voxel staircase), and the
    segmented brick-gather fast path for coherent sweeps (the value-brick
    tables cost 8x the value grid in device memory from the stride-2 brick
    overlap, and are built lazily on first coherent query).
    """

    def __init__(self, object_name, resolution, range_per_dim,
                 gt_sdf: Optional[ObjectFrameSDF],
                 out_of_bounds_strategy=OutOfBoundsStrategy.BOUNDING_BOX,
                 device=None, clean_cache=False, debug_check_sdf=False,
                 cache_path: str = DEFAULT_CACHE_PATH,
                 interpolation: str = "nearest"):
        self.device = device
        self.gt_sdf = gt_sdf
        self.resolution = float(resolution)
        self.out_of_bounds_strategy = out_of_bounds_strategy
        self.debug_check_sdf = debug_check_sdf
        self.interpolation = interpolation

        bb = np.asarray(range_per_dim, dtype=np.float64)
        num_voxel = (bb[:, 1] - bb[:, 0]) // resolution
        if num_voxel.min() < 10:
            logger.warning("Resolution %s is too high for %s, only getting %s voxels",
                           resolution, object_name, num_voxel)

        range_per_dim = get_divisible_range_by_resolution(resolution, range_per_dim)
        self.ranges = np.array(range_per_dim)
        self.name = f"{object_name} {resolution} {tuple(range_per_dim)}"

        store = get_store(cache_path)
        cached = None if clean_cache else store.get(self.name)
        self._stored_bb = None
        if cached is not None:
            val_np, grad_np = cached[0], cached[1]
            if len(cached) > 2:  # tight surface bb persisted with the grids
                self._stored_bb = np.asarray(cached[2])
            logger.info("cached sdf for %s loaded from %s", self.name, cache_path)
        else:
            if gt_sdf is None:
                raise RuntimeError(
                    "Cached SDF did not find the cache and requires an initial "
                    "queryable SDF")
            coords, pts = get_coordinates_and_points_in_grid(
                self.resolution, self.ranges)
            val_np, grad_np = _grid_sweep(gt_sdf, pts)
            shape = [len(c) for c in coords]
            val_np = val_np.reshape(shape)
            self._stored_bb = np.asarray(gt_sdf.surface_bounding_box())
            store.put(self.name, [val_np, grad_np, self._stored_bb])
            logger.info("caching sdf for %s to %s", self.name, cache_path)

        self.voxels = GridView(jnp.asarray(val_np, dtype=jnp.float32), range_per_dim,
                               invalid_value=self._fallback_sdf_value_func)
        self.voxels_grad = jnp.asarray(grad_np, dtype=jnp.float32)

        gt_bb = self.surface_bounding_box()
        self.bb = jnp.asarray(np.asarray(gt_bb), dtype=jnp.float32)
        self._build_raw()

    def _build_raw(self):
        shape = self.voxels.shape
        lo = jnp.asarray(self.voxels.lo, dtype=jnp.float32)
        res = jnp.asarray(self.voxels.res, dtype=jnp.float32)
        n = jnp.asarray(shape, dtype=jnp.int32)
        strides = jnp.asarray(self.voxels._strides, dtype=jnp.int32)
        # pack (value, grad) into one [G, 4] row per voxel: TPU gathers are
        # row-count-bound (~190M rows/s), so one 16B row gather is 2x cheaper
        # than separate value + gradient gathers
        vg = jnp.concatenate(
            [self.voxels.raw_data.reshape(-1, 1), self.voxels_grad], axis=1)
        self._vg = vg  # shared with the coherent-path tables (one HBM copy)
        bb = self.bb
        strategy = self.out_of_bounds_strategy
        gt_raw = self.gt_sdf.raw_query if self.gt_sdf is not None else None
        trilinear = self.interpolation == "trilinear"

        def gather_nearest(vg, pts):
            keys = jnp.round((pts - lo) / res).astype(jnp.int32)
            valid = jnp.all((keys >= 0) & (keys < n), axis=-1)
            flat_idx = jnp.sum(jnp.clip(keys, 0, n - 1) * strides, axis=-1)
            # out-of-bounds lanes read SCATTERED filler rows (discarded by
            # the select below): duplicated addresses serialize on HBM banks
            # (1.75x slower than scattered — see _scattered_rows)
            flat_idx = jnp.where(valid, flat_idx,
                                 _scattered_rows(flat_idx.shape, vg.shape[0]))
            rows = vg[flat_idx]
            return rows[..., 0], rows[..., 1:4], valid

        def gather_trilinear(vg, pts):
            f = (pts - lo) / res
            # valid if the nearest-voxel key is in range (same contract as
            # nearest mode); interpolation cell is clamped to the grid
            keys = jnp.round(f).astype(jnp.int32)
            valid = jnp.all((keys >= 0) & (keys < n), axis=-1)
            f = jnp.clip(f, 0.0, (n - 1).astype(pts.dtype))
            i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, n - 2)
            w = f - i0.astype(pts.dtype)
            acc = jnp.zeros(pts.shape[:-1] + (4,), dtype=pts.dtype)
            for corner in range(8):
                offs = jnp.asarray([(corner >> d) & 1 for d in range(3)],
                                   dtype=jnp.int32)
                idx = i0 + offs
                wt = jnp.prod(jnp.where(offs == 1, w, 1.0 - w), axis=-1)
                flat_idx = jnp.sum(idx * strides, axis=-1)
                # out-of-bounds lanes read scattered filler rows (discarded
                # by the caller's select; see gather_nearest/_scattered_rows)
                flat_idx = jnp.where(valid, flat_idx,
                                     _scattered_rows(flat_idx.shape,
                                                     vg.shape[0]))
                acc = acc + wt[..., None] * vg[flat_idx]
            return acc[..., 0], acc[..., 1:4], valid

        gather = gather_trilinear if trilinear else gather_nearest

        def raw_with(vg, pts):
            val_in, grad_in, valid = gather(vg, pts)
            if strategy == OutOfBoundsStrategy.BOUNDING_BOX:
                # distance to the surface AABB: always an under-approximation
                val_oob, g_oob = _aabb_distance_grad(bb, pts)
            else:
                if gt_raw is None:
                    raise RuntimeError("LOOKUP_GT_SDF requires a ground-truth SDF")
                val_oob, g_oob = gt_raw(pts)
            val = jnp.where(valid, val_in, val_oob)
            grad = jnp.where(valid[..., None], grad_in, g_oob)
            return val, grad

        # classic path: vg as a concrete closure value (fine standalone);
        # aux path: vg as an explicit custom_vjp argument with a zero
        # cotangent, so ComposedSDF unions and exported artifacts carry the
        # table as a program INPUT instead of a serialized constant
        self._raw = _straight_through_sdf(functools.partial(raw_with, vg))
        self._raw_aux = _straight_through_sdf(
            raw_with, aux_specs=((vg.shape, vg.dtype),))
        self._jit_cache = None

    def raw_query(self, points):
        return self._raw(points)

    def raw_query_aux(self):
        return self._vg

    def raw_query_with(self, aux, points):
        return self._raw_aux(aux, points)

    def _coherent_tables(self, with_grad_bricks: bool = False,
                         with_tri_bricks: bool = False,
                         with_value_bricks: bool = True,
                         with_gradonly_bricks: bool = False,
                         with_tri_value_bricks: bool = False,
                         with_tri_gradonly_bricks: bool = False) \
            -> _CoherentTables:
        """Static tables for the segmented brick-gather fast path (built once,
        lazily): the packed (value, grad) rows plus overlapping 4x4x4 bricks
        of VALUE cells at stride 2 per dimension (gradients come from a
        single winner row of the packed table, not the bricks — see
        _coherent_union_lookup).  ``with_grad_bricks=True`` additionally
        builds the 4-channel ``bricks4`` table (32x grid memory) for the
        winner-row-free single-child layout (_coherent_single_lookup);
        ``with_tri_bricks=True`` builds the 5x5x5 4-channel ``bricks5``
        table for the single-child TRILINEAR fast path
        (_coherent_single_trilinear_lookup).  ``with_value_bricks=False``
        skips the 4x4x4 value-brick build for callers that only need the
        tiny fields or the trilinear table (a trilinear-only child never
        reads ``bricks`` — building it would waste 8x grid memory AND
        thread a dead jit argument, the same waste class bricks4-stripping
        avoids for multi-child unions).  Upgrades a previously built cache
        in place."""
        c = getattr(self, "_coherent_cache", None)
        if (c is not None and (not with_grad_bricks or c.bricks4 is not None)
                and (not with_tri_bricks or c.bricks5 is not None)
                and (not with_value_bricks or c.bricks is not None)
                and (not with_gradonly_bricks or c.gbricks is not None)
                and (not with_tri_value_bricks or c.tbricks is not None)
                and (not with_tri_gradonly_bricks
                     or c.tgbricks is not None)):
            return c
        return self._build_coherent_tables(
            with_grad_bricks=with_grad_bricks,
            with_tri_bricks=with_tri_bricks,
            with_value_bricks=with_value_bricks,
            with_tri_value_bricks=with_tri_value_bricks,
            with_tri_gradonly_bricks=with_tri_gradonly_bricks,
            with_gradonly_bricks=with_gradonly_bricks)

    def _brick_expand(self, vol: jnp.ndarray, nb: np.ndarray,
                      width: int = 4) -> jnp.ndarray:
        """Overlapping stride-2 ``width^3`` brick rows of a (possibly
        multi-channel) padded volume: ``[npad_x, npad_y, npad_z(, CH)] ->
        [NB, width^3(*CH)]`` rows, cell-major (channel-minor)."""
        trailing = vol.shape[3:]
        parts = []
        for ux in range(width):
            for uy in range(width):
                for uz in range(width):
                    parts.append(jax.lax.slice(
                        vol, (ux, uy, uz) + (0,) * len(trailing),
                        (ux + 2 * int(nb[0] - 1) + 1,
                         uy + 2 * int(nb[1] - 1) + 1,
                         uz + 2 * int(nb[2] - 1) + 1) + trailing,
                        (2, 2, 2) + (1,) * len(trailing)))
        # cell-major rows: [NB, width^3 cells (x CH channels)]
        return jnp.stack(parts, axis=3).reshape(
            -1, width ** 3 * int(np.prod(trailing, dtype=np.int64)))

    def _build_coherent_tables(self, with_grad_bricks: bool = False,
                               with_tri_bricks: bool = False,
                               with_value_bricks: bool = True,
                               with_gradonly_bricks: bool = False,
                               with_tri_value_bricks: bool = False,
                               with_tri_gradonly_bricks: bool = False) \
            -> _CoherentTables:
        # device-side build from the already-resident (value, grad) rows: the
        # 8x brick expansion never crosses the (slow, tunneled) host link.
        # ensure_compile_time_eval keeps everything concrete even when this
        # lazy init is reached inside a jit/grad trace.
        n = np.asarray(self.voxels.shape, dtype=np.int64)
        nb = (n - 1) // 2 + 1          # brick-corner grid dims
        npad = 2 * nb + 2              # max corner 2*(nb-1) + brick extent 4
        bstrides = np.array([nb[1] * nb[2], nb[2], 1], dtype=np.int64)
        pad_spec = [(0, int(npad[d] - n[d])) for d in range(3)]
        with jax.ensure_compile_time_eval():
            prev = getattr(self, "_coherent_cache", None)
            # upgrade in place: reuse already-built tables, add only the
            # newly requested ones
            bricks = prev.bricks if prev is not None else None
            if with_value_bricks and bricks is None:
                vol = self._vg[:, 0].reshape(tuple(int(d) for d in n))
                bricks = self._brick_expand(jnp.pad(vol, pad_spec), nb)
            bricks4 = prev.bricks4 if prev is not None else None
            bricks5 = prev.bricks5 if prev is not None else None
            vol4 = None
            if with_grad_bricks and bricks4 is None:
                vol4 = self._vg.reshape(tuple(int(d) for d in n) + (4,))
                b4 = self._brick_expand(
                    jnp.pad(vol4, pad_spec + [(0, 0)]), nb)
                # channel-major rows [v x64 | gx x64 | gy x64 | gz x64]:
                # lets the lookup slice each channel contiguously instead
                # of splitting the row minor dim 256 -> (64, 4) (a TPU
                # relayout + 4-wide lane waste; see _coherent_single_lookup)
                bricks4 = jnp.swapaxes(
                    b4.reshape(-1, 64, 4), 1, 2).reshape(-1, 256)
            gbricks = prev.gbricks if prev is not None else None
            if with_gradonly_bricks and gbricks is None:
                # gradient-only channel-major rows [gx x64 | gy x64 | gz x64]
                # (768 B) for the multi-child per-TILE winner fast path —
                # 24x grid memory (vs bricks4's 32x: no value channel; the
                # union's values keep riding the cheap 256 B value bricks)
                vol3 = self._vg[:, 1:4].reshape(tuple(int(d) for d in n)
                                                + (3,))
                g3 = self._brick_expand(jnp.pad(vol3, pad_spec + [(0, 0)]),
                                        nb)
                gbricks = jnp.swapaxes(
                    g3.reshape(-1, 64, 3), 1, 2).reshape(-1, 192)
            # 5x5x5 windows need one more padded cell (anchor 2*(nb-1)
            # + extent 5) than the 4x4x4 expansion's npad
            pad5 = [(0, int(npad[d] + 1 - n[d])) for d in range(3)]
            if with_tri_bricks and bricks5 is None:
                if vol4 is None:
                    vol4 = self._vg.reshape(tuple(int(d) for d in n) + (4,))
                b5 = self._brick_expand(
                    jnp.pad(vol4, pad5 + [(0, 0)]), nb, width=5)
                # channel-major with each 125-cell channel padded to 128
                # lanes: [v x128 | gx x128 | gy x128 | gz x128]
                b5 = jnp.swapaxes(b5.reshape(-1, 125, 4), 1, 2)
                bricks5 = jnp.pad(b5, ((0, 0), (0, 0), (0, 3))).reshape(
                    -1, 512)
            tbricks = prev.tbricks if prev is not None else None
            if with_tri_value_bricks and tbricks is None:
                # value-only 5x5x5 rows, lane-padded 125 -> 128 (512 B) for
                # the multi-child trilinear union's value lerp
                vol1 = self._vg[:, 0].reshape(tuple(int(d) for d in n))
                tb = self._brick_expand(jnp.pad(vol1, pad5), nb, width=5)
                tbricks = jnp.pad(tb, ((0, 0), (0, 3)))
            tgbricks = prev.tgbricks if prev is not None else None
            if with_tri_gradonly_bricks and tgbricks is None:
                # gradient-only 5x5x5 channel-major rows
                # [gx x128 | gy x128 | gz x128] (1.5 KB) for the multi-child
                # trilinear union's per-TILE winner candidates
                vol3t = self._vg[:, 1:4].reshape(tuple(int(d) for d in n)
                                                 + (3,))
                tg = self._brick_expand(jnp.pad(vol3t, pad5 + [(0, 0)]),
                                        nb, width=5)
                tg = jnp.swapaxes(tg.reshape(-1, 125, 3), 1, 2)
                tgbricks = jnp.pad(tg, ((0, 0), (0, 0), (0, 3))).reshape(
                    -1, 384)
            # reuse the packed rows _build_raw already holds (one HBM copy)
            vg = self._vg  # set unconditionally by _build_raw in __init__
            self._coherent_cache = _CoherentTables(
                lo=jnp.asarray(self.voxels.lo, dtype=jnp.float32),
                res=jnp.asarray(self.voxels.res, dtype=jnp.float32),
                n=jnp.asarray(n, dtype=jnp.int32),
                strides=jnp.asarray(self.voxels._strides, dtype=jnp.int32),
                vg=vg, bricks=bricks,
                bstrides=jnp.asarray(bstrides, dtype=jnp.int32),
                bb=jnp.asarray(np.asarray(self.bb), dtype=jnp.float32),
                bricks4=bricks4, bricks5=bricks5, gbricks=gbricks,
                tbricks=tbricks, tgbricks=tgbricks)
        return self._coherent_cache

    def surface_bounding_box(self, padding=0.0, padding_ratio=0.0):
        if self.gt_sdf is not None:
            return self.gt_sdf.surface_bounding_box(padding=padding,
                                                    padding_ratio=padding_ratio)
        # warm-cache restart without a ground truth: use the persisted tight bb
        if self._stored_bb is None:
            raise RuntimeError(
                "CachedSDF has neither a ground-truth SDF nor a persisted "
                "bounding box (cache written by an older version)")
        return jnp.asarray(pad_aabb(self._stored_bb, padding, padding_ratio))

    def _fallback_sdf_value_func(self, *args, **kwargs):
        if self.gt_sdf is None:
            # warm-restart without a ground truth: fall back to the AABB
            # under-approximation (same convention as BOUNDING_BOX queries)
            pts = as_float_array(args[0])
            bb = jnp.asarray(np.asarray(self.surface_bounding_box()),
                             dtype=jnp.float32)
            dist, _ = _aabb_distance_grad(bb, pts)
            return dist
        sdf_val, _ = self.gt_sdf(*args, **kwargs)
        return sdf_val

    def __call__(self, points_in_object_frame):
        val, grad = super().__call__(points_in_object_frame)
        if self.debug_check_sdf:
            self._debug_check(points_in_object_frame, val, grad)
        return val, grad

    def _debug_check(self, pts, val, grad):
        """Online self-check against the ground truth (reference
        sdf.py:573-590): in-bounds error < resolution; OOB bounding-box values
        under-approximate with gradient cosine similarity > 0.7."""
        pts = as_float_array(pts)
        val_gt, grad_gt = self.gt_sdf(pts)
        within = np.asarray(self.voxels.get_valid_values(pts.reshape(-1, 3))).reshape(
            np.asarray(val).shape)
        diff = np.abs(np.asarray(val) - np.asarray(val_gt))
        assert np.all(diff[within] < self.resolution), diff[within].max()
        if self.out_of_bounds_strategy == OutOfBoundsStrategy.BOUNDING_BOX:
            oob = ~within
            if oob.any():
                under = np.asarray(val_gt)[oob] - np.asarray(val)[oob]
                # always under-approximates (equality when the mesh is its own
                # AABB, e.g. a box)
                assert np.all(under > -1e-5), under.min()
                g1 = np.asarray(grad)[oob]
                g2 = np.asarray(grad_gt)[oob]
                cos = np.sum(g1 * g2, axis=-1) / np.maximum(
                    np.linalg.norm(g1, axis=-1) * np.linalg.norm(g2, axis=-1), 1e-12)
                assert np.all(cos > 0.7)
                assert cos.mean() > 0.95

    def outside_surface(self, points_in_object_frame, surface_level=0):
        """Fast check assuming out-of-bounds points are outside
        (reference sdf.py:593-602)."""
        pts = as_float_array(points_in_object_frame)
        flat = pts.reshape(-1, pts.shape[-1])
        keys = self.voxels.ensure_index_key(flat)
        nshape = jnp.asarray(self.voxels.shape, dtype=jnp.int32)
        valid = jnp.all((keys >= 0) & (keys < nshape), axis=-1)
        flat_idx = self.voxels.ravel_multi_index(jnp.clip(keys, 0, nshape - 1))
        outside = jnp.where(valid,
                            self.voxels.raw_data.reshape(-1)[flat_idx] > surface_level,
                            True)
        return outside.reshape(pts.shape[:-1])

    def get_voxel_view(self, voxels: Optional[VoxelGrid] = None, dtype=jnp.float32,
                       device=None) -> GridView:
        if voxels is None:
            return self.voxels
        if self.gt_sdf is None:
            raise RuntimeError(
                "get_voxel_view with a custom grid re-evaluates the ground "
                "truth; this CachedSDF was restored from cache without one")
        pts = voxels.get_voxel_center_points()
        sdf_val, _ = self.gt_sdf(pts)
        shape = [len(c) for c in voxels.coords]
        return GridView(sdf_val.reshape(shape), voxels.range_per_dim,
                        invalid_value=self._fallback_sdf_value_func)


# ---------------------------------------------------------------------------
# Surface point sampling with disk cache (reference sdf.py:617-670)
# ---------------------------------------------------------------------------

def sample_mesh_points(obj_factory: Optional[ObjectFactory] = None, num_points=100,
                       seed=0, name="", clean_cache=False, dtype=jnp.float32,
                       min_init_sample_points=200,
                       dbpath="model_points_cache.npz", device=None, cache=None):
    """Uniform surface samples + their normals, cached on disk keyed
    ``name/seed/num_points``.  Deterministic via an explicit numpy seed
    (replaces the reference's global RNG save/restore, sdf.py:644-646)."""
    store = get_store(dbpath)
    key = f"{name}/{seed}/{num_points}"
    if not clean_cache:
        hit = store.get(key)
        if hit is not None:
            points, normals = hit
            return (jnp.asarray(points, dtype=dtype),
                    jnp.asarray(normals, dtype=dtype), store)

    if obj_factory is None:
        raise RuntimeError(
            f"Expect model points to be cached for {name} {seed} {num_points} in {dbpath}")

    rng = np.random.default_rng(seed)
    # sampling is not dispersed; oversample then randomly subselect
    # (reference sdf.py:648-658)
    sample_num_points = max(min_init_sample_points, 2 * num_points)
    pts = obj_factory._mesh.sample_points_uniformly(sample_num_points, rng=rng)
    pts = rng.permutation(pts)[:num_points]

    res = obj_factory.object_frame_closest_point(pts, compute_normal=True)
    normals = np.asarray(res.normal)

    store.put(key, [np.asarray(pts, dtype=np.float32),
                    normals.astype(np.float32)])
    return (jnp.asarray(pts, dtype=dtype), jnp.asarray(normals, dtype=dtype), store)
