"""Ahead-of-time export of robot-SDF queries for serving.

``jax.export`` lowers the fused FK → per-link SDF → min-union query to a
serialized StableHLO artifact that a serving process loads and runs without
Python tracing (and, with ``platforms=["tpu", "cpu"]``, on either backend).
The big per-link tables ride OUTSIDE the artifact as an ``.npz`` sidecar and
are passed as call arguments — embedding them as constants would bloat the
artifact and cost minutes of consumer-side compile (see ARCHITECTURE.md
"Big tables are jit arguments").

>>> export_robot_query(robot, n_configs=32, n_points=4096, path="arm.bin")
>>> query = load_robot_query("arm.bin")      # no RobotSDF/meshes needed
>>> val, grad = query(q, pts)                # [32, 4096], [32, 4096, 3]

The artifact is shape-specialized (XLA is static-shape); export one per
serving batch shape, or pad at the call site.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

TABLES_SUFFIX = ".tables.npz"


def export_robot_query(robot_sdf, n_configs: int, n_points: int,
                       path: str,
                       platforms: Optional[Sequence[str]] = None) -> None:
    """Serialize the fused robot query for ``[n_configs, M]`` configurations
    x ``[n_points, 3]`` points to ``path`` (+ ``path + '.tables.npz'`` with
    the per-link tables).

    :param platforms: lowering platforms, e.g. ``["tpu", "cpu"]`` for an
        artifact that runs on both; default = current backend only.
    """
    from jax import export as jax_export

    fn, leaves = robot_sdf.fused_query_fn()
    M = len(robot_sdf.joint_names)
    specs = (jax.ShapeDtypeStruct((n_configs, M), jnp.float32),
             jax.ShapeDtypeStruct((n_points, 3), jnp.float32),
             *(jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves))
    exported = jax_export.export(
        jax.jit(fn), platforms=tuple(platforms) if platforms else None)(*specs)
    with open(path, "wb") as f:
        # vjp_order=1: the artifact stays differentiable w.r.t. joint
        # angles/points on the consumer side (gradient-based planning is
        # the library's headline use)
        f.write(exported.serialize(vjp_order=1))
    np.savez_compressed(path + TABLES_SUFFIX,
                        **{f"leaf{i}": np.asarray(l)
                           for i, l in enumerate(leaves)},
                        n_leaves=np.asarray(len(leaves)))


def export_robot_grid_query(robot_sdf, n_configs: int, query_range,
                            resolution: float, path: str,
                            platforms: Optional[Sequence[str]] = None,
                            values_only: bool = False) -> None:
    """Serialize a fixed-grid collision-field server: ``query(q [A, M]) ->
    (val [A, n1, n2, n3], grad [..., 3])`` (or just ``val`` with
    ``values_only=True``) sweeping ``query_range`` at ``resolution`` on the
    TILED brick-gather fast path (one gather per 12/27-point tile per cached
    link).  The grid layout, tile points, and per-link tables all ride in
    the ``.tables.npz`` sidecar; the consumer needs only ``q``.

    Planners that evaluate a whole workspace field per step (occupancy
    rasters, clearance maps) should serve this instead of
    :func:`export_robot_query` — same results, a fraction of the gather
    rows."""
    from jax import export as jax_export

    from pytorch_volumetric_tpu import sdf as sdf_mod
    from pytorch_volumetric_tpu.voxel import (
        get_coherent_tile_points, get_coordinates_and_points_in_grid)

    children = tuple(robot_sdf.sdf.sdfs)
    min_res = sdf_mod.coherent_min_cache_resolution(children)
    if min_res is not None and 2.0 * resolution > min_res:
        raise ValueError(
            f"sweep resolution {resolution:g} too coarse for cached link "
            f"resolution {min_res:g} (needs <= half); export_robot_query "
            "with explicit points instead")
    pts, take_idx, seg = get_coherent_tile_points(
        resolution, query_range, cache_resolution=min_res)
    coords, _ = get_coordinates_and_points_in_grid(
        resolution, query_range, get_points=False)
    grid_shape = tuple(len(c) for c in coords)
    ft = sdf_mod.coherent_fast_tables(children)
    ga = sdf_mod.coherent_generic_aux(children)
    take = jnp.asarray(take_idx, dtype=jnp.int32)
    leaves, treedef = jax.tree_util.tree_flatten((pts, take, ft, ga))

    def fn(q, *leaf_args):
        p, tk, ftables, gaux = jax.tree_util.tree_unflatten(treedef,
                                                            leaf_args)
        m, m_inv = robot_sdf._link_transforms(q)
        out = sdf_mod.compose_query_coherent(
            children, m, m_inv, q.shape[0], p, fast_tables=ftables,
            generic_aux=gaux, seg=seg, values_only=values_only)
        if values_only:
            return out[:, tk].reshape((q.shape[0],) + grid_shape)
        v, g = out
        return (v[:, tk].reshape((q.shape[0],) + grid_shape),
                g[:, tk].reshape((q.shape[0],) + grid_shape + (3,)))

    M = len(robot_sdf.joint_names)
    specs = (jax.ShapeDtypeStruct((n_configs, M), jnp.float32),
             *(jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves))
    exported = jax_export.export(
        jax.jit(fn), platforms=tuple(platforms) if platforms else None)(*specs)
    with open(path, "wb") as f:
        f.write(exported.serialize(vjp_order=0 if values_only else 1))
    np.savez_compressed(path + TABLES_SUFFIX,
                        **{f"leaf{i}": np.asarray(l)
                           for i, l in enumerate(leaves)},
                        n_leaves=np.asarray(len(leaves)))


def load_robot_grid_query(path: str) -> Callable:
    """Load an :func:`export_robot_grid_query` artifact; returns
    ``query(q [A, M]) -> (val grid, grad grid)`` (or just values for a
    values-only export)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    with np.load(path + TABLES_SUFFIX, allow_pickle=False) as d:
        leaves = tuple(jnp.asarray(d[f"leaf{i}"])
                       for i in range(int(d["n_leaves"])))
    call = jax.jit(exported.call)

    def query(q):
        return call(jnp.asarray(q, dtype=jnp.float32), *leaves)

    return query


def load_robot_query(path: str) -> Callable:
    """Load an exported artifact; returns ``query(q, pts) -> (val, grad)``.
    Needs only the two files written by :func:`export_robot_query` — no
    URDF, meshes, or cache rebuild."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    with np.load(path + TABLES_SUFFIX, allow_pickle=False) as d:
        leaves = tuple(jnp.asarray(d[f"leaf{i}"])
                       for i in range(int(d["n_leaves"])))

    # jitted wrapper: eager exported.call pays ~1 ms of Python dispatch per
    # request — 5x the jitted steady state on the serving hot path.  The
    # tables ride in as ARGUMENTS: capturing them in the closure would bake
    # the sidecar (hundreds of MB for a real robot) into the wrapper as
    # compile-time constants — exactly the producer-side blowup the sidecar
    # design avoids (measured: ~60 s vs ~10 s compile, see CLAUDE.md)
    call = jax.jit(exported.call)

    def query(q, pts):
        return call(jnp.asarray(q, dtype=jnp.float32),
                    jnp.asarray(pts, dtype=jnp.float32), *leaves)

    return query
