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

import functools
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

TABLES_SUFFIX = ".tables.npz"


def _fused_query_fn(robot_sdf):
    """``fn(q, pts, *aux_leaves) -> (val, grad)`` with every child's big
    tables as flat positional arguments; returns (fn, example_leaves)."""
    from pytorch_volumetric_tpu.sdf import compose_query

    children_with = tuple(s.raw_query_with for s in robot_sdf.sdf.sdfs)
    aux = tuple(s.raw_query_aux() for s in robot_sdf.sdf.sdfs)
    leaves, treedef = jax.tree_util.tree_flatten(aux)

    def fn(q, pts, *aux_leaves):
        aux_tree = jax.tree_util.tree_unflatten(treedef, aux_leaves)
        queries = tuple(functools.partial(child, a)
                        for child, a in zip(children_with, aux_tree))
        m, m_inv = robot_sdf._link_transforms(q)
        return compose_query(queries, m, m_inv, q.shape[0], pts)

    return fn, leaves


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

    fn, leaves = _fused_query_fn(robot_sdf)
    M = len(robot_sdf.joint_names)
    specs = (jax.ShapeDtypeStruct((n_configs, M), jnp.float32),
             jax.ShapeDtypeStruct((n_points, 3), jnp.float32),
             *(jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves))
    exported = jax_export.export(
        jax.jit(fn), platforms=tuple(platforms) if platforms else None)(*specs)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    np.savez_compressed(path + TABLES_SUFFIX,
                        **{f"leaf{i}": np.asarray(l)
                           for i, l in enumerate(leaves)},
                        n_leaves=np.asarray(len(leaves)))


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

    def query(q, pts):
        return exported.call(jnp.asarray(q, dtype=jnp.float32),
                             jnp.asarray(pts, dtype=jnp.float32), *leaves)

    return query
