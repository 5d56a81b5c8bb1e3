"""Multi-device sharding for SDF query and optimization workloads.

The reference is single-device (SURVEY §2.3: no collectives anywhere); this
layer is new, TPU-first design: batched robot-SDF queries are sharded over a
``jax.sharding.Mesh`` with a ``config`` axis (data parallelism over joint
configurations) and a ``point`` axis (parallelism over query points), with
mesh triangle / voxel-grid data replicated.  XLA's SPMD partitioner inserts
the collectives: the forward min-union is fully local; joint-angle gradients
are all-reduced over the ``point`` axis in the backward pass, riding ICI on a
TPU slice.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P



CONFIG_AXIS = "config"
POINT_AXIS = "point"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> Tuple[int, int]:
    """Initialize multi-host JAX (one process per host on a TPU pod slice)
    and return ``(process_index, process_count)``.

    On TPU pods ``jax.distributed.initialize`` auto-detects every argument
    from the environment, so ``init_distributed()`` with no arguments is the
    whole ceremony; afterwards ``jax.devices()`` is the *global* device list
    and :func:`make_device_mesh` builds cross-host meshes whose collectives
    ride ICI within a slice and DCN across slices.

    Single-process runs (no coordinator given, no cluster environment) are a
    no-op returning ``(0, 1)`` — library code can call this unconditionally.
    Calling again after initialization is also a no-op.
    """
    import os
    explicit = coordinator_address is not None or num_processes is not None
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    cluster_env = (len(workers.split(",")) > 1
                   or any(v in os.environ for v in (
                       "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                       "MEGASCALE_COORDINATOR_ADDRESS")))
    if not explicit and not cluster_env:
        return jax.process_index(), jax.process_count()
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id,
                                   local_device_ids=local_device_ids)
    except RuntimeError as e:
        msg = str(e).lower()
        # "already"/"once": repeat call after successful init — idempotent
        # no-op.  "must be called before": the XLA backend is already up
        # in-process; benign for auto-detected single-process sessions, but
        # a REAL error when the caller explicitly requested a multi-host
        # setup we can no longer honor.
        repeat_call = "already" in msg or "once" in msg
        backend_up = "must be called before" in msg
        if not (repeat_call or (backend_up and not explicit)):
            raise
    except ValueError:
        # auto-detection from a cluster-looking environment came up short
        # (e.g. no coordinator address); with explicit arguments that is a
        # real configuration error, otherwise fall back to single-process
        if explicit:
            raise
    return jax.process_index(), jax.process_count()


def make_device_mesh(n_config: Optional[int] = None, n_point: Optional[int] = None,
                     devices=None) -> Mesh:
    """Build a 2D (config, point) device mesh.

    Defaults: all devices on the ``config`` axis (configuration batches are
    the natural outermost data-parallel axis; queries/s scale linearly since
    the forward pass needs no cross-device communication).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_config is None and n_point is None:
        n_config, n_point = n, 1
    elif n_config is None:
        n_config = n // n_point
    elif n_point is None:
        n_point = n // n_config
    if n_config * n_point != n:
        raise ValueError(f"mesh {n_config}x{n_point} != {n} devices")
    arr = np.asarray(devices).reshape(n_config, n_point)
    return Mesh(arr, (CONFIG_AXIS, POINT_AXIS))


def _pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int):
    size = x.shape[axis]
    target = math.ceil(size / multiple) * multiple
    if target == size:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad), size


def pad_for_mesh(x: jnp.ndarray, mesh: Mesh, axis_name: str, axis: int = 0,
                 segment: int = 1):
    """Pad ``x`` along ``axis`` (zeros) so its size divides the mesh axis
    ``axis_name`` with a per-device chunk that is a multiple of ``segment``
    (``segment=4`` for the coherent brick path, whose 4-point segments must
    not straddle device boundaries).  Returns ``(padded, original_size)`` —
    slice the outputs back with ``out[..:original_size]``."""
    return _pad_to_multiple(x, mesh.shape[axis_name] * segment, axis)


def sharded_robot_query(robot_sdf, mesh: Mesh) -> Callable:
    """Jit the fused FK→transform→SDF→min-union query with configs sharded
    over ``config`` and points over ``point``; everything else replicated.

    Returns ``fn(q [A, M], pts [P, 3]) -> (val [A, P], grad [A, P, 3])``.
    ``A`` must divide by the config-axis size and ``P`` by the point-axis size
    (pad with :func:`pad_for_mesh` otherwise).
    """
    fn, leaves = robot_sdf.fused_query_fn()
    jitted = jax.jit(
        fn,
        in_shardings=(NamedSharding(mesh, P(CONFIG_AXIS, None)),
                      NamedSharding(mesh, P(POINT_AXIS, None)),
                      *(NamedSharding(mesh, P()) for _ in leaves)),
        out_shardings=(NamedSharding(mesh, P(CONFIG_AXIS, POINT_AXIS)),
                       NamedSharding(mesh, P(CONFIG_AXIS, POINT_AXIS, None))),
    )
    return lambda q, pts: jitted(q, pts, *leaves)


def sharded_robot_query_coherent(robot_sdf, mesh: Mesh,
                                 values_only: bool = False,
                                 seg: int = 4) -> Callable:
    """Like :func:`sharded_robot_query` but on the segmented brick-gather
    fast path (``compose_query_coherent``) for spatially-coherent point
    sweeps.  ``P`` must divide into per-device chunks that are multiples of
    ``seg`` so point groups stay intact under the point-axis sharding
    (contiguous chunk per device).  ``seg``: points per brick row — 4 for
    raster lines, or the tile size from ``voxel.get_coherent_tile_points``.
    ``values_only=True`` returns just ``val [A, P]`` (gradients stopped;
    skips the winner-gradient rows — collision checks / occupancy rasters)."""
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            coherent_generic_aux,
                                            compose_query_coherent)

    children = tuple(robot_sdf.sdf.sdfs)

    def fn(q, pts, fast_tables, generic_aux):
        m, m_inv = robot_sdf._link_transforms(q)
        return compose_query_coherent(children, m, m_inv, q.shape[0], pts,
                                      fast_tables=fast_tables,
                                      values_only=values_only,
                                      generic_aux=generic_aux, seg=seg)

    val_sh = NamedSharding(mesh, P(CONFIG_AXIS, POINT_AXIS))
    jitted = jax.jit(
        fn,
        in_shardings=(NamedSharding(mesh, P(CONFIG_AXIS, None)),
                      NamedSharding(mesh, P(POINT_AXIS, None)),
                      NamedSharding(mesh, P()),   # tables replicated
                      NamedSharding(mesh, P())),
        out_shardings=val_sh if values_only else
        (val_sh, NamedSharding(mesh, P(CONFIG_AXIS, POINT_AXIS, None))),
    )
    ft = coherent_fast_tables(children)
    ga = coherent_generic_aux(children)
    n_pt = mesh.shape[POINT_AXIS]

    def run(q, pts):
        # groups are `seg` consecutive points; the point axis must split into
        # equal contiguous per-device chunks of whole groups, or GSPMD
        # would silently tear groups across device boundaries.
        n = pts.shape[0]
        if n % n_pt != 0 or (n // n_pt) % seg != 0:
            raise ValueError(
                f"coherent sharding needs the point count ({n}) to split "
                f"into per-device chunks that are multiples of {seg} over "
                f"the {n_pt}-way '{POINT_AXIS}' axis (got chunk "
                f"{n / n_pt:g}); pad with pad_for_mesh(pts, mesh, "
                f"POINT_AXIS, segment={seg}) to a multiple of {seg * n_pt}")
        return jitted(q, pts, ft, ga)

    return run


def sharded_neural_robot_query(model, mesh: Mesh) -> Callable:
    """Shard a learned configuration-space field
    (``models.ConfigSpaceNeuralSDF``) like :func:`sharded_robot_query`:
    configs over ``config``, points over ``point``, weights replicated.
    The forward is pure MXU matmuls, so scaling is embarrassingly parallel;
    returns ``fn(q [A, M], pts [P, 3]) -> (val [A, P], grad [A, P, 3])``."""
    return jax.jit(
        model.query,
        in_shardings=(NamedSharding(mesh, P(CONFIG_AXIS, None)),
                      NamedSharding(mesh, P(POINT_AXIS, None))),
        out_shardings=(NamedSharding(mesh, P(CONFIG_AXIS, POINT_AXIS)),
                       NamedSharding(mesh, P(CONFIG_AXIS, POINT_AXIS, None))),
    )


def sharded_sdf_query(sdf, mesh: Mesh) -> Callable:
    """Shard a plain ``ObjectFrameSDF`` query's flat point batch across every
    device of the mesh (both axes).  Big per-instance tables ride in as
    replicated ARGUMENTS via the raw_query_aux/raw_query_with protocol
    (capturing them would bake multi-hundred-MB constants into the program;
    see CLAUDE.md)."""
    aux = sdf.raw_query_aux()
    spec = P((CONFIG_AXIS, POINT_AXIS))
    pts_sh = NamedSharding(mesh, P((CONFIG_AXIS, POINT_AXIS), None))
    out_sh = (NamedSharding(mesh, spec), pts_sh)
    if aux is None:
        return jax.jit(lambda pts: sdf.raw_query(pts),
                       in_shardings=pts_sh, out_shardings=out_sh)
    leaves, treedef = jax.tree_util.tree_flatten(aux)

    def fn(pts, *aux_leaves):
        return sdf.raw_query_with(
            jax.tree_util.tree_unflatten(treedef, aux_leaves), pts)

    jitted = jax.jit(
        fn,
        in_shardings=(pts_sh, *(NamedSharding(mesh, P()) for _ in leaves)),
        out_shardings=out_sh)
    return lambda pts: jitted(pts, *leaves)


def make_collision_step(robot_sdf, optimizer, margin: float = 0.1,
                        mesh: Optional[Mesh] = None) -> Callable:
    """Build a full sharded training step: minimize penetration/clearance loss
    of the robot (over a batch of configurations) against a point cloud, by
    gradient descent on the joint configurations.

    The loss ``mean(relu(margin - sdf(q, pts))^2)`` needs the analytic SDF
    gradients w.r.t. joint angles — the chain FK → point transform →
    ``custom_vjp`` SDF gradient.  With a mesh given, configs shard over
    ``config`` and points over ``point``; the joint-gradient all-reduce over
    the point axis is inserted by the SPMD partitioner and overlaps the
    backward pass.

    Returns ``step(q [A, M], opt_state, pts [P, 3]) -> (q', opt_state', loss)``.
    """
    query_fn, leaves = robot_sdf.fused_query_fn()

    def loss_fn(q, pts, aux):
        val, _ = query_fn(q, pts, *aux)
        return jnp.mean(jax.nn.relu(margin - val) ** 2)

    def step(q, opt_state, pts, aux):
        loss, g = jax.value_and_grad(loss_fn)(q, pts, aux)
        updates, opt_state = optimizer.update(g, opt_state, q)
        q = jax.tree_util.tree_map(lambda p, u: p + u, q, updates)
        return q, opt_state, loss

    if mesh is None:
        jitted = jax.jit(step)
        return lambda q, s, pts: jitted(q, s, pts, leaves)
    q_sh = NamedSharding(mesh, P(CONFIG_AXIS, None))
    pts_sh = NamedSharding(mesh, P(POINT_AXIS, None))
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(step,
                     in_shardings=(q_sh, repl, pts_sh, repl),
                     out_shardings=(q_sh, repl, repl))
    return lambda q, s, pts: jitted(q, s, pts, leaves)
